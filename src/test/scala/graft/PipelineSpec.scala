package graft

import org.apache.spark.sql.functions._

/** Training-data curation queries: repetition scores bounded and sane,
  * redaction masks exactly the deny-list tokens, packing conserves
  * tokens and respects start-offset budgets, stratified sampling is
  * deterministic and per-language rate-shaped. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("repetition fractions lie in [0,1) and top-token share is positive") {
    val r = q("q_doc_repetition")
      .select("dup_2gram_frac", "dup_3gram_frac", "top_token_frac")
      .as[(Double, Double, Double)].collect()
    assert(r.nonEmpty)
    r.foreach { case (d2, d3, tt) =>
      assert(d2 >= 0.0 && d2 < 1.0)
      assert(d3 >= 0.0 && d3 < 1.0)
      assert(d3 <= d2 + 1e-12 || d3 < 1.0) // 3-gram dup never exceeds 1
      assert(tt > 0.0 && tt <= 1.0)
    }
    // the small-vocab fixture corpus MUST show real repetition somewhere
    assert(r.exists(_._1 > 0.0), "expected duplicate 2-grams in fixture")
  }

  test("redaction masks exactly the deny-list hits") {
    val rows = q("q_doc_redact")
      .select("n_redacted", "redacted").as[(Long, String)].collect()
    rows.foreach { case (n, red) =>
      val toks = red.split(" ")
      assert(toks.count(_ == "[MASK]") == n)
      assert(!toks.exists(t => t == "customer" || t == "value" || t == "table"))
    }
    assert(rows.exists(_._1 > 0), "deny-list terms must occur in fixture")
  }

  test("packing conserves tokens and every pack starts within budget") {
    val packs = q("q_pack_sequences")
      .select("lang", "pack_id", "pack_tokens").as[(String, Long, Long)]
      .collect()
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("lang").agg(sum("n").as("total"))
      .as[(String, Long)].collect().toMap
    // conservation: per-lang pack token sums equal the corpus token count
    packs.groupBy(_._1).foreach { case (lang, ps) =>
      assert(ps.map(_._3).sum == docs(lang), s"token loss in $lang")
    }
    // pack ids are dense from 0 per lang (start offsets are cumulative)
    packs.groupBy(_._1).foreach { case (_, ps) =>
      val ids = ps.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length.toLong))
    }
  }

  test("sharded packing conserves tokens and agrees with per-lang totals") {
    val perLang = q("q_pack_sequences")
      .groupBy("lang").agg(sum("pack_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    val sharded = q("q_pack_sequences_sharded")
      .groupBy("lang").agg(sum("pack_tokens").as("t"))
      .as[(String, Long)].collect().toMap
    assert(sharded == perLang, "sharding must not lose or duplicate tokens")
  }

  test("decontamination flags only true 5-gram overlaps") {
    import graft.operators.Dedup
    val flagged = q("q_decontaminate").as[(Long, Long)].collect()
    assert(flagged.forall(_._2 > 0))
    // replay the overlap directly for every flagged doc
    val sh = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 5).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val evalHashes = sh.filter(_._1 < 10).values.flatten.toSet
    flagged.foreach { case (id, n) =>
      assert(sh(id).count(evalHashes.contains) == n,
        s"doc $id claims $n shared 5-grams")
    }
  }

  test("logprob scores are finite, positive, and token-count consistent") {
    val rows = q("q_doc_logprob").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, nll) =>
      assert(n > 0)
      assert(!nll.isNaN && !nll.isInfinite && nll > 0.0)
    }
    val nTok = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (id, n, _) => assert(n == nTok(id)) }
  }

  test("stratified sampling is deterministic and rate-ordered") {
    val a = q("q_sample_stratified").as[(Long, String, Long)].collect()
    val b = q("q_sample_stratified").as[(Long, String, Long)].collect()
    assert(a.sameElements(b), "hash sampling must be reproducible")
    assert(a.forall { case (id, _, bucket) =>
      bucket == (id * 2654435761L) % 1000
    })
    val byLang = a.groupBy(_._2).view.mapValues(_.length).toMap
    val corpus = spark.read.parquet(s"$sf0001/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // en keeps ~10%, zh ~20%, rest ~50% — assert loose shape, not exact
    byLang.get("en").foreach(n => assert(n < corpus("en") * 0.3))
    corpus.keys.filterNot(Set("en", "zh")).foreach { l =>
      byLang.get(l).foreach(n =>
        assert(n > corpus(l) * 0.2 && n < corpus(l) * 0.8))
    }
  }

  test("chunk dedup keeps every chunk exactly once globally") {
    val r = q("q_dedup_chunks").as[(Long, Long, Long, String)].collect()
    assert(r.nonEmpty)
    r.foreach { case (_, nChunks, nKept, _) =>
      assert(nKept >= 0 && nKept <= nChunks)
    }
    // the union of kept chunks = the set of distinct chunks, each once
    val keptChunks = r.flatMap { case (_, _, _, cleaned) =>
      if (cleaned.isEmpty) Array.empty[String]
      else cleaned.split(" ").grouped(8).map(_.mkString(" ")).toArray
    }
    // NOTE: rebuilt text concatenates VARIABLE-length tail chunks, so
    // re-chunking the cleaned string is not exact — assert via totals
    // instead: kept count across docs == distinct chunk count.
    val tk = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(split(col("text"), " ").as("t"))
      .select(transform(
        sequence(lit(0), ceil(size(col("t")) / lit(8.0)).cast("int") - 1),
        i => array_join(slice(col("t"), i * 8 + 1, lit(8)), " ")).as("chunks"))
      .select(explode(col("chunks")).as("c"))
    val distinctChunks = tk.distinct().count()
    assert(r.map(_._3).sum == distinctChunks,
      s"kept=${r.map(_._3).sum} distinct=$distinctChunks")
    assert(keptChunks.nonEmpty)
    // fixture has real cross-doc duplication: something must be removed
    assert(r.map(_._3).sum < r.map(_._2).sum)
  }

  test("dsir weights: en docs (the target slice) score higher on average") {
    val w = q("q_dsir_weight").as[(Long, Long, Double)].collect()
    assert(w.nonEmpty)
    w.foreach { case (_, n, s) =>
      assert(n > 0); assert(!s.isNaN && !s.isInfinite)
    }
    val langs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang")).as[(Long, String)].collect().toMap
    val (en, rest) = w.partition { case (id, _, _) => langs(id) == "en" }
    assert(en.nonEmpty && rest.nonEmpty)
    val enAvg = en.map(_._3).sum / en.length
    val restAvg = rest.map(_._3).sum / rest.length
    assert(enAvg > restAvg,
      s"target-slice docs should score higher: en=$enAvg rest=$restAvg")
  }
}
