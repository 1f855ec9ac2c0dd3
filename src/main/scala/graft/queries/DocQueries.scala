package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MultiModal}

/**
 * LLM-training-data pipeline operators over `documents.parquet`:
 * deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
 * embedding-cosine), text analysis (token/quality stats, language-ID),
 * multimodal binary columns, and document fingerprinting.
 *
 * The fixture corpus has no guaranteed duplicate pairs at every SF, so
 * dedup queries union a deterministic "mirror" slice (doc_id+100000,
 * optionally perturbed with an appended token) — the SAME construction
 * runs in the DuckDB oracle, so found-pair sets compare exactly.
 *
 * Scale notes are inline per query; the common theme: candidates always
 * come from equality joins on hashes/buckets (partition-prunable,
 * broadcast-free), never from all-pairs products — except the explicitly
 * small-SF oracle twins.
 */
object DocQueries {
  import Tables.t

  /** Bench warmup: pre-fit the (cached) embedding model — the one
    * train-time artifact among the doc queries. */
  def ensureAll(s: SparkSession, d: String): Unit = {
    graft.operators.Embed.fitCached(d, docs(s, d), "text", 64)
    ensureDedupClusters(s, d)
    ()
  }

  /** Build-once near-dup cluster assignment over the chain-dup corpus —
    * the artifact q_dedup_cluster and q_dedup_apply both read (the
    * chain runs once, not once per consumer). */
  private def ensureDedupClusters(s: SparkSession, d: String): String =
    graft.operators.Dedup.ensureClusters(s, s"dedupcc_${san(d)}", d,
      docsWithChainDups(s, d), "doc_id", "text",
      shingleK = 3, bands = 16, rowsPerBand = 4, minJacc = 0.8)

  private def san(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")

  private def docs(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"), col("text"), col("lang"))

  /** documents ∪ exact mirror of doc_id < 50. */
  private def docsWithExactDups(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionAll(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }

  /** documents ∪ near-mirror (one appended token) of doc_id < 50. */
  private def docsWithNearDups(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base.unionAll(base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zzzextra")).as("text")))
  }

  /** documents ∪ near-mirror (+100000, one appended token) ∪ exact
    * mirror (+200000) of doc_id < 50 — guarantees multi-node components
    * (A, A+100000, A+200000 form a clique/chain through the jacc≥0.8
    * edges), so clustering exercises real transitive merges. */
  private def docsWithChainDups(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select(col("doc_id"), col("text"))
    base
      .unionAll(base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(col("text"), lit(" zzzextra")).as("text")))
      .unionAll(base.filter(col("doc_id") < 50)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  private val chainDupSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zzzextra' AS text
        FROM documents WHERE doc_id < 50
        UNION ALL
        SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id < 50)"""

  private val exactDupSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50)"""
  private val nearDupSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 100000 AS doc_id, text || ' zzzextra' AS text
        FROM documents WHERE doc_id < 50)"""

  private def toks(c: Column): Column = split(c, " ")

  private def stopCount(tk: Column, words: Seq[String]): Column =
    size(filter(tk, x => words.map(w => x === w).reduce(_ || _))).cast("long")

  /** Near-dup pair oracle: brute-force 3-gram set Jaccard over the
    * near-dup corpus (the small-SF ground truth both the exact inverted
    * join and the MinHash/LSH path must reproduce). */
  private val jaccardOracle =
    s"""WITH alldocs AS $nearDupSql,
        sh AS (SELECT doc_id,
          list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
            i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS s
          FROM alldocs)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jacc
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
        ORDER BY doc_a, doc_b"""

  /** Embedding near-dup oracle: all-pairs cosine over embeddings ∪
    * 2×-scaled mirror (cosine is scale-invariant → mirror pairs ≈ 0). */
  private val embedNearDupOracle =
    """WITH alle AS (
         SELECT vec_id, embedding FROM embeddings
         UNION ALL
         SELECT vec_id + 100000 AS vec_id,
                list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS embedding
         FROM embeddings WHERE vec_id < 50)
       SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         1.0 - list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
           / sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
                * list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS cdist
       FROM alle a JOIN alle b ON a.vec_id < b.vec_id
       WHERE 1.0 - list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
           / sqrt(list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
                * list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) < 0.05
       ORDER BY vec_a, vec_b"""

  private def embeddingsWithDups(s: SparkSession, d: String): DataFrame = {
    val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    e.unionAll(e.filter(col("vec_id") < 50)
      .select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
  }

  /** Deterministic semantic-dedup centroids: the first 8 corpus
    * embeddings in vec_id order (a k-means would train float-iteratively
    * — unreplayable; WHICH pairs get compared is approximate by design,
    * the decision arithmetic is what the oracle pins down). */
  private def semCentroids(s: SparkSession, d: String): Array[Array[Float]] =
    Tables.fixture("semcents:" + d) {
      t(s, d, "embeddings").filter(col("vec_id") < 8)
        .orderBy(col("vec_id")).select(col("embedding"))
        .collect().map(_.getSeq[Float](0).toArray)
    }

  /** DuckDB one-pass-cosdist replay for aliased list columns. */
  private def cosSql(a: String, b: String) =
    s"1.0 - list_aggregate(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')" +
    s" / sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')" +
    s" * list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"

  /** [[cosSql]] with both norm sums guarded by greatest(., 1e-30) — the
    * replay of [[graft.operators.IvfKernels.nearestCos]]'s guarded
    * denominator (the CosRaw/TypedAnn convention). The UNguarded form
    * stays for [[graft.functions.DenseKernels.cosDist]] replays (that
    * kernel is unguarded, and the two must not desync). */
  private def cosSqlGuarded(a: String, b: String) =
    s"1.0 - list_aggregate(list_transform(list_zip($a, $b), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')" +
    s" / sqrt(greatest(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 1e-30)" +
    s" * greatest(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 1e-30))"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- text analysis: per-doc token/quality stats (one scan, no
    //     shuffle; every metric is a codegen'd expression) ---
    "q_doc_stats" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), toks(col("text")).as("tk"), col("text"))
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars2"),
          size(col("tk")).cast("long").as("n_tokens"),
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long").as("n_alpha"),
          length(regexp_replace(col("text"), "[^aeiou]", "")).cast("long").as("n_vowels"),
          stopCount(col("tk"), Seq("the", "a")).as("n_stop"),
          aggregate(transform(col("tk"),
              x => ceil(length(x) / lit(2.0)).cast("long")),
            lit(0L), (acc, x) => acc + x).as("n_subtok"),
          (stopCount(col("tk"), Seq("the", "a")).cast("double") /
            size(col("tk")).cast("double")).as("stop_ratio"))
        .orderBy(col("doc_id"))
    }),

    // --- token vocabulary histogram (hash-partitioned groupBy; uniform
    //     keys at this vocab, salting hook for hot tokens at scale) ---
    "q_token_count" -> ((s, d) => {
      docs(s, d).select(explode(toks(col("text"))).as("token"), col("doc_id"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("token"))
    }),

    // --- corpus n-gram statistics: top-5 trigrams per language by
    //     DOCUMENT frequency (each doc counts a gram once — the kernel
    //     emits the distinct set). Ties break by gram text, so the
    //     ranking is a pure function of the corpus. Scale shape: ONE
    //     codegen pass builds each doc's distinct-gram set (no
    //     interpreted HOF chain — the round-2 minhash lesson), explode →
    //     one hash agg on (lang, gram) with map-side partial counts; the
    //     per-lang rank sorts only the distinct-gram aggregate
    //     (vocabulary-sized, not corpus-sized). ---
    "q_ngram_top" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // spread (round 18): the single-row-group fixture scan serialized
      // the shingle pass on one task; no-op at many-split scale
      val grams = Tables.spread(docs(s, d)).select(col("lang"),
        explode(Dedup.shingleStrings(split(lower(col("text")), "\\s+"), 3)).as("gram"))
      val w = Window.partitionBy("lang").orderBy(col("ndocs").desc, col("gram"))
      grams.groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("ndocs"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 5)
        .select(col("lang"), col("rk"), col("gram"), col("ndocs"))
        .orderBy(col("lang"), col("rk"))
    }),

    // --- vocabulary coverage / OOV rate: top-1000 corpus vocabulary by
    //     frequency (ties by token text — deterministic), then each
    //     doc's fraction of token OCCURRENCES outside it. The vocab is
    //     broadcast-sized by construction; the per-doc pass is one
    //     explode + broadcast-join + hash agg. All integer counts; the
    //     rate is one exact integer-ratio IEEE division. ---
    "q_doc_oov" -> ((s, d) => {
      val tk = docs(s, d).select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      // top-1000 via orderBy+limit = TakeOrderedAndProject: per-partition
      // k-bounded heaps merged on the driver — NOT a global row_number
      // window, which would single-partition-sort the entire vocabulary
      val vocab = tk.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(1000)
        .select(col("tok"), lit(1).as("in_vocab"))
      tk.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(coalesce(col("in_vocab"), lit(0))).cast("long").as("n_in"))
        .select(col("doc_id"), col("n_tok"), col("n_in"),
          ((col("n_tok") - col("n_in")).cast("double") / col("n_tok")).as("oov_rate"))
        .orderBy(col("doc_id"))
    }),

    // --- language-ID: stopword-marker n-gram heuristic, fixed tie order ---
    "q_lang_id" -> ((s, d) => {
      val de = Seq("der", "die", "das", "und", "ist")
      val en = Seq("the", "a", "and", "is", "of")
      val es = Seq("el", "la", "los", "que", "y")
      val fr = Seq("le", "les", "des", "et", "une")
      docs(s, d).select(col("doc_id"), col("lang"), toks(col("text")).as("tk"))
        .select(col("doc_id"), col("lang"),
          stopCount(col("tk"), de).as("c_de"), stopCount(col("tk"), en).as("c_en"),
          stopCount(col("tk"), es).as("c_es"), stopCount(col("tk"), fr).as("c_fr"))
        .withColumn("pred",
          when(col("c_de") >= col("c_en") && col("c_de") >= col("c_es")
            && col("c_de") >= col("c_fr") && col("c_de") > 0, "de")
          .when(col("c_en") >= col("c_es") && col("c_en") >= col("c_fr")
            && col("c_en") > 0, "en")
          .when(col("c_es") >= col("c_fr") && col("c_es") > 0, "es")
          .when(col("c_fr") > 0, "fr")
          .otherwise("und"))
        .withColumn("is_match", col("pred") === col("lang"))
        .orderBy(col("doc_id"))
    }),

    // --- exact dedup: content-hash groupBy (uniform md5 keys — no skew,
    //     scales linearly; THE first pass of any 100 TB dedup) ---
    "q_dedup_exact" -> ((s, d) => {
      docsWithExactDups(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(count(lit(1)).as("cnt"),
          min(col("doc_id")).as("keep_id"), max(col("doc_id")).as("dup_id"))
        .filter(col("cnt") > 1)
        .orderBy(col("h"))
    }),

    // --- exact dedup, keep-first semantics: survivors only ---
    "q_dedup_keep_first" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(md5(col("text").cast("binary")))
      docsWithExactDups(s, d)
        .withColumn("keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("keep"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // --- near-dup: EXACT 3-gram Jaccard via shingle inverted join
    //     (complete; the small-SF ground truth) ---
    "q_dedup_jaccard" -> ((s, d) => {
      // one-pass distinct shingle-hash sets: the string shingles are never
      // materialized (they'd be recomputed on every self-join branch)
      val sh = docsWithNearDups(s, d)
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("shh"))
      Dedup.exactJaccardPairsHashed(sh, "doc_id", "shh", 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // --- near-dup: MinHash signatures + banded LSH candidates + exact
    //     verify — the 100 TB path (bands×N shuffle rows, no all-pairs);
    //     carries the SAME oracle as the exact path (collision prob for
    //     jacc≥0.8 at 16×4 banding ≈ 1-3e-8) ---
    "q_dedup_minhash" -> ((s, d) => {
      // pre-hashed shingle sets: signatures are bit-identical to hashing
      // the string shingles (same FNV base hash), strings never built.
      // localCheckpoint (round 17): sh feeds the signature pass AND both
      // verify sides — one hashing pass per run instead of three
      val sh = docsWithNearDups(s, d)
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("shh"))
        .localCheckpoint()
      val sig = sh.select(col("doc_id"),
        Dedup.minhashSignatureHashed(col("shh"), 64).as("sig"))
      val cands = Dedup.lshCandidates(sig, "doc_id", "sig", bands = 16, rows = 4)
      Dedup.verifyJaccard(cands, sh, "doc_id", "shh")
        .filter(col("jacc") >= 0.8)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // --- near-dup CLUSTERING: LSH candidates -> exact-Jaccard verify ->
    //     connected components with a canonical representative (min id)
    //     — the keep-one-per-group step every corpus dedup ends with.
    //     The chain (banded-LSH edges, never all-pairs; min-propagation
    //     CC) runs ONCE via the cataloged cluster artifact
    //     (Dedup.ensureClusters); this query and q_dedup_apply both
    //     read it. Oracle: DuckDB recursive CTE over the SAME verified
    //     edge set (LSH misses a jacc≥0.8 edge with p≈1e-15, the
    //     q_dedup_minhash argument). ---
    "q_dedup_cluster" -> ((s, d) => {
      graft.ParquetCache.read(s, ensureDedupClusters(s, d))
        .select(col("node").as("doc_id"), col("rep"))
        .orderBy(col("doc_id"))
    }),

    // --- near-dup APPLY: the materialized deduped corpus — every dedup
    //     pipeline's actual output. Clusters come from the SAME cataloged
    //     artifact q_dedup_cluster reads (built once, not re-derived);
    //     kept rows are cluster representatives (min id) plus all
    //     singletons, via one anti-join of the corpus against
    //     non-representative members. The oracle replays the
    //     recursive-CTE clustering and the same anti-join. ---
    "q_dedup_apply" -> ((s, d) => {
      val drop = graft.ParquetCache.read(s, ensureDedupClusters(s, d))
        .filter(col("node") =!= col("rep")).select(col("node").as("doc_id"))
      docsWithChainDups(s, d).join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // --- near-dup: SimHash 64-bit + 4×16 band buckets (complete for
    //     hamming<=3 by pigeonhole). Full value oracle: the FNV simhash
    //     is replayed bit-exactly in DuckDB (HUGEINT mod-2^64 trick). ---
    "q_dedup_simhash" -> ((s, d) => {
      val dd = docsWithExactDups(s, d)
        .select(col("doc_id"), Dedup.simhash(toks(col("text"))).as("sim"))
      Dedup.simhashPairs(dd, "doc_id", "sim", tau = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // --- embedding near-dup: exact all-pairs cosine (oracle twin; the
    //     scale path is the sign-LSH variant below) ---
    "q_embed_neardup" -> ((s, d) => {
      // spread (round 18): the per-pair cosdist verify's parallelism is
      // the streamed cross-join side's scan partitions (was 2 tasks)
      val e = Tables.spread(embeddingsWithDups(s, d))
      val a = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b"),
          graft.functions.cosdist(col("ea"), col("eb")).as("cdist"))
        .filter(col("cdist") < 0.05)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // --- embedding near-dup at scale: BANDED random-hyperplane sign
    //     buckets (16 bands x 4 planes — candidate if ANY band matches;
    //     miss prob ~5e-8 at the cdist=0.05 boundary, which is why this
    //     can safely share the exact all-pairs oracle), verify only
    //     bucket collisions (band join ≪ all-pairs) ---
    "q_embed_neardup_lsh" -> ((s, d) => {
      val e = embeddingsWithDups(s, d)
      // corpus-adaptive banding (Dedup.signBandParams): band width grows
      // with log2(n) so random-pair collisions — and with them the
      // candidate-verify cost — stay LINEAR in n (the fixed 16x4
      // convention went quadratic at 10x in the soak). Boundary miss at
      // cdist=0.05 stays <= 1e-8; the mirror dups are exact (cdist 0,
      // collide in every band), so the shared exact-cosine oracle is
      // banding-independent.
      val (bands, rows) = Dedup.signBandParams(Tables.fixture[java.lang.Long](
        "ndupn:" + d)(java.lang.Long.valueOf(e.count())).longValue())
      val planes = Dedup.hyperplanes(nPlanes = bands * rows, dims = 64)
      // localCheckpoint (round 17): keyed feeds both self-join sides —
      // one 64-plane-dot pass per run instead of two (+ inferred-filter
      // clones)
      val keyed = e.select(col("vec_id"),
        explode(Dedup.signBandKeys(col("embedding"), planes,
          bands = bands, rows = rows)).as("bucket"))
        .localCheckpoint()
      // shuffle-hash on the band buckets: same shuffle as sort-merge
      // minus the two per-partition sorts (the round-13 postings-join
      // precedent in Dedup.exactJaccardPairsHashed)
      val cands = keyed.as("a").join(keyed.as("b").hint("shuffle_hash"),
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
        .distinct()
      val ea = e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val eb = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      cands.join(ea, "vec_a").join(eb, "vec_b")
        .select(col("vec_a"), col("vec_b"),
          graft.functions.cosdist(col("ea"), col("eb")).as("cdist"))
        .filter(col("cdist") < 0.05)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // --- SEMANTIC dedup (SemDeDup, Abbas et al. 2023): cosine-argmin
    //     clusters over deterministic seed-row centroids, pairwise
    //     compare ONLY within a cluster, drop the higher id of every
    //     pair under tau — cluster count bounds the quadratic. Full
    //     oracle: assignment and removal both replay bit-exactly
    //     (one-pass cosdist accumulator chains; the 2x mirror dups scale
    //     every accumulator by an exact power of two, so they land in
    //     their originals' clusters and at cosdist ~0). ---
    "q_dedup_semantic" -> ((s, d) => {
      Dedup.semanticDedup(embeddingsWithDups(s, d), "vec_id", "embedding",
          semCentroids(s, d), tau = 0.05)
        .orderBy(col("vec_id"))
    }),

    // --- multimodal: opaque binary payload + typed metadata (decode
    //     stubbed in MultiModal; schema/plumbing exercised here) ---
    "q_multimodal_meta" -> ((s, d) => {
      docs(s, d).select(col("doc_id"), col("text"),
          col("text").cast("binary").as("payload"))
        .select(col("doc_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("content_fp"),
          substring(col("text"), 1, 12).as("head"))
        .orderBy(col("doc_id"))
    }),

    // --- multimodal frame sampling (video analog): 64-byte frames,
    //     every 2nd kept, per-frame byte-histogram features — the
    //     decode-fanout batch shape with a full value oracle (payloads
    //     are ASCII, so DuckDB can replay the byte histogram) ---
    "q_multimodal_frames" -> ((s, d) => {
      import graft.operators.MultiModal
      val frames = MultiModal.sampleFrames(
        MultiModal.asMedia(docs(s, d), "doc_id", "text"),
        frameBytes = 64, stride = 2)
      frames.toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_frame_bytes"),
          element_at(col("feature"), 1).as("f0"),
          element_at(col("feature"), 6).as("f5"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // --- batch embedding (text2vec analog, MLlib HashingTF+IDF+L2):
    //     contract-checked via oracle (dims, unit norm); semantic knn in
    //     EmbedSpec ---
    "q_embed_batch" -> ((s, d) => {
      val model = graft.operators.Embed.fitCached(d, docs(s, d), "text", 64)
      graft.operators.Embed.transform(model, docs(s, d), "doc_id", "text")
        .select(col("doc_id"),
          size(col("embedding")).cast("long").as("dims"),
          round(graft.functions.vectorNorm(col("embedding")), 6).as("norm"))
        .orderBy(col("doc_id"))
    }),

    // --- embedding-powered knn over the hash-featurized corpus: top-10
    //     most similar docs to doc 0, full value oracle (FNV bucket
    //     counts replayed in SQL) ---
    "q_embed_knn" -> ((s, d) => {
      // deterministic featurizer (FNV token buckets) instead of MLlib
      // HashingTF/IDF: every step is SQL-replayable, so this knn carries
      // a full value oracle (cosine over integer count vectors is
      // order-insensitive exact arithmetic)
      val emb = docs(s, d).select(col("doc_id"),
        Dedup.tokenBuckets(toks(col("text")), 64).as("tfv"))
      val q = emb.filter(col("doc_id") === 0).select(col("tfv").as("qv"))
      emb.crossJoin(broadcast(q)).filter(col("doc_id") =!= 0)
        .select(col("doc_id"),
          graft.functions.cosdist(col("tfv"), col("qv")).as("cdist"))
        .orderBy(col("cdist"), col("doc_id")).limit(10)
    }),

    // --- the pg_vector_index_stat analog: one row per cataloged index
    //     (rows-only: the catalog lives outside the oracle's tables) ---
    "q_index_stat" -> ((s, d) => {
      AnnQueries.ensureAll(s, d)
      ensureDedupClusters(s, d)
      graft.index.IndexCatalog.stats(s)
        .filter(col("idx_source") === d)
        .select(col("idx_name"), col("idx_type"), col("idx_metric"),
          col("idx_options"), (col("idx_size_bytes") > 0).as("has_data"))
        .orderBy(col("idx_name"))
    }),

    // --- corpus length distribution per language: exact interpolated
    //     percentiles (quality-cutoff selection stats) ---
    "q_doc_quantiles" -> ((s, d) => {
      t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          percentile(col("n_chars"), lit(0.5)).as("p50"),
          percentile(col("n_chars"), lit(0.9)).as("p90"),
          min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
        .orderBy(col("lang"))
    }),

    // --- end-to-end training-data cleaning pipeline in ONE plan:
    //     quality filter -> exact dedup keep-first -> per-shard stats.
    //     Each stage is shuffle-minimal (scan-local filter, one window
    //     over the hash, one partial-agg groupBy) ---
    "q_pipeline_clean" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tk = split(col("text"), " ")
      val stats = docsWithExactDups(s, d).select(col("doc_id"), col("text"),
        size(tk).cast("long").as("n_tokens"),
        (size(filter(tk, t => t === "the" || t === "a")).cast("double") /
          size(tk).cast("double")).as("stop_ratio"))
      val filtered = stats
        .filter(col("n_tokens") >= 20 && col("stop_ratio") < 0.3)
      val w = Window.partitionBy(md5(col("text").cast("binary")))
      val deduped = filtered
        .withColumn("keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("keep"))
      deduped.groupBy((col("doc_id") % 10).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          round(avg(col("stop_ratio")), 6).as("avg_stop_ratio"))
        .orderBy(col("shard"))
    }),

    // --- document fingerprinting: winnowed min-hash over char 8-grams
    //     + whole-doc hash (rolling-hash analog with md5 for parity) ---
    "q_doc_fingerprint" -> ((s, d) => {
      docs(s, d).select(col("doc_id"),
          md5(col("text").cast("binary")).as("doc_hash"),
          // guard: texts shorter than 8 chars get NULL (a descending
          // sequence would throw; the oracle's range() is empty -> NULL)
          when(length(col("text")) >= 8,
            array_min(transform(
              sequence(lit(1), length(col("text")) - 7),
              i => md5(col("text").substr(i, lit(8)).cast("binary")))))
            .as("min_shingle_hash"))
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the catalog CONTRACT at the gate's fixed sf0.01 dir: stable
    // columns only (name/kind/metric/options + has-data; size bytes
    // excluded — they vary with parquet encoding). Grows with ensureAll:
    // keep in sync when adding index families.
    "q_index_stat" ->
      """SELECT * FROM (VALUES
           ('bvecann__root_testdata_sf0_01','ivf_bvec','hamming','nlist=16,probe_cal=cal3,probe_hint=13,stats=radii1,type=bvector',TRUE),
           ('dedupcc__root_testdata_sf0_01','dedup_cc','jaccard','bands=16,jacc=0.8,minhash=64,rows=4,shingle=3',TRUE),
           ('f16ann__root_testdata_sf0_01','ivf_f16','l2','nlist=16,probe_cal=cal3,probe_hint=4,stats=radii1,type=vecf16',TRUE),
           ('hnsw_cos_p1__root_testdata_sf0_01','hnsw','cos','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=1,format=flatbin2,m=12,parts=1,sample=rows1',TRUE),
           ('hnsw_cos_p4__root_testdata_sf0_01','hnsw','cos','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=4,format=flatbin2,m=12,parts=4,routable=no,routing=centroid5,sample=rows1,suggest_parts=4',TRUE),
           ('hnsw_l2_p1__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=1,format=flatbin2,m=12,parts=1,sample=rows1',TRUE),
           ('hnswbv_p1__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=1,format=flatbin2,m=12,parts=1,sample=rows1',TRUE),

           ('hnswf16_p1__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=1,format=flatbin2,m=12,parts=1,sample=rows1',TRUE),
           ('hnswsv_p1__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=1,format=flatbin2,m=12,parts=1,sample=rows1',TRUE),
           ('hnswsv_p4__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=6,format=flatbin2,m=12,parts=4,routable=no,routing=centroid5,sample=rows1,suggest_parts=6',TRUE),
           ('hnswpq_p4__root_testdata_sf0_01','hnsw_pq','l2','dims=64,ef_construction=300,files=4,format=pqflatbin3,hnsw_m=12,ks=16,m=8,parts=4,routable=no,routing=centroid5,suggest_parts=4',TRUE),
           ('hnswrq_p4__root_testdata_sf0_01','hnsw_rabitq','l2','dims=64,ef_construction=300,files=4,format=rqflatbin3,m=12,parts=4,routable=no,routing=centroid5,suggest_parts=4',TRUE),
           ('hnswsq8_p4__root_testdata_sf0_01','hnsw_sq8','l2','bits=8,ef_construction=300,files=4,format=sqflatbin3,m=12,parts=4,routable=no,routing=centroid5,suggest_parts=4',TRUE),
           ('hnsw_l2_p4__root_testdata_sf0_01','hnsw','l2','ef_cal=efcal2,ef_construction=300,ef_hint=64,files=4,format=flatbin2,m=12,parts=4,routable=no,routing=centroid5,sample=rows1,suggest_parts=4',TRUE),
           ('ivf_cos__root_testdata_sf0_01','ivf','cos','nlist=16,probe_cal=cal3,probe_hint=15,sample=rows1',TRUE),
           ('ivf_l2_part7__root_testdata_sf0_01','ivf','l2','nlist=8,probe_cal=cal3,probe_hint=7,sample=rows1',TRUE),
           ('ivf_dot__root_testdata_sf0_01','ivf','dot','nlist=16,probe_cal=cal3,probe_hint=15,sample=rows1',TRUE),
           ('ivf_l2__root_testdata_sf0_01','ivf','l2','nlist=16,probe_cal=cal3,probe_hint=12,sample=rows1',TRUE),
           ('ivfpq__root_testdata_sf0_01','ivfpq','l2','dims=64,kind2=ivfpq,ks=16,m=8,nlist=16',TRUE),
           ('ivfsq8__root_testdata_sf0_01','ivfsq8','l2','bits=8,kind2=ivfsq8,nlist=16',TRUE),
           ('pq4__root_testdata_sf0_01','pq4','l2','dims=64,ks=16,m=8',TRUE),
           ('pq__root_testdata_sf0_01','pq','l2','dims=64,ks=16,m=8',TRUE),
           ('rabitq__root_testdata_sf0_01','rabitq','l2','dims=64',TRUE),
           ('rq4__root_testdata_sf0_01','rabitq4','l2','dims=64,format=rq4block1',TRUE),
           ('sparse__root_testdata_sf0_01','sparse','dot','buckets=64',TRUE),
           ('sparsepr__root_testdata_sf0_01','sparse_pruned','dot','adaptive=mass1,buckets=64,pruning=applied,top_m=1024',TRUE),
           ('sq8__root_testdata_sf0_01','sq8','l2','bits=8',TRUE),
           ('svecann__root_testdata_sf0_01','ivf_svec','l2','nlist=16,probe_cal=cal3,probe_hint=13,stats=radii1,type=svector',TRUE),
           ('svecrange__root_testdata_sf0_01','ivf_svec','l2','nlist=16,probe_cal=cal3,probe_hint=12,stats=radii1,type=svector',TRUE)
         ) AS t(idx_name, idx_type, idx_metric, idx_options, has_data)
         ORDER BY idx_name""",
    "q_doc_stats" ->
      """SELECT doc_id,
         length(text) AS n_chars2,
         len(string_split(text, ' ')) AS n_tokens,
         length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^aeiou]', '', 'g')) AS n_vowels,
         len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS n_stop,
         CAST(list_aggregate(list_transform(string_split(text, ' '), x -> CAST(ceil(length(x) / 2.0) AS BIGINT)), 'sum') AS BIGINT) AS n_subtok,
         CAST(len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
         FROM documents ORDER BY doc_id""",

    // SimHash replayed bit-exactly in SQL: FNV-1a 64 with wrap-around
    // multiply done in HUGEINT mod 2^64 (DuckDB BIGINT arithmetic errors
    // on overflow), bit votes per position, then all-pairs xor popcount.
    // The Spark side's 4x16 pigeonhole banding is COMPLETE for
    // hamming<=3, so the all-pairs oracle matches exactly.
    "q_dedup_simhash" ->
      """WITH alldocs AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50),
         tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM alldocs),
         fnv AS (
           SELECT doc_id, list_reduce(
             list_prepend(CAST(-3750763034362895579 AS BIGINT),
               list_transform(range(1, length(t)+1), i -> CAST(ord(substring(t, CAST(i AS INT), 1)) AS BIGINT))),
             (h, b) -> CAST(CASE
                 WHEN ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 >= 9223372036854775808
                 THEN ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 - 18446744073709551616
                 ELSE ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616
               END AS BIGINT)) AS h
           FROM tok),
         hu AS (SELECT doc_id, CASE WHEN h < 0 THEN CAST(h AS HUGEINT) + 18446744073709551616 ELSE CAST(h AS HUGEINT) END AS u FROM fnv),
         votes AS (
           SELECT doc_id, b, SUM(CASE WHEN (u >> CAST(b AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS v
           FROM hu CROSS JOIN (SELECT unnest(range(64)) AS b) bits
           GROUP BY doc_id, b),
         sims AS (
           SELECT doc_id, CAST(CASE WHEN su >= 9223372036854775808 THEN su - 18446744073709551616 ELSE su END AS BIGINT) AS sim
           FROM (SELECT doc_id,
             SUM(CASE WHEN v > 0 THEN (CAST(1 AS HUGEINT) << CAST(b AS INT)) ELSE CAST(0 AS HUGEINT) END) AS su
             FROM votes GROUP BY doc_id))
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         FROM sims a JOIN sims b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.sim, b.sim)) <= 3
         ORDER BY doc_a, doc_b""",

    "q_multimodal_frames" ->
      """WITH f AS (
           SELECT doc_id, unnest(range(CAST(ceil(length(text) / 64.0) AS BIGINT))) AS frame_idx, text
           FROM documents),
         fr AS (
           SELECT doc_id, frame_idx,
             substring(text, CAST(frame_idx * 64 + 1 AS INT), 64) AS chunk
           FROM f WHERE frame_idx % 2 = 0)
         SELECT doc_id, frame_idx, CAST(length(chunk) AS BIGINT) AS n_frame_bytes,
           CAST(CAST(len(list_filter(range(1, length(chunk) + 1), i -> ord(substring(chunk, CAST(i AS INT), 1)) % 16 = 0)) AS FLOAT) / CAST(length(chunk) AS FLOAT) AS FLOAT) AS f0,
           CAST(CAST(len(list_filter(range(1, length(chunk) + 1), i -> ord(substring(chunk, CAST(i AS INT), 1)) % 16 = 5)) AS FLOAT) / CAST(length(chunk) AS FLOAT) AS FLOAT) AS f5
         FROM fr ORDER BY doc_id, frame_idx""",

    "q_token_count" ->
      """SELECT token, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token ORDER BY token""",

    "q_doc_oov" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         vc AS (SELECT tok, count(*) AS cnt FROM tk GROUP BY 1),
         vocab AS (SELECT tok FROM (
           SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rk FROM vc) WHERE rk <= 1000),
         j AS (SELECT t.doc_id, count(*) AS n_tok, count(v.tok) AS n_in
               FROM tk t LEFT JOIN vocab v ON v.tok = t.tok GROUP BY 1)
         SELECT doc_id, n_tok, n_in,
                CAST(n_tok - n_in AS DOUBLE) / n_tok AS oov_rate
         FROM j ORDER BY doc_id""",

    "q_ngram_top" ->
      """WITH toks AS (
           SELECT doc_id, lang, t.tok, t.ord
           FROM documents,
           LATERAL (SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok,
                           generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS ord) t
           WHERE length(t.tok) > 0),
         grams AS (
           SELECT DISTINCT doc_id, lang,
                  tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS gram
           FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)),
         df AS (SELECT lang, gram, count(*) AS ndocs FROM grams
                WHERE gram IS NOT NULL GROUP BY 1, 2),
         rk AS (SELECT lang, gram, ndocs,
                  row_number() OVER (PARTITION BY lang ORDER BY ndocs DESC, gram) AS rk
                FROM df)
         SELECT lang, rk, gram, ndocs FROM rk WHERE rk <= 5 ORDER BY lang, rk""",

    "q_lang_id" ->
      """WITH c AS (SELECT doc_id, lang,
           len(list_filter(string_split(text, ' '), x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und' OR x = 'ist')) AS c_de,
           len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a' OR x = 'and' OR x = 'is' OR x = 'of')) AS c_en,
           len(list_filter(string_split(text, ' '), x -> x = 'el' OR x = 'la' OR x = 'los' OR x = 'que' OR x = 'y')) AS c_es,
           len(list_filter(string_split(text, ' '), x -> x = 'le' OR x = 'les' OR x = 'des' OR x = 'et' OR x = 'une')) AS c_fr
           FROM documents)
         SELECT doc_id, lang, c_de, c_en, c_es, c_fr,
           CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
                WHEN c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
                WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
                WHEN c_fr > 0 THEN 'fr'
                ELSE 'und' END AS pred,
           (CASE WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
                WHEN c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
                WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
                WHEN c_fr > 0 THEN 'fr'
                ELSE 'und' END) = lang AS is_match
         FROM c ORDER BY doc_id""",

    "q_dedup_exact" ->
      s"""WITH alldocs AS $exactDupSql
          SELECT md5(text) AS h, count(*) AS cnt,
            min(doc_id) AS keep_id, max(doc_id) AS dup_id
          FROM alldocs GROUP BY 1 HAVING count(*) > 1 ORDER BY h""",

    "q_dedup_keep_first" ->
      s"""WITH alldocs AS $exactDupSql
          SELECT doc_id FROM (
            SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
            FROM alldocs)
          WHERE doc_id = keep ORDER BY doc_id""",

    "q_dedup_jaccard" -> jaccardOracle,
    "q_dedup_minhash" -> jaccardOracle,
    // transitive closure over the same verified jacc>=0.8 edge set; the
    // recursive CTE computes min reachable id per cluster member
    "q_dedup_cluster" ->
      s"""WITH RECURSIVE alldocs AS $chainDupSql,
          sh AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
              i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS s
            FROM alldocs),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
          bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs),
          reach(src, node) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM bidir)
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.node = b.src)
          SELECT src AS doc_id, min(node) AS rep
          FROM reach GROUP BY src ORDER BY doc_id""",

    "q_dedup_apply" ->
      s"""WITH RECURSIVE alldocs AS $chainDupSql,
          sh AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
              i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS s
            FROM alldocs),
          pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8),
          bidir AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b AS src, doc_a AS dst FROM pairs),
          reach(src, node) AS (
            SELECT src, src FROM (SELECT DISTINCT src FROM bidir)
            UNION
            SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.node = b.src),
          cl AS (SELECT src AS doc_id, min(node) AS rep FROM reach GROUP BY src)
          SELECT a.doc_id, CAST(length(a.text) AS BIGINT) AS n_chars
          FROM alldocs a LEFT JOIN cl ON cl.doc_id = a.doc_id
          WHERE cl.doc_id IS NULL OR cl.rep = a.doc_id
          ORDER BY a.doc_id""",

    "q_embed_neardup" -> embedNearDupOracle,
    "q_embed_neardup_lsh" -> embedNearDupOracle,

    // semantic dedup: replay the cosine-argmin assignment (row_number
    // over (cd, cid) == the kernel's strict-< lowest-index tie-break)
    // and the within-cluster keep-first removal rule
    "q_dedup_semantic" ->
      s"""WITH alle AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 100000 AS vec_id,
                   list_transform(embedding, x -> x * CAST(2.0 AS FLOAT)) AS embedding
            FROM embeddings WHERE vec_id < 50),
          cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
                    WHERE vec_id < 8),
          asg AS (
            SELECT e.vec_id, e.embedding, c.cid,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosSqlGuarded("e.embedding", "c.cv")}, c.cid) AS rk
            FROM alle e CROSS JOIN cents c),
          cl AS (SELECT vec_id, embedding, cid FROM asg WHERE rk = 1),
          rem AS (
            SELECT DISTINCT b.vec_id
            FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE ${cosSql("a.embedding", "b.embedding")} < 0.05)
          SELECT cl.vec_id AS vec_id, CAST(cl.cid AS BIGINT) AS cluster,
                 cl.vec_id NOT IN (SELECT vec_id FROM rem) AS kept
          FROM cl ORDER BY vec_id""",

    "q_embed_batch" ->
      """SELECT doc_id, CAST(64 AS BIGINT) AS dims, CAST(1.0 AS DOUBLE) AS norm
         FROM documents ORDER BY doc_id""",

    // knn over FNV token-bucket count vectors: counts are exact integers,
    // so every sum is order-insensitive exact double arithmetic; the
    // per-token FNV-1a replay is the q_dedup_simhash HUGEINT pattern
    "q_embed_knn" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
         fnv AS (
           SELECT doc_id, list_reduce(
             list_prepend(CAST(-3750763034362895579 AS BIGINT),
               list_transform(range(1, length(t)+1), i -> CAST(ord(substring(t, CAST(i AS INT), 1)) AS BIGINT))),
             (h, b) -> CAST(CASE
                 WHEN ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 >= 9223372036854775808
                 THEN ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616 - 18446744073709551616
                 ELSE ((CASE WHEN xor(h, b) < 0 THEN CAST(xor(h, b) AS HUGEINT) + 18446744073709551616 ELSE CAST(xor(h, b) AS HUGEINT) END) * 1099511628211) % 18446744073709551616
               END AS BIGINT)) AS h
           FROM tok),
         buck AS (SELECT doc_id, ((h % 64) + 64) % 64 AS b FROM fnv),
         cnts AS (SELECT doc_id, b, CAST(COUNT(*) AS DOUBLE) AS c
           FROM buck GROUP BY doc_id, b),
         xx AS (SELECT doc_id, SUM(c * c) AS v FROM cnts GROUP BY doc_id),
         qc AS (SELECT b, c FROM cnts WHERE doc_id = 0),
         qn AS (SELECT SUM(c * c) AS v FROM qc),
         xy AS (SELECT d.doc_id, SUM(d.c * q.c) AS v
           FROM cnts d JOIN qc q ON d.b = q.b GROUP BY d.doc_id)
         SELECT x.doc_id AS doc_id,
           1.0 - COALESCE(xy.v, 0.0) / sqrt(x.v * (SELECT v FROM qn)) AS cdist
         FROM xx x LEFT JOIN xy ON xy.doc_id = x.doc_id
         WHERE x.doc_id <> 0
         ORDER BY cdist, doc_id LIMIT 10""",

    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         md5(text) AS content_fp, substring(text, 1, 12) AS head
         FROM documents ORDER BY doc_id""",

    "q_doc_quantiles" ->
      """SELECT lang, count(*) AS n_docs,
         quantile_cont(n_chars, 0.5) AS p50,
         quantile_cont(n_chars, 0.9) AS p90,
         min(n_chars) AS mn, max(n_chars) AS mx
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_pipeline_clean" ->
      s"""WITH alldocs AS $exactDupSql,
          stats AS (
            SELECT doc_id, text,
              len(string_split(text, ' ')) AS n_tokens,
              CAST(len(list_filter(string_split(text, ' '), t -> t = 'the' OR t = 'a')) AS DOUBLE)
                / len(string_split(text, ' ')) AS stop_ratio
            FROM alldocs),
          filtered AS (
            SELECT * FROM stats WHERE n_tokens >= 20 AND stop_ratio < 0.3),
          deduped AS (
            SELECT * FROM (
              SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep
              FROM filtered)
            WHERE doc_id = keep)
          SELECT doc_id % 10 AS shard, count(*) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
            round(avg(stop_ratio), 6) AS avg_stop_ratio
          FROM deduped GROUP BY 1 ORDER BY shard""",

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS doc_hash,
         list_min(list_transform(range(1, length(text) - 6),
           i -> md5(substring(text, i, 8)))) AS min_shingle_hash
         FROM documents ORDER BY doc_id"""
  )
}
