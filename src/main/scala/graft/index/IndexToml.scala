package graft.index

/**
 * The reference's `CREATE INDEX ... WITH (options = "<TOML>")` body
 * (crates/base/src/index.rs `IndexingOptions` / `QuantizationOptions`,
 * serde with `deny_unknown_fields`; exercised by every sqllogictest
 * file: `[indexing.hnsw]`, `[indexing.ivf]\nnlist = 20`,
 * `[indexing.hnsw.quantization.product]`, `[indexing.flat]`, ...).
 *
 * This is a deliberately minimal TOML subset — exactly the shapes the
 * reference's own options accept: `[table.path]` headers, `key = value`
 * scalars (integers, booleans, bare words, quoted strings), comments,
 * blank lines. Unknown tables/fields/variants error with messages
 * carrying the reference's vocabulary ("unknown field ...") so
 * conformance tests that match on "unknown" pass verbatim
 * (tests/sqllogictest/index.slt `statement error unknown`).
 *
 * Validation ranges mirror index.rs: m 4..128, ef_construction 10..2000,
 * nlist 1..1_000_000, product ratio 1..8, quantization bits 1|2|4|8.
 */
object IndexToml {

  /** Parsed `[indexing.*]` selection: the kind (`flat` | `ivf` | `hnsw`
    * | `sparse_inverted_index`), its scalar options, the optional
    * quantization sub-table (variant name -> its scalar options), and
    * the validated-but-advisory `[segment]` / `[optimizing]` lifecycle
    * knobs (`"optimizing.optimizing_threads" -> "16"`, vbase.slt's
    * spelling): accepted so reference DDL ports verbatim, never part
    * of the build recipe — the executing analogs here are the
    * spark.graft.segments.* session confs and Spark's own task
    * parallelism. */
  case class Indexing(kind: String, keys: Map[String, String],
      quantization: Option[(String, Map[String, String])],
      lifecycle: Map[String, String] = Map.empty)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"invalid index options: $msg")

  private val IndexingKinds = Set("flat", "ivf", "hnsw", "sparse_inverted_index")
  private val QuantKinds = Set("scalar", "product", "rabitq")
  private val KindKeys: Map[String, Set[String]] = Map(
    "flat" -> Set.empty,
    "ivf" -> Set("nlist", "spherical_centroids", "residual_quantization"),
    "hnsw" -> Set("m", "ef_construction"),
    "sparse_inverted_index" -> Set.empty)
  private val QuantKeys: Map[String, Set[String]] = Map(
    "scalar" -> Set("bits"),
    "product" -> Set("ratio", "bits"),
    "rabitq" -> Set.empty)

  private def stripValue(raw: String): String = {
    val v = raw.trim
    if ((v.startsWith("\"") && v.endsWith("\"") && v.length >= 2) ||
        (v.startsWith("'") && v.endsWith("'") && v.length >= 2))
      v.substring(1, v.length - 1)
    else v
  }

  /** Parse the TOML body into per-table key maps. Returns
    * (tablePath -> keys); the root table's path is "". */
  private def tables(toml: String): Seq[(String, Map[String, String])] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String,
      scala.collection.mutable.LinkedHashMap[String, String]]
    var current = ""
    out(current) = scala.collection.mutable.LinkedHashMap.empty
    toml.split("\n").foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        if (line.startsWith("[")) {
          if (!line.endsWith("]")) fail(s"malformed table header: $line")
          val path = line.substring(1, line.length - 1).trim
          if (path.isEmpty ||
              !path.split("\\.").forall(_.matches("[A-Za-z0-9_-]+")))
            fail(s"malformed table header: [$path]")
          current = path
          if (!out.contains(current))
            out(current) = scala.collection.mutable.LinkedHashMap.empty
        } else line.split("=", 2) match {
          case Array(k, v) if k.trim.matches("[A-Za-z0-9_-]+") =>
            out(current)(k.trim) = stripValue(v)
          // TOML dotted keys (`optimizing.optimizing_threads = 16`,
          // vbase.slt): the prefix nests under the current table
          case Array(k, v)
              if k.trim.matches("[A-Za-z0-9_-]+(\\.[A-Za-z0-9_-]+)+") =>
            val segs = k.trim.split("\\.")
            val tablePath = (Option(current).filter(_.nonEmpty).toSeq ++
              segs.init).mkString(".")
            if (!out.contains(tablePath))
              out(tablePath) = scala.collection.mutable.LinkedHashMap.empty
            out(tablePath)(segs.last) = stripValue(v)
          case _ => fail(s"malformed line: $line")
        }
      }
    }
    out.toSeq.map { case (p, m) => (p, m.toMap) }
  }

  private def checkInt(table: String, keys: Map[String, String],
      key: String, lo: Long, hi: Long): Unit =
    keys.get(key).foreach { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          fail(s"invalid value for `$key` in [$table]: $v")
      }
      if (n < lo || n > hi)
        fail(s"`$key` out of range in [$table]: $n (expected $lo..$hi)")
    }

  private def checkBool(table: String, keys: Map[String, String],
      key: String): Unit =
    keys.get(key).foreach { v =>
      if (v != "true" && v != "false")
        fail(s"invalid value for `$key` in [$table]: $v (expected true/false)")
    }

  /** Parse + validate the reference options TOML. Absent `[indexing.*]`
    * selects the default `[indexing.hnsw]` (index.rs:
    * `Default for IndexingOptions`). */
  def parse(toml: String): Indexing = {
    val tbls = tables(toml)
    // root scalars: the options struct has no root fields — every
    // root-level key is serde's `unknown field` error (index.slt)
    tbls.find(_._1 == "").filter(_._2.nonEmpty).foreach { case (_, ks) =>
      fail(s"unknown field `${ks.head._1}`")
    }
    var kind: Option[String] = None
    var kindKeys = Map.empty[String, String]
    var quant: Option[(String, Map[String, String])] = None
    val lifecycle = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val LifecycleKeys: Map[String, Set[String]] = Map(
      "segment" -> Set("max_growing_segment_size", "max_sealed_segment_size"),
      "optimizing" -> Set("sealing_secs", "sealing_size", "optimizing_secs",
        "optimizing_threads", "delete_threshold"))
    tbls.filter(_._1.nonEmpty).foreach { case (path, keys) =>
      path.split("\\.").toSeq match {
        case Seq("indexing") =>
          // bare [indexing] is not a variant selection — serde requires
          // exactly one variant table
          if (keys.nonEmpty) fail(s"unknown field `${keys.head._1}` in [indexing]")
        case Seq("indexing", k) =>
          if (!IndexingKinds(k))
            fail(s"unknown variant `$k` in [indexing] " +
              s"(expected flat, ivf, hnsw or sparse_inverted_index)")
          if (kind.exists(_ != k)) fail("multiple [indexing.*] variants")
          kind = Some(k); kindKeys = keys
        case Seq("indexing", k, "quantization") =>
          if (!IndexingKinds(k)) fail(s"unknown variant `$k` in [indexing]")
          if (keys.nonEmpty)
            fail(s"unknown field `${keys.head._1}` in [indexing.$k.quantization]")
        case Seq("indexing", k, "quantization", q) =>
          if (!IndexingKinds(k)) fail(s"unknown variant `$k` in [indexing]")
          if (!QuantKinds(q))
            fail(s"unknown variant `$q` in [indexing.$k.quantization] " +
              s"(expected scalar, product or rabitq)")
          if (kind.exists(_ != k)) fail("multiple [indexing.*] variants")
          kind = Some(k)
          if (quant.exists(_._1 != q)) fail("multiple quantization variants")
          quant = Some((q, keys))
        case Seq(t @ ("segment" | "optimizing")) =>
          // the reference's background-worker lifecycle knobs
          // (index.rs SegmentOptions/OptimizingOptions; vbase.slt sets
          // optimizing.optimizing_threads): validated and ACCEPTED so
          // reference DDL ports verbatim, advisory here — the
          // executing analogs are spark.graft.segments.* confs and
          // Spark's task parallelism, never per-artifact state.
          // delete_threshold in particular EXECUTES via
          // spark.graft.segments.deleteThreshold (round 17:
          // IncrMaint.vacuumIfDue at every incremental sync)
          val bad = keys.keySet -- LifecycleKeys(t)
          if (bad.nonEmpty) fail(s"unknown field `${bad.head}` in [$t]")
          keys.foreach { case (k, v) => lifecycle(s"$t.$k") = v }
        case _ => fail(s"unknown field `$path`")
      }
    }
    val k = kind.getOrElse("hnsw")
    val unknown = kindKeys.keySet -- KindKeys(k)
    if (unknown.nonEmpty)
      fail(s"unknown field `${unknown.head}` in [indexing.$k]")
    quant.foreach { case (q, qk) =>
      val bad = qk.keySet -- QuantKeys(q)
      if (bad.nonEmpty)
        fail(s"unknown field `${bad.head}` in [indexing.$k.quantization.$q]")
      checkInt(s"indexing.$k.quantization.$q", qk, "ratio", 1, 8)
      qk.get("bits").foreach { b =>
        if (!Set("1", "2", "4", "8")(b.trim))
          fail(s"invalid quantization bits: $b (expected 1, 2, 4 or 8)")
      }
      if (k == "sparse_inverted_index")
        fail("quantization is only supported for dense vectors")
    }
    checkInt(s"indexing.$k", kindKeys, "m", 4, 128)
    checkInt(s"indexing.$k", kindKeys, "ef_construction", 10, 2000)
    checkInt(s"indexing.$k", kindKeys, "nlist", 1, 1000000)
    checkBool(s"indexing.$k", kindKeys, "spherical_centroids")
    checkBool(s"indexing.$k", kindKeys, "residual_quantization")
    Indexing(k, kindKeys, quant, lifecycle.toMap)
  }

  /** Render a parsed selection as the flat `k=v,k=v` reloptions string
    * [[SqlDdl.create]] dispatches on — the single serialization the
    * manifest recipe stores and VACUUM replays. */
  def toReloptions(ix: Indexing): String = {
    val base = Seq("indexing" -> ix.kind) ++ ix.keys.toSeq.sortBy(_._1) ++
      ix.quantization.toSeq.flatMap { case (q, qk) =>
        Seq("quantization" -> q) ++ qk.toSeq.sortBy(_._1)
      }
    base.map { case (k, v) => s"$k=$v" }.mkString(",")
  }
}
