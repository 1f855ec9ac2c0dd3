package graft.index

import org.apache.spark.sql.SparkSession

/**
 * Reference GUC surface (src/gucs/planning.rs:11-43, executing.rs:4-23)
 * and the pgvector-compatibility aliasing contract
 * (src/index/compatibility.rs:7-59, tests/sqllogictest/compact_var.slt).
 *
 * Two layers:
 *
 *  1. SQL-text `SET` statements spelled with the reference's own GUC
 *     names rewrite onto the native `spark.graft.*` confs before
 *     parsing ([[rewriteSet]], applied by [[GraftSqlParser.parsePlan]]).
 *     `vectors.*` names always map (they ARE this engine's GUCs under
 *     the reference's spelling); the pgvector spellings
 *     (`ivfflat.probes`, `hnsw.ef_search`) map ONLY while
 *     `vectors.pgvector_compatibility` is on — with it off they remain
 *     inert foreign keys, exactly the reference's behavior where the
 *     utility-hook name swap is skipped (compatibility.rs:9-11).
 *     Because the swap happens at SET time, last-write-wins shared
 *     storage falls out for free: compact_var.slt's
 *     `SET vectors.hnsw_ef_search=600` then `SHOW hnsw.ef_search`
 *     sequence reads 600 through the same rewrite on the read form.
 *
 *  2. Conf-layer read-time aliases for programmatic
 *     `spark.conf.set` users: [[alias]] returns the pgvector-spelled
 *     key's value only while compatibility mode is on. The native key
 *     is the storage; the alias wins when set AND enabled (it exists
 *     only for porting convenience — reference-native code uses the
 *     `vectors.*` spellings, which always map to the native keys).
 *
 * Default matches the reference: compatibility OFF
 * (planning.rs:15 `GucSetting::<bool>::new(false)`).
 */
object Gucs {

  val CompatKey = "spark.graft.pgvector.compatibility"

  /** GUC-style booleans: the reference accepts on/off (PG GUC syntax);
    * Spark conf reads elsewhere use strict toBoolean, so SET-time
    * rewriting normalizes to true/false ([[rewriteSet]]). Garbage
    * values ERROR like PG's invalid-bool-GUC message — silently
    * defaulting a typo'd `SET vectors.enable_index=ture` to false would
    * turn off acceleration with no diagnostic (the conf2 garbage-errors
    * convention). */
  def gucBool(v: String): Boolean = v.trim.toLowerCase match {
    case "on" | "true" | "1" | "yes" => true
    case "off" | "false" | "0" | "no" => false
    case other => throw new IllegalArgumentException(
      s"""parameter requires a Boolean value: "$other" (on/off)""")
  }

  /** LENIENT read (garbage -> false, the default): this is consulted
    * inside the ANN rewrite rule ([[graft.plans]] hnswEfSearch) and the
    * parse path, where the round-10 convention is "unparseable conf
    * values resolve to the default, never an optimizer-rule throw".
    * SET-time values are strictly validated by [[gucBool]], so garbage
    * can only arrive through a programmatic conf.set. */
  def pgvectorCompat(s: SparkSession): Boolean =
    s.conf.get(CompatKey, "off").trim.toLowerCase match {
      case "on" | "true" | "1" | "yes" => true
      case _ => false
    }

  /** The pgvector-spelled alias key's value, honored only in
    * compatibility mode (compact_var.slt: with compat off,
    * `SET ivfflat.probes=40` leaves `vectors.ivf_nprobe` at 10). */
  def alias(s: SparkSession, aliasKey: String): Option[String] =
    if (pgvectorCompat(s)) s.conf.getOption(aliasKey) else None

  /** `vectors.*` GUC names -> native conf keys: unconditional (these
    * are the reference's native spellings of OUR tunables). Value is
    * (native key, normalize-bool?). Round 14 completes the executing.rs
    * set: the rerank sizes EXECUTE (absolute candidate counts
    * overriding the window-multiplier defaults in the quantized
    * two-stage searches); the fast_scan bools and internal_transport
    * are ACCEPTED AS ADVISORY (fast-scan here is a CREATE-time layout
    * choice — [indexing.flat.quantization.product] vs the pq4/rq4
    * blocked kinds — not a search-time toggle, and there is no IPC
    * transport to pick; the TOML [optimizing]-knob precedent); the
    * openai keys store like PG (the embedding surface itself stays
    * in-engine — openai_options.slt's documented scope). */
  private val VectorsGucs: Map[String, (String, Boolean)] = Map(
    "vectors.ivf_nprobe" -> ("spark.graft.ann.nprobe", false),
    "vectors.hnsw_ef_search" -> ("spark.graft.hnsw.efSearch", false),
    "vectors.search_mode" -> ("spark.graft.search.mode", false),
    "vectors.enable_index" -> ("spark.graft.ann.enabled", true),
    "vectors.pgvector_compatibility" -> (CompatKey, true),
    "vectors.sq_rerank_size" -> ("spark.graft.sq8.rerankSize", false),
    "vectors.pq_rerank_size" -> ("spark.graft.pq.rerankSize", false),
    "vectors.sq_fast_scan" -> ("spark.graft.sq8.fastScan", true),
    "vectors.pq_fast_scan" -> ("spark.graft.pq.fastScan", true),
    "vectors.rq_fast_scan" -> ("spark.graft.rabitq.fastScan", true),
    "vectors.internal_transport" -> ("spark.graft.internal.transport", false),
    "vectors.openai_api_key" -> ("spark.graft.openai.apiKey", false),
    "vectors.openai_base_url" -> ("spark.graft.openai.baseUrl", false))

  /** SET-time value validation beyond bool normalization (PG errors on
    * out-of-domain GUC values at SET): the rerank sizes take the
    * reference's 0..65535 int range, internal_transport its enum. */
  private def validateSet(key: String, v: String): Unit = key match {
    case "vectors.sq_rerank_size" | "vectors.pq_rerank_size" =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"""parameter "$key" requires an integer value: "$v"""")
      }
      if (n < 0 || n > 65535) throw new IllegalArgumentException(
        s"""$n is outside the valid range for parameter "$key" (0 .. 65535)""")
    case "vectors.internal_transport" =>
      if (!Set("unix", "mmap")(v.toLowerCase))
        throw new IllegalArgumentException(
          s"""invalid value for parameter "$key": "$v" """.trim +
            " (unix/mmap)")
    case _ => ()
  }

  /** pgvector GUC names -> native conf keys: applied only while
    * compatibility mode is on at statement-parse time. */
  private val PgvectorGucs: Map[String, (String, Boolean)] = Map(
    "ivfflat.probes" -> ("spark.graft.ann.nprobe", false),
    "hnsw.ef_search" -> ("spark.graft.hnsw.efSearch", false))

  /** Is this a reference GUC spelling ([[rewriteSet]]'s name set)?
    * Gates the parser's claim on `SHOW <key>` so Spark's own SHOW
    * statements (TABLES, DATABASES, …) always delegate. */
  def isGucName(key: String): Boolean = {
    val k = key.toLowerCase
    VectorsGucs.contains(k) || PgvectorGucs.contains(k)
  }

  /** PG `SHOW <guc>` (compact_var.slt's read statements): the stored
    * value in the PG spelling — bools print on/off; `vectors.*` names
    * read the native conf (defaults: compatibility off, search_mode
    * vbase; enable_index prints `off` when unset — acceleration is
    * opt-in here where the reference defaults on; ivf_nprobe AND
    * hnsw_ef_search print `auto`, this engine's stronger defaults that
    * resolve max(10, probe hint) / max(100, ef hint) from the
    * artifact's calibration — divergences documented in SURVEY rows
    * 53/31 and the CONFORMANCE table). A pgvector-spelled name reads the
    * native conf in compatibility mode, its own foreign storage
    * otherwise; an unset foreign name errors like PG's unrecognized
    * parameter. */
  def showValue(s: SparkSession, key: String): String = {
    val k = key.toLowerCase
    def boolSpelling(v: String): String =
      if (gucBool(v)) "on" else "off"
    VectorsGucs.get(k) match {
      case Some((native, normBool)) =>
        val dflt = k match {
          case "vectors.pgvector_compatibility" => "false"
          case "vectors.enable_index" => "false"
          case "vectors.search_mode" => "vbase"
          case "vectors.ivf_nprobe" => "auto"
          // round 17: beams joined the calibrated-default convention —
          // unset resolves max(100, the artifact's ef_hint), so the
          // honest SHOW is auto (the ivf_nprobe divergence precedent;
          // reference default 100 prints only when explicitly SET)
          case "vectors.hnsw_ef_search" => "auto"
          // unset rerank sizes print `auto`: the engine's stronger
          // default is the window MULTIPLIER (4k/8k candidates), not
          // the reference's 0 — the ivf_nprobe divergence convention
          case "vectors.sq_rerank_size" | "vectors.pq_rerank_size" => "auto"
          // advisory knobs print the reference defaults (executing.rs /
          // internal.rs): fast-scan layouts are CREATE-time choices
          // here, and there is no IPC transport
          case "vectors.sq_fast_scan" | "vectors.pq_fast_scan" => "false"
          case "vectors.rq_fast_scan" => "true"
          case "vectors.internal_transport" => "mmap"
          case _ => ""
        }
        val v = s.conf.get(native, dflt)
        if (normBool) boolSpelling(v) else v
      case None =>
        val (native, _) = PgvectorGucs(k)
        if (pgvectorCompat(s)) {
          // shared storage: read through the vectors.* spelling so the
          // unset default matches (ivfflat.probes ≡ vectors.ivf_nprobe)
          val vectorsName = VectorsGucs.collectFirst {
            case (vk, (n, _)) if n == native => vk
          }.get
          showValue(s, vectorsName)
        } else s.conf.getOption(key).getOrElse(
          throw new IllegalArgumentException(
            s"""unrecognized configuration parameter "$key""""))
    }
  }

  // SET <key> [= <value>] — never matches ALTER ... SET (anchored), the
  // PG `SET x TO y` form (trailing text breaks the anchor), or Spark's
  // `SET -v`. Key charset is the GUC dotted-identifier shape.
  private val SetRe =
    """(?is)^\s*SET\s+([A-Za-z_][A-Za-z0-9_.]*)\s*(?:=\s*(\S.*?))?\s*;?\s*$""".r

  /** Rewrite a `SET` statement whose key is a reference GUC spelling
    * onto the native conf key (identity for everything else). Applies
    * to bare reads too — Spark's `SET key` IS the reference's `SHOW`,
    * so the compat-on read of `hnsw.ef_search` sees the shared native
    * value. */
  def rewriteSet(sqlText: String): String = sqlText match {
    case SetRe(key, value) =>
      val k = key.toLowerCase
      val mapped = VectorsGucs.get(k).orElse {
        val compat = SparkSession.getActiveSession.exists(pgvectorCompat)
        if (compat) PgvectorGucs.get(k) else None
      }
      mapped match {
        case Some((native, normBool)) =>
          Option(value) match {
            case Some(v0) =>
              // PG quotes any GUC value (`SET x = 'on'` is valid PG):
              // strip one layer of surrounding single quotes before
              // normalizing/storing
              val v = {
                val t = v0.trim
                if (t.length >= 2 && t.head == '\'' && t.last == '\'')
                  t.substring(1, t.length - 1)
                else t
              }
              validateSet(k, v)
              val nv = if (normBool) gucBool(v).toString else v
              s"SET $native=$nv"
            case None => s"SET $native"
          }
        case None => sqlText
      }
    case _ => sqlText
  }
}
