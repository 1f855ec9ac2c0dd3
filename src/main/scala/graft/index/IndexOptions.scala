package graft.index

/** pgvector-compatibility option spellings (reference
  * src/index/compatibility.rs:7-60): the `CREATE INDEX ... USING hnsw
  * (m = 16, ef_construction = 64)` / `USING ivfflat (lists = 100)`
  * reloption names map onto the native build params — hnsw
  * {m, ef_construction}, ivf {nlist} (pgvector spells it `lists`).
  * Both spellings are accepted by the options-taking `ensure` entry
  * points ([[graft.operators.Hnsw.ensure]],
  * [[graft.operators.IvfIndex.ensure]]); unknown keys error, the way
  * the reference rejects unknown reloptions. */
object IndexOptions {

  /** hnsw options: `m`, `ef_construction` (identical in both
    * spellings). Returns (m, efConstruction). */
  def hnsw(opts: Map[String, String],
      defaultM: Int = 12, defaultEf: Int = 300): (Int, Int) = {
    val bad = opts.keySet -- Set("m", "ef_construction")
    require(bad.isEmpty, s"unknown hnsw option(s): ${bad.mkString(", ")}")
    (opts.get("m").map(_.trim.toInt).getOrElse(defaultM),
      opts.get("ef_construction").map(_.trim.toInt).getOrElse(defaultEf))
  }

  /** Known index access methods (`CREATE INDEX ... USING <am>`): the
    * native AM (finalize.sql:714) plus the pgvector-compatibility
    * spellings (src/index/compatibility.rs:7-60). Unknown AMs error with
    * the reference's message (tests/sqllogictest/compact_stmt.slt). */
  def accessMethod(am: String): String = {
    require(Set("vectors", "hnsw", "ivfflat").contains(am),
      s"""access method "$am" does not exist""")
    am
  }

  /** Opclass spelling -> (type family, metric) — the reference's full
    * opclass matrix (finalize.sql:745-803) plus the pgvector names
    * vector_ip_ops / vector_cosine_ops (compatibility.rs). Unknown
    * names error with the reference's message (compact_stmt.slt).
    * Families are the PLANNER's: "dense" for f32 vectors (whose
    * registration key is the bare metric), "f16"/"svec"/"bvec" for the
    * typed opclasses (family-qualified keys) — [[metricKey]] renders
    * the exact registration spelling. */
  private val Opclasses: Map[String, (String, String)] = Map(
    "vector_l2_ops" -> ("dense", "l2"),
    "vector_dot_ops" -> ("dense", "dot"),
    "vector_cos_ops" -> ("dense", "cos"),
    "vector_ip_ops" -> ("dense", "dot"),      // pgvector spelling
    "vector_cosine_ops" -> ("dense", "cos"),  // pgvector spelling
    "vecf16_l2_ops" -> ("f16", "l2"),
    "vecf16_dot_ops" -> ("f16", "dot"),
    "vecf16_cos_ops" -> ("f16", "cos"),
    "svector_l2_ops" -> ("svec", "l2"),
    "svector_dot_ops" -> ("svec", "dot"),
    "svector_cos_ops" -> ("svec", "cos"),
    "bvector_hamming_ops" -> ("bvec", "hamming"),
    "bvector_dot_ops" -> ("bvec", "dot"),
    "bvector_jaccard_ops" -> ("bvec", "jaccard"))

  def isOpclass(name: String): Boolean = Opclasses.contains(name)

  def opclass(name: String, am: String = "vectors"): (String, String) = {
    accessMethod(am)
    Opclasses.getOrElse(name, throw new IllegalArgumentException(
      s"""operator class "$name" does not exist for access method "$am""""))
  }

  /** The [[graft.plans.AnnPushdown.IndexedTable]] metric-key spelling
    * for an opclass: bare metric for dense f32 ("l2"), family-qualified
    * for the typed opclasses ("bvec:hamming"). */
  def metricKey(name: String, am: String = "vectors"): String = {
    val (family, metric) = opclass(name, am)
    if (family == "dense") metric else s"$family:$metric"
  }

  /** ivf options: pgvector `lists` ≡ native `nlist`; both accepted,
    * conflicting values rejected. */
  def ivf(opts: Map[String, String], defaultNlist: Int = 16): Int = {
    val bad = opts.keySet -- Set("lists", "nlist")
    require(bad.isEmpty, s"unknown ivf option(s): ${bad.mkString(", ")}")
    require(!(opts.contains("lists") && opts.contains("nlist") &&
        opts("lists").trim != opts("nlist").trim),
      "conflicting lists/nlist options")
    opts.get("lists").orElse(opts.get("nlist"))
      .map(_.trim.toInt).getOrElse(defaultNlist)
  }

  /** `kmeans_iters` reloption: k-means training iterations for IVF
    * builds (default 10, the reference's build default). A build-cost
    * knob — partition QUALITY degrades gracefully (exactness at
    * nprobe = nlist never depends on the clustering), useful for small
    * fixture/staging indexes where training dominates build time. */
  def ivfIters(opts: Map[String, String]): Int = {
    val it = opts.get("kmeans_iters").map(_.trim.toInt).getOrElse(10)
    require(it > 0 && it <= 1000, s"kmeans_iters out of range: $it")
    it
  }
}
