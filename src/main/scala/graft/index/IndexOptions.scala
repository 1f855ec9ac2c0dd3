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
}
