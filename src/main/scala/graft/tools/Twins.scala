package graft.tools

/** Emit TWINS.json — the machine-readable approximate/exact twin map
  * (round 15): for every `SparkEntry.queries` entry that carries no
  * DuckDB oracle (approximate by the repo's contract), the exact-mode
  * twin query that IS oracle-gated plus the RECALL.json family where
  * the approximate path's quality is measured. Pure metadata: no Spark
  * session, no jobs. TwinsSpec asserts total coverage, so the emitted
  * file can never under-claim.
  *
  * Usage: sbt "runMain graft.tools.Twins"  (writes ./TWINS.json)
  */
object Twins {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "TWINS.json"
    val noOracle =
      (graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet)
    val twins = graft.SparkEntry.twins
    val missing = noOracle -- twins.keySet
    require(missing.isEmpty,
      s"no_oracle queries without a twin entry: ${missing.toSeq.sorted}")
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
    val body = twins.toSeq.sortBy(_._1).map { case (q, (twin, family)) =>
      s"""  "${esc(q)}": {"exact_twin": "${esc(twin)}", "recall_family": "${esc(family)}"}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), body + "\n")
    println(s"[twins] wrote ${twins.size} entries to $out " +
      s"(${noOracle.size} no_oracle queries, all covered)")
  }
}
