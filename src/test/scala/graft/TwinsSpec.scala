package graft

import org.scalatest.funsuite.AnyFunSuite

/** The approximate/exact twin contract, machine-checked (round 15):
  * every `SparkEntry.queries` entry without a DuckDB oracle must name
  * its exact-mode twin and recall family in `SparkEntry.twins` — a new
  * approximate query cannot ship uncovered. Pure metadata, no session. */
class TwinsSpec extends AnyFunSuite {

  test("every no_oracle query names an oracle-gated exact twin") {
    val queries = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val noOracle = queries -- oracled
    val twins = SparkEntry.twins
    val uncovered = noOracle -- twins.keySet
    assert(uncovered.isEmpty,
      s"approximate queries without a twin entry: ${uncovered.toSeq.sorted}")
    val stale = twins.keySet -- noOracle
    assert(stale.isEmpty,
      "twin entries for queries that are oracle-gated (or gone) — " +
        s"remove them: ${stale.toSeq.sorted}")
    // each twin must itself be an oracle-gated query (the whole point:
    // the exact-mode path IS value-checked)
    val badTwins = twins.collect {
      case (q, (t, _)) if !oracled.contains(t) => s"$q -> $t"
    }
    assert(badTwins.isEmpty,
      s"twins that are not oracle-gated queries: ${badTwins.toSeq.sorted}")
  }

  test("recall families resolve against the committed RECALL.json") {
    val f = new java.io.File("RECALL.json")
    assume(f.isFile, "RECALL.json not present in the working tree")
    val txt = java.nio.file.Files.readString(f.toPath)
    // family names are JSON keys — presence-by-name is enough here (the
    // recall bar itself is graft.tools.Recall's contract)
    val missing = SparkEntry.twins.values.map(_._2).toSet
      .filterNot(fam => txt.contains("\"" + fam + "\""))
    assert(missing.isEmpty,
      s"twin recall families absent from RECALL.json: ${missing.toSeq.sorted}")
  }
}
