package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Register the SQL function surface once per session (re-registering
    * per query sprayed SimpleFunctionRegistry WARNs over bench logs). */
  private def withFns(spark: SparkSession): SparkSession = {
    val marker = org.apache.spark.sql.catalyst.FunctionIdentifier("l2sq_distance")
    if (!spark.sessionState.functionRegistry.functionExists(marker))
      functions.registerAll(spark)
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * exact top-10 nearest neighbours of embedding #0, joined back to the
    * label dimension — the reference's `ORDER BY val <-> q LIMIT k` path
    * (src/index/am_scan.rs) on the flat/exact engine. */
  def entry(spark: SparkSession): DataFrame = {
    withFns(spark)
    queries("q_topk_l2")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (graft.queries.CoreQueries.queries ++ graft.queries.TypeQueries.queries
      ++ graft.queries.AnnQueries.queries ++ graft.queries.DocQueries.queries
      ++ graft.queries.PipelineQueries.queries
      ++ graft.queries.EventQueries.queries
      ++ graft.queries.LifecycleQueries.queries
      ++ graft.queries.OperatorSqlQueries.queries)
      .map { case (k, f) =>
        k -> ((s: SparkSession, d: String) => f(withFns(s), d))
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++ graft.queries.TypeQueries.oracles ++
      graft.queries.AnnQueries.oracles ++ graft.queries.DocQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++ graft.queries.EventQueries.oracles ++
      graft.queries.LifecycleQueries.oracles ++
      graft.queries.OperatorSqlQueries.oracles
}
