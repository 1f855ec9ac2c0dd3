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

  /** The approximate/exact twin map, machine-readable (round 15): every
    * `queries` entry WITHOUT an `oracleSql` entry is approximate by the
    * repo's contract and maps here to (its exact-mode twin — a query
    * that IS oracle-gated and exercises the same artifact/kernel in
    * exact mode — and its RECALL.json family, where the approximate
    * path's quality is measured). `graft.tools.Twins` emits this as
    * TWINS.json; TwinsSpec fails the build on any uncovered addition,
    * so a new approximate query cannot ship without naming its twin. */
  def twins: Map[String, (String, String)] = Map(
    "q_bvec_ann_topk" -> ("q_bvec_ann_exact", "bvec_hamming_ivf"),
    "q_bvec_batch" -> ("q_bvec_batch_exact", "bvec_hamming_ivf"),
    "q_bvec_jaccard_ann_topk" ->
      ("q_bvec_jaccard_ann_exact", "bvec_jaccard_ivf"),
    "q_bvec_jaccard_hnsw_topk" ->
      ("q_bvec_jaccard_hnsw_exact", "bvec_jaccard_hnsw"),
    "q_bvec_knn_join" -> ("q_bvec_knn_join_exact", "bvec_knn_join"),
    "q_hnsw_batch" -> ("q_hnsw_batch_exact", "hnsw_l2"),
    "q_hnsw_filtered_topk" -> ("q_hnsw_filtered_exact", "hnsw_l2"),
    "q_hnsw_knn_join" -> ("q_hnsw_knn_join_exact", "hnsw_knn_join"),
    "q_hnsw_topk_cos" -> ("q_hnsw_exact_cos", "hnsw_cos"),
    "q_hnsw_topk_l2" -> ("q_hnsw_exact_l2", "hnsw_l2"),
    "q_hnswpq_topk_l2" -> ("q_hnswpq_exact_l2", "hnsw_pq"),
    "q_hnswrq_topk_l2" -> ("q_hnswrq_exact_l2", "hnsw_rabitq"),
    "q_hnswsq8_topk_l2" -> ("q_hnswsq8_exact_l2", "hnsw_sq8"),
    "q_incrhnsw_topk" -> ("q_incrhnsw_exact", "incr_hnsw"),
    "q_ivf_batch" -> ("q_ivf_batch_exact", "ivf_l2"),
    "q_ivf_topk_cos" -> ("q_ivf_exact_cos", "ivf_cos"),
    "q_ivf_topk_l2" -> ("q_ivf_exact_l2", "ivf_l2"),
    "q_ivfincr_topk" -> ("q_ivfincr_exact", "incr_ivf"),
    "q_ivfpq_topk_l2" -> ("q_ivfpq_exact_l2", "ivf_pq"),
    "q_ivfsq8_topk_l2" -> ("q_ivfsq8_exact_l2", "ivf_sq8"),
    "q_knn_join" -> ("q_knn_join_exact", "knn_join"),
    "q_maxsim_hnsw_join" -> ("q_maxsim_join_exact", "maxsim_hnsw_join"),
    "q_maxsim_ivf" -> ("q_maxsim_topk", "maxsim_ivf"),
    "q_maxsim_join" -> ("q_maxsim_join_exact", "maxsim_join"),
    "q_partitioned_knn_join" ->
      ("q_partitioned_knn_join_exact", "partitioned_knn_join"),
    "q_pq4_topk_l2" -> ("q_pq4_exact_l2", "pq4_fastscan"),
    "q_pq_topk_l2" -> ("q_pq_exact_l2", "pq"),
    "q_pqincr_topk" -> ("q_pqincr_exact", "incr_pq"),
    "q_rabitq_bounded_l2" -> ("q_rabitq_exact_l2", "rabitq"),
    "q_rabitq_topk_l2" -> ("q_rabitq_exact_l2", "rabitq"),
    "q_rq4_topk_l2" -> ("q_rq4_exact_l2", "rq4_fastscan"),
    "q_rqincr_topk" -> ("q_rqincr_exact", "incr_rabitq"),
    "q_sparse_topk_pruned" -> ("q_sparse_topk", "sparse_inverted"),
    "q_sq8_topk_l2" -> ("q_sq8_exact_l2", "sq8"),
    "q_sq8incr_topk" -> ("q_sq8incr_exact", "incr_sq8"),
    "q_svec_ann_topk" -> ("q_svec_ann_exact", "svec_l2_ivf"),
    "q_svec_batch" -> ("q_svec_batch_exact", "svec_l2_ivf"),
    "q_svec_hnsw_knn_join" ->
      ("q_svec_hnsw_knn_join_exact", "svec_hnsw_knn_join"),
    "q_svec_hnsw_topk" -> ("q_svec_hnsw_exact", "svec_l2_hnsw"),
    "q_svec_knn_join" -> ("q_svec_knn_join_exact", "svec_knn_join"),
    "q_vecf16_ann_cos_topk" -> ("q_vecf16_ann_cos_exact", "vecf16_cos_ivf"),
    "q_vecf16_ann_topk" -> ("q_vecf16_ann_exact", "vecf16_l2_ivf"),
    "q_vecf16_batch" -> ("q_vecf16_batch_exact", "vecf16_l2_ivf"),
    "q_vecf16_knn_join" -> ("q_vecf16_knn_join_exact", "f16_knn_join"))
}
