package graft.tools
import org.apache.spark.sql.SparkSession

/** Evidence probe for the HNSW resident-graph cache: times the same
  * persisted-graph search twice in one JVM (cold load vs cache hit). */
object ProfHnsw {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    val q = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("vec_id") === 0).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    val path = graft.queries.AnnQueries.hnsw(spark, d, 4)
    def run(): Double = {
      val t0 = System.nanoTime()
      graft.operators.Hnsw.searchIndex(spark, path, "vec_id", q, 100).count()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = run(); val warm = run(); val warm2 = run()
    println(f"[hnswprof] cold=$cold%.3f s warm=$warm%.3f s warm2=$warm2%.3f s ratio=${cold / warm}%.1f resident=${graft.operators.Hnsw.GraphCache.residentCount}")
    spark.stop()
  }
}
