package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm-timing harness for individual SparkEntry queries: runs each
  * named query twice and reports the SECOND run, separating steady-state
  * cost from the one-time planning/codegen/JIT the full Bench pays per
  * query. (Measured round 4: q_dedup_cluster 6.0 s cold vs 2.8 s warm —
  * chase plan shape with this, not the bench's cold numbers.)
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.TimeQ <query>..."
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000") // Bench parity
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      graft.SparkEntry.queries(name)(spark, sfDir).count() // warm-up run
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[timeq] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
