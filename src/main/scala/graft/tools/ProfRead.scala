package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-profile of the per-call spark.read.parquet overhead (listing +
  * footer schema read) that every `Tables.t` call pays. */
object ProfRead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (tbl <- Seq("embeddings", "lineitem", "documents")) {
      val path = s"$sfDir/$tbl.parquet"
      if (new java.io.File(path).exists()) {
        spark.read.parquet(path) // warm
        val n = 10
        val t0 = System.nanoTime()
        var i = 0
        while (i < n) { spark.read.parquet(path); i += 1 }
        val readMs = (System.nanoTime() - t0) / 1e6 / n
        // and the cached path (schema known, fresh frame per call)
        val t1 = System.nanoTime()
        i = 0
        while (i < n) { graft.ParquetCache.read(spark, path); i += 1 }
        val cachedMs = (System.nanoTime() - t1) / 1e6 / n
        println(f"[profread] $tbl raw=$readMs%.1f ms/call cached=$cachedMs%.1f ms/call")
      }
    }
    spark.stop()
  }
}
