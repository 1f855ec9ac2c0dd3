package graft.tools

import org.apache.spark.sql.SparkSession

/** Print a named SparkEntry query's schema and rows — the oracle-authoring
  * companion to [[TimeQ]] (which times but never shows results).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.ShowQ <query>..."
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(s"=== $name ===")
      df.printSchema()
      df.show(200, truncate = false)
    }
    spark.stop()
  }
}
