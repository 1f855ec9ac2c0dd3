package graft.tools

import org.apache.spark.sql.SparkSession

/** Rebuild (if stale) and print the dense-IVF probe-calibration rows
  * for a data dir — run after any [[graft.operators.IvfIndex.CalGen]]
  * bump to read off the new `probe_hint` values that the q_index_stat
  * VALUES oracle (DocQueries) must mirror.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.tools.CalHint"
  */
object CalHint {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.AnnQueries
    AnnQueries.ivf(spark, sfDir, "l2")
    AnnQueries.ivf(spark, sfDir, "cos")
    AnnQueries.ivf(spark, sfDir, "dot")
    AnnQueries.ivfPartial(spark, sfDir)
    AnnQueries.bvecAnn(spark, sfDir)
    AnnQueries.f16Ann(spark, sfDir)
    AnnQueries.svecAnn(spark, sfDir)
    AnnQueries.svecRange(spark, sfDir)
    val san = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    for (n <- Seq(s"ivf_l2_$san", s"ivf_cos_$san", s"ivf_dot_$san",
        s"ivf_l2_part7_$san", s"bvecann_$san", s"f16ann_$san",
        s"svecann_$san", s"svecrange_$san");
        m <- graft.index.IndexCatalog.load(spark, n))
      println(s"[calhint] $n probe_hint=${m.params.getOrElse("probe_hint", "?")} " +
        s"probe_cal=${m.params.getOrElse("probe_cal", "?")}")
    spark.stop()
  }
}
