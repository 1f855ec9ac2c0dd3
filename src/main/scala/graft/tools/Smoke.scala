package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives the driver contract end-to-end: entry() smoke + one SQL-surface
  * probe (dims mismatch must error like the reference). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[smoke]   $r"))
    graft.functions.registerAll(spark)
    try {
      spark.sql("SELECT l2sq_distance(array(1.0f,2.0f), array(1.0f,2.0f,3.0f))").collect()
      println("[smoke] dims-mismatch DID NOT error (BAD)")
    } catch {
      case e: Throwable =>
        val root = Option(e.getCause).getOrElse(e)
        println(s"[smoke] dims-mismatch errored as expected: ${root.getMessage.linesIterator.next()}")
    }
    spark.stop()
  }
}
