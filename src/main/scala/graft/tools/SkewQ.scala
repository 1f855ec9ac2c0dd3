package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-stage task-time spread reporter (round 18, guide §2.5 skew
  * evidence): runs each named SparkEntry query once warm, then once
  * instrumented, and prints per-stage task count + min/median/max task
  * duration and max/median ratio. A max/median above ~5x flags a skewed
  * stage worth salting; ~1-2x means the stage is balanced and the cost
  * is genuine volume (or scheduling floor at tiny sizes).
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.SkewQ <query>..."
  */
object SkewQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        stages.computeIfAbsent(e.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(e.taskInfo.duration)
      }
    })
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm-up
      stages.clear()
      fn(spark, sfDir).count()
      Thread.sleep(300) // listener drain
      println(s"[skewq] $name")
      import scala.jdk.CollectionConverters._
      for ((sid, q) <- stages.asScala.toSeq.sortBy(_._1)) {
        val d = q.asScala.toArray.sorted
        if (d.nonEmpty) {
          val med = d(d.length / 2).max(1L)
          println(f"[skewq]   stage $sid%4d tasks=${d.length}%4d " +
            f"min=${d.head}%5d ms med=$med%5d ms max=${d.last}%6d ms " +
            f"max/med=${d.last.toDouble / med}%.1f")
        }
      }
    }
    spark.stop()
  }
}
