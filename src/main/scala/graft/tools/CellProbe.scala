package graft.tools
import org.apache.spark.sql.functions._
object CellProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dims = 8
    val rnd = new scala.util.Random(7)
    val centers = Array(
      Array.tabulate(dims)(j => if (j == 0) 10f else 0f),
      Array.tabulate(dims)(j => if (j == 1) 10f else 0f),
      Array.tabulate(dims)(j => if (j == 2) 10f else 0f))
    val sizes = Seq(1200, 400, 400)
    val rows = sizes.zipWithIndex.flatMap { case (n, c) =>
      (0 until n).map { i =>
        (c * 10000L + i, centers(c).map(_ + 0.05f * rnd.nextGaussian().toFloat).toSeq)
      }
    }
    val df = rows.toDF("id", "vec")
    val model = graft.operators.IvfIndex.train(df, "vec", "l2", 3)
    val counts = df.withColumn("cl", graft.operators.IvfIndex.nearestCentroid(col("vec"), model))
      .groupBy("cl").count().collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    println(s"[cell] cells=${counts.mkString(",")}")
    println(s"[cell] centers=${model.centroids.map(_.take(3).mkString("(",",",")")).mkString(" ")}")
    spark.stop()
  }
}
