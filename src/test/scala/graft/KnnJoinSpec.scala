package graft

import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, KnnJoin, KnnJoinKernels}
import org.apache.spark.sql.catalyst.util.GenericArrayData

class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ivf(d: String) =
    graft.queries.AnnQueries.ivf(spark, d, "l2")

  test("exact knn join equals the brute-force cross product") {
    val (m, path) = ivf(sf0001)
    val queries = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") % 25 === 0)
    val got = KnnJoin.join(spark, queries, "vec_id", "embedding", path, m,
      "vec_id", "embedding", k = 5, nprobe = m.nlist)
      .select("qid", "vec_id", "rn").as[(Long, Long, Int)].collect().toSet

    import org.apache.spark.sql.expressions.Window
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist"), col("cid"))
    val want = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .crossJoin(corpus)
      .select(col("qid"), col("cid"),
        graft.functions.l2sq(col("cv"), col("qv")).as("dist"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("qid", "cid", "rn").as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("probe kernel reproduces Model.rankLists ordering (radii and raw)") {
    val rnd = new scala.util.Random(7)
    val dims = 16
    val centroids = Array.fill(12)(Array.fill(dims)(rnd.nextFloat()))
    val radii = Array.fill(12)(rnd.nextFloat() * 2f)
    for (metric <- Seq("l2", "cos", "dot"); useRadii <- Seq(true, false)) {
      val m = IvfIndex.Model(metric, centroids, if (useRadii) radii else null)
      for (_ <- 1 to 20) {
        val q0 = Array.fill(dims)(rnd.nextFloat() * 2f - 1f)
        val q = if (metric == "cos") IvfIndex.Kernels.normalize(q0) else q0
        val want = m.rankLists(q0).take(5).toSeq
        val got = KnnJoinKernels.probeLists(
          new GenericArrayData(q.map(x => x: Any)),
          new GenericArrayData(centroids.flatten.map(x => x: Any)),
          new GenericArrayData(
            (if (useRadii) radii else Array.empty[Float]).map(x => x: Any)),
          5, KnnJoinKernels.metricCode(metric)).toIntArray().toSeq
        assert(got == want, s"metric=$metric radii=$useRadii")
      }
    }
  }

  test("null and non-finite query vectors produce no output rows") {
    val (m, path) = ivf(sf0001)
    val queries = Seq(
      (900L, Array(0.1f, 0.2f) ++ Array.fill(62)(0.0f)),
      (901L, null.asInstanceOf[Array[Float]]),
      (902L, Array(Float.NaN) ++ Array.fill(63)(0.0f))
    ).toDF("vec_id", "embedding")
    val out = KnnJoin.join(spark, queries, "vec_id", "embedding", path, m,
      "vec_id", "embedding", k = 3, nprobe = m.nlist)
    val qids = out.select("qid").distinct().as[Long].collect().toSet
    assert(qids == Set(900L))
  }

  test("recall@10 at default nprobe stays useful on the driver fixture") {
    val (m, path) = ivf(sf0001)
    val queries = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
    def ids(np: Int) = KnnJoin.join(spark, queries, "vec_id", "embedding",
      path, m, "vec_id", "embedding", k = 10, nprobe = np)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val exact = ids(m.nlist)
    val approx = ids(10)
    val recall = approx.intersect(exact).size.toDouble / exact.size
    // near-random fixture at nprobe 10 / nlist 16: the probed-fraction
    // regime (RECALL.json note) — the clustered number lives in RECALL.json
    assert(recall >= 0.8, s"recall@10 = $recall")
  }
}
