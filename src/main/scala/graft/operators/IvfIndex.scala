package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * IVF (inverted-file) ANN index, the Spark-native analog of the
 * reference's IVF (crates/ivf/src/lib.rs): k-means centroids, vectors
 * bucketed by nearest centroid, searches probe the `nprobe` closest lists.
 *
 * Spark mapping (SURVEY §2.6): the index is a parquet table
 * **partitioned by list_id**; a query ranks the (small, broadcast-able)
 * centroid table, selects nprobe lists, and the `list_id IN (...)`
 * predicate becomes *partition pruning* at the scan — at 100 TB only
 * nprobe/nlist of the data is read. Rerank is exact distance on the
 * surviving candidates (quantized variant in [[Sq8]]).
 *
 * Cosine follows the reference's rewrite (src/index/am_options.rs:53-63,
 * 231-249): vectors are L2-normalized at build, searched by dot.
 *
 * Defaults mirror the reference: nlist=1000 (scaled down for small SF),
 * 10 k-means iterations, nprobe=10 (crates/base/src/index.rs:367-377,
 * 558-560).
 */
object IvfIndex {

  case class Model(metric: String, centroids: Array[Array[Float]]) {
    def rankLists(q: Array[Float]): Array[Int] = {
      val qq = if (metric == "cos") Kernels.normalize(q) else q
      centroids.zipWithIndex
        .map { case (c, i) => (Kernels.dist(metric, c, qq), i) }
        .sortBy(_._1).map(_._2)
    }
  }

  object Kernels {
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
      acc
    }
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    def dist(metric: String, a: Array[Float], b: Array[Float]): Double = metric match {
      case "l2" => l2sq(a, b)
      case _ => -dot(a, b) // dot & cos (normalized) search by negative dot
    }
    def normalize(a: Array[Float]): Array[Float] = {
      val n = math.sqrt(dot(a, a))
      a.map(x => (x / n).toFloat)
    }
  }

  /** Train centroids with MLlib KMeans (the reference's k_means crate
    * analog). Runs on a sample — at 100 TB you never k-means the full
    * data. */
  def train(df: DataFrame, vecCol: String, metric: String, nlist: Int,
      maxIter: Int = 10, seed: Long = 42L, sampleCap: Int = 200000): Model = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = df.sparkSession
    val n = df.count()
    val frac = math.min(1.0, sampleCap.toDouble / math.max(n, 1))
    val prep0 = df.select(col(vecCol).as("v"))
    val prep = if (metric == "cos") prep0.select(vectorNormalize(col("v")).as("v")) else prep0
    val sample = (if (frac < 1.0) prep.sample(frac, seed) else prep)
      .withColumn("features", array_to_vector(col("v").cast("array<double>")))
    val km = new KMeans().setK(nlist).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features")
    val model = km.fit(sample)
    Model(metric, model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Assign each row its nearest-centroid list id. */
  def assign(df: DataFrame, vecCol: String, model: Model): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model.centroids)
    val metric = model.metric
    val assignUdf = udf { (v: Array[Float]) =>
      val vv = if (metric == "cos") Kernels.normalize(v) else v
      val cents = bc.value
      var best = 0; var bestD = Double.MaxValue
      var i = 0
      while (i < cents.length) {
        val d = Kernels.dist(metric, cents(i), vv)
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    val withVec =
      if (metric == "cos") df.withColumn(vecCol, vectorNormalize(col(vecCol)))
      else df
    withVec.withColumn("list_id", assignUdf(col(vecCol)))
  }

  /** Build the index: assign + write parquet partitioned by list_id.
    * At scale this is the one-time shuffle that buys partition-pruned
    * searches forever after. */
  def build(df: DataFrame, vecCol: String, metric: String, nlist: Int,
      path: String, seed: Long = 42L): Model = {
    val model = train(df, vecCol, metric, nlist, seed = seed)
    assign(df, vecCol, model)
      .write.mode("overwrite").partitionBy("list_id").parquet(path)
    model
  }

  /** Search: rank centroids, read only the nprobe pruned partitions,
    * exact-rerank. Returns (idCol, dist) ordered ascending. */
  def search(spark: SparkSession, path: String, model: Model,
      idCol: String, vecCol: String, q: Array[Float], k: Int,
      nprobe: Int): DataFrame = {
    val probes = model.rankLists(q).take(nprobe)
    val qq = if (model.metric == "cos") Kernels.normalize(q) else q
    val qLit = typedLit(qq)
    val scan = spark.read.parquet(path)
      .filter(col("list_id").isin(probes.map(Integer.valueOf).toSeq: _*))
    val distCol = model.metric match {
      case "l2" => l2sq(col(vecCol), qLit)
      case "dot" => negdot(col(vecCol), qLit)
      case "cos" => negdot(col(vecCol), qLit) + lit(1.0) // reference +1.0 (am_options.rs:244-249)
    }
    scan.select(col(idCol), distCol.as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
