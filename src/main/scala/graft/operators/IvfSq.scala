package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import graft.index.IndexCatalog
import graft.index.IndexCatalog.Manifest

/**
 * IVF × SQ8 composition with residual encoding — the scalar-quantizer
 * sibling of [[IvfPq]] (the reference composes {Flat,Ivf,Hnsw} ×
 * {Trivial,SQ,PQ,RaBitQ} and encodes IVF residuals,
 * crates/ivf/src/lib.rs:172-188): residuals `v - centroid[list]` are
 * u8-coded against GLOBAL residual bounds (one VecMinMax aggregate —
 * residuals are centered, so one bound set fits all lists), and searches
 * score codes against the per-probed-list residual query via a broadcast
 * join on list_id.
 *
 * Same 100 TB shape as IvfPq: pruned partitions, code-column-only coarse
 * scan (dims bytes/row vs 4·dims raw), id-pushdown exact rerank.
 */
object IvfSq {

  case class Model(coarse: IvfIndex.Model, mins: Array[Float],
      widths: Array[Float])

  def ensure(spark: SparkSession, name: String, df: => DataFrame,
      source: String, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L): (Model, String) = {
    val mf = IndexCatalog.ensure(spark, name, source,
        requires = Map("kind2" -> "ivfsq8", "nlist" -> nlist.toString))(
      buildInto(df, source, idCol, vecCol, nlist, seed))
    val model = Model(IvfIndex.Model("l2", mf.centroids),
      mf.floats("mins"), mf.floats("widths"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  /** REINDEX: rebuild into a fresh generation dir with one atomic
    * pointer flip — the vacuum path for SQL-created
    * `[indexing.ivf.quantization.scalar]` artifacts. */
  def reindex(spark: SparkSession, name: String, df: => DataFrame,
      source: String, idCol: String, vecCol: String, nlist: Int,
      seed: Long = 42L): (Model, String) = {
    val mf = IndexCatalog.reindex(spark, name)(
      buildInto(df, source, idCol, vecCol, nlist, seed))
    val model = Model(IvfIndex.Model("l2", mf.centroids),
      mf.floats("mins"), mf.floats("widths"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  private def buildInto(df: => DataFrame, source: String, idCol: String,
      vecCol: String, nlist: Int, seed: Long)(dataDir: String): Manifest = {
    val nn = df.filter(col(vecCol).isNotNull &&
      graft.functions.vectorIsFinite(col(vecCol)))
    val coarse = IvfIndex.train(nn, vecCol, "l2", nlist, seed = seed)
    val assigned = nn
      .withColumn("list_id", IvfIndex.nearestCentroid(col(vecCol), coarse))
      .withColumn("resid", IvfPq.residual(col(vecCol), coarse, col("list_id")))
    val (mins, widths) = Sq8.train(assigned.select(col("resid")), "resid")
    assigned
      .select(col(idCol), col(vecCol),
        Sq8.encode(col("resid"), mins, widths).as("codes"), col("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(dataDir)
    Manifest("ivfsq8", source, "l2",
      Map("nlist" -> nlist.toString, "bits" -> "8", "kind2" -> "ivfsq8"),
      centroids = coarse.centroids,
      floats = Map("mins" -> mins, "widths" -> widths))
  }

  /** Search: pruned partitions, codes scored against the per-list
    * residual query (broadcast join), windowed exact rerank. window<=0 =
    * no decode, exact distances on every probed row (oracle-twin mode). */
  def search(spark: SparkSession, path: String, model: Model, idCol: String,
      vecCol: String, q: Array[Float], k: Int, nprobe: Int,
      window: Int = 4): DataFrame = {
    import graft.functions.l2sq
    import spark.implicits._
    val probes = model.coarse.rankLists(q).take(nprobe)
    val scan = IvfIndex.prunedScan(spark, path, model.coarse, q, nprobe)
    if (window <= 0)
      return scan.select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col(idCol)).limit(k)
    val dims = q.length
    val rqDf = probes.map { l =>
      val c = model.coarse.centroids(l)
      (l, Array.tabulate(dims)(i => q(i) - c(i)))
    }.toSeq.toDF("list_id", "rq")
    val w = math.min(k.toLong * window, Int.MaxValue.toLong).toInt
    val candidates = scan.select(col(idCol), col("list_id"), col("codes"))
      .join(broadcast(rqDf), "list_id")
      .select(col(idCol),
        Shims.column(Sq8.L2Approx(Shims.expression(col("codes")),
          Shims.expression(col("rq")),
          Shims.expression(typedLit(model.mins)),
          Shims.expression(typedLit(model.widths)))).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol)).limit(w)
    val indexed = scan.select(col(idCol), col(vecCol))
    Rerank.fetchByIds(indexed, idCol, vecCol, candidates)
      .select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
