package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import graft.index.IndexCatalog
import graft.index.IndexCatalog.Manifest

/**
 * IVF × PQ composition with RESIDUAL encoding — the reference's workhorse
 * configuration for large corpora (crates/ivf/src/lib.rs:172-188: each
 * vector is PQ-coded as `v - centroid[list]`, and searches ADC against
 * the per-list residual query `q - centroid[list]`).
 *
 * Why residuals: after coarse quantization the residual cloud is centered
 * and much lower-variance than the raw vectors, so the same PQ budget
 * (m bytes/row) codes it with far less error.
 *
 * Spark shape at 100 TB:
 *  - artifact = parquet partitioned by list_id; the coarse scan reads the
 *    m-byte `codes` column of nprobe/nlist partitions only;
 *  - the per-probed-list LUTs are a tiny driver-built table broadcast
 *    into an equality join on list_id (no shuffle of the big side);
 *  - rerank re-fetches k·window candidates by id-pushdown, exact l2.
 * window<=0 probes-then-exact-scans (no ADC): at nprobe=nlist that is
 * provably the flat scan, which is what the oracle twin runs.
 */
object IvfPq {

  case class Model(coarse: IvfIndex.Model, pq: Pq.Model)

  /** v - centroid[listId] over a flattened [nlist*dims] centroid array. */
  def residualKernel(v: ArrayData, flat: ArrayData, listId: Int): ArrayData = {
    val dims = v.numElements()
    val out = new Array[Float](dims)
    val off = listId * dims
    var i = 0
    while (i < dims) { out(i) = v.getFloat(i) - flat.getFloat(off + i); i += 1 }
    new GenericArrayData(out)
  }

  case class ResidualVec(vec: Expression, flatCentroids: Expression,
      listId: Expression) extends TernaryExpression {
    override def first = vec; override def second = flatCentroids
    override def third = listId
    override def nullIntolerant: Boolean = true
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def nullSafeEval(v: Any, f: Any, l: Any): Any =
      residualKernel(v.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData],
        l.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, f, l) =>
        s"${ev.value} = graft.operators.IvfPq.residualKernel($v, $f, $l);")
    override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
      copy(vec = a, flatCentroids = b, listId = c)
    override def prettyName = "ivf_residual"
  }

  def residual(vec: Column, model: IvfIndex.Model, listId: Column): Column =
    Shims.column(ResidualVec(Shims.expression(vec),
      Shims.expression(typedLit(model.centroids.flatten)),
      Shims.expression(listId)))

  /** CREATE INDEX: coarse k-means -> assign -> PQ-train on residuals ->
    * write (id, vec, residual codes) partitioned by list_id. */
  def ensure(spark: SparkSession, name: String, df: => DataFrame,
      source: String, idCol: String, vecCol: String, nlist: Int,
      m: Int = 8, ks: Int = 16, seed: Long = 42L): (Model, String) = {
    val mf = IndexCatalog.ensure(spark, name, source,
        requires = Map("kind2" -> "ivfpq", "nlist" -> nlist.toString,
          "m" -> m.toString, "ks" -> ks.toString))(
      buildInto(df, source, idCol, vecCol, nlist, m, ks, seed))
    val model = Model(
      IvfIndex.Model("l2", mf.centroids),
      Pq.Model(mf.params("dims").toInt, mf.params("m").toInt,
        mf.params("ks").toInt, mf.floats("codebook")))
    (model, IndexCatalog.dataDir(spark, name))
  }

  /** REINDEX: rebuild into a fresh generation dir with one atomic
    * pointer flip — the vacuum path for SQL-created
    * `[indexing.ivf.quantization.product]` artifacts. */
  def reindex(spark: SparkSession, name: String, df: => DataFrame,
      source: String, idCol: String, vecCol: String, nlist: Int,
      m: Int = 8, ks: Int = 16, seed: Long = 42L): (Model, String) = {
    val mf = IndexCatalog.reindex(spark, name)(
      buildInto(df, source, idCol, vecCol, nlist, m, ks, seed))
    val model = Model(
      IvfIndex.Model("l2", mf.centroids),
      Pq.Model(mf.params("dims").toInt, mf.params("m").toInt,
        mf.params("ks").toInt, mf.floats("codebook")))
    (model, IndexCatalog.dataDir(spark, name))
  }

  private def buildInto(df: => DataFrame, source: String, idCol: String,
      vecCol: String, nlist: Int, m: Int, ks: Int, seed: Long)
      (dataDir: String): Manifest = {
    val nn = df.filter(col(vecCol).isNotNull &&
      graft.functions.vectorIsFinite(col(vecCol)))
    val coarse = IvfIndex.train(nn, vecCol, "l2", nlist, seed = seed)
    val assigned = nn
      .withColumn("list_id", IvfIndex.nearestCentroid(col(vecCol), coarse))
      .withColumn("resid", residual(col(vecCol), coarse, col("list_id")))
    val pqModel = Pq.train(assigned.select(col("resid")), "resid", m, ks,
      seed = seed)
    assigned
      .select(col(idCol), col(vecCol),
        Pq.encode(col("resid"), pqModel).as("codes"), col("list_id"))
      .repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(dataDir)
    Manifest("ivfpq", source, "l2",
      Map("nlist" -> nlist.toString, "m" -> m.toString, "ks" -> ks.toString,
        "dims" -> pqModel.dims.toString, "kind2" -> "ivfpq"),
      centroids = coarse.centroids,
      floats = Map("codebook" -> pqModel.codebook))
  }

  /** Search: rank centroids, scan the pruned partitions' code column with
    * per-list residual-query LUTs (broadcast join on list_id), windowed
    * exact rerank via id-pushdown. window<=0 = no ADC, exact distances on
    * every probed row (the oracle-twin mode). */
  def search(spark: SparkSession, path: String, model: Model, idCol: String,
      vecCol: String, q: Array[Float], k: Int, nprobe: Int,
      window: Int = 8): DataFrame = {
    import graft.functions.l2sq
    import spark.implicits._
    val probes = model.coarse.rankLists(q).take(nprobe)
    val scan = IvfIndex.prunedScan(spark, path, model.coarse, q, nprobe)
    if (window <= 0)
      return scan.select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
        .orderBy(col("dist"), col(idCol)).limit(k)
    // per-probed-list LUT of the residual query — tiny (nprobe × m × ks
    // floats), broadcast
    val dims = model.pq.dims
    val luts = probes.map { l =>
      val c = model.coarse.centroids(l)
      val rq = Array.tabulate(dims)(i => q(i) - c(i))
      (l, model.pq.lut(rq))
    }.toSeq.toDF("list_id", "lut")
    val w = math.min(k.toLong * window, Int.MaxValue.toLong).toInt
    val candidates = scan.select(col(idCol), col("list_id"), col("codes"))
      .join(broadcast(luts), "list_id")
      .select(col(idCol),
        Shims.column(Pq.AdcScore(Shims.expression(col("codes")),
          Shims.expression(col("lut")), model.pq.ks)).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol)).limit(w)
    val indexed = scan.select(col(idCol), col(vecCol))
    Rerank.fetchByIds(indexed, idCol, vecCol, candidates)
      .select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
