package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HNSW × PQ composition — the `HnswPq` sibling of [[HnswSq]]
 * (crates/indexing/src/sealed.rs:25-29): the persisted graph stores
 * m-BYTE PQ codes per node (dims×4 bytes → m bytes, the deepest resident
 * compression of the composition matrix); traversal scores through the
 * per-query m×ks ADC lookup table, and the ef frontier is exact-reranked
 * from the source table. Graph construction runs on raw f32 (exact
 * edges), codes are produced at snapshot — same build contract as
 * [[HnswSq]], and the artifact reuses the coded-graph layout
 * ([[HnswSq.SqGraph]] with dims = m code bytes, LUT stride = ks).
 */
object HnswPq {

  /** Plain-Scala PQ encoder (the executor-side snapshot path — the
    * Column-based [[Pq.Encode]] serves table builds). */
  private def encodeRow(v: Array[Float], off: Int, model: Pq.Model,
      out: Array[Byte], outOff: Int): Unit = {
    val subDim = model.subDim
    var s = 0
    while (s < model.m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < model.ks) {
        var d = 0.0; var i = 0
        val cb = (s * model.ks + c) * subDim
        while (i < subDim) {
          val diff = v(off + s * subDim + i).toDouble - model.codebook(cb + i)
          d += diff * diff; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(outOff + s) = best.toByte
      s += 1
    }
  }

  private def fromFlat(g: Hnsw.FlatGraph, model: Pq.Model): HnswSq.SqGraph = {
    val n = g.ids.length
    val codes = new Array[Byte](n * model.m)
    var i = 0
    while (i < n) {
      encodeRow(g.vecs, i * g.dims, model, codes, i * model.m)
      i += 1
    }
    new HnswSq.SqGraph(model.m, g.ids, codes, g.levels, g.listStart,
      g.nbrOff, g.nbrs, g.entry, g.maxLevel)
  }

  /** One-time CREATE INDEX job: train the PQ codebook over the table,
    * build raw-f32 graphs per partition, snapshot to m-byte coded form,
    * persist `pqgraph-<pid>.bin`. Returns (model, dataDir). */
  def ensure(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 8, ks: Int = 16, hm: Int = 12,
      efConstruction: Int = 300): (Pq.Model, String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.ensure(spark, name, source,
        requires = Map("format" -> "pqflatbin3", "m" -> m.toString,
          "ks" -> ks.toString, "hnsw_m" -> hm.toString,
          "ef_construction" -> efConstruction.toString,
          "parts" -> parts.toString) ++
          (if (parts > 1) Map("routing" -> Hnsw.RoutingGen)
           else Map.empty))(
      buildInto(spark, df, source, idCol, vecCol, parts, m, ks, hm,
        efConstruction))
    val model = Pq.Model(mf.params("dims").toInt, mf.params("m").toInt,
      mf.params("ks").toInt, mf.floats("codebook"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  /** REINDEX: rebuild into a fresh generation dir with one atomic
    * pointer flip — the vacuum path for SQL-created
    * `[indexing.hnsw.quantization.product]` artifacts. */
  def reindex(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 8, ks: Int = 16, hm: Int = 12,
      efConstruction: Int = 300): (Pq.Model, String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.reindex(spark, name)(
      buildInto(spark, df, source, idCol, vecCol, parts, m, ks, hm,
        efConstruction))
    val model = Pq.Model(mf.params("dims").toInt, mf.params("m").toInt,
      mf.params("ks").toInt, mf.floats("codebook"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  private def buildInto(spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int, ks: Int, hm: Int, efConstruction: Int)
      (dataDir: String): graft.index.IndexCatalog.Manifest = {
    import graft.index.IndexCatalog
    import spark.implicits._
    val nonNull = df.filter(col(vecCol).isNotNull &&
      graft.functions.vectorIsFinite(col(vecCol)))
    val model = Pq.train(nonNull, vecCol, m, ks)
    val rows0 = nonNull.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    // round 9: shared SPATIAL build + routing sidecar (pqflatbin3 —
    // the format-bump invariant, build partitioning changed)
    val bModel = spark.sparkContext.broadcast(model)
    val (nFiles, routingParams) = Hnsw.buildGraphFiles(spark, rows0,
      parts, dataDir,
      "pqgraph", hm, efConstruction, new GraphEncode {
        def write(flat: Hnsw.FlatGraph, out: java.io.DataOutputStream): Unit =
          HnswSq.SqGraph.write(out, fromFlat(flat, bModel.value))
      })
    IndexCatalog.Manifest("hnsw_pq", source, "l2",
      Map("m" -> m.toString, "ks" -> ks.toString,
        "hnsw_m" -> hm.toString, "dims" -> model.dims.toString,
        "ef_construction" -> efConstruction.toString,
        "parts" -> parts.toString, "files" -> nFiles.toString,
        "format" -> "pqflatbin3") ++ routingParams,
      floats = Map("codebook" -> model.codebook))
  }

  /** Two-stage search: ADC-LUT graph frontier per resident coded graph,
    * exact rerank of the union frontier from the source table. exact=true
    * follows the window<=0 contract (skip graphs, score every row). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      indexed: DataFrame, idCol: String, vecCol: String, q: Array[Float],
      k: Int, model: Pq.Model, efSearch: Int = 100,
      window: Int = 8, exact: Boolean = false,
      probeGraphs: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.functions.l2sq
    val coarse =
      if (exact) indexed.select(col(idCol), col(vecCol))
      else {
        val dirPath = new org.apache.hadoop.fs.Path(path)
        val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val allFiles = fs.globStatus(new org.apache.hadoop.fs.Path(path, "pqgraph-*.bin"))
          .map(_.getPath.toString).sorted.toSeq
        if (allFiles.isEmpty)
          return spark.emptyDataset[(Long, Double)].toDF(idCol, "dist")
        // routed coded search (round 9): sidecar l2 bounds on the raw query
        val files = Hnsw.routeFiles(spark, path, allFiles, q, probeGraphs)
        // per-query ADC LUT (m×ks doubles), broadcast once for the batch
        // of graph tasks
        val lut = model.lut(q).map(_.toDouble)
        val bLut = spark.sparkContext.broadcast(lut)
        val ks = model.ks
        // frontier breadth follows the flat coded scan's rerank-window
        // convention (k·window candidates before exact rerank): PQ's ADC
        // estimate error is large enough that an ef == k beam misses true
        // neighbors the rerank could have recovered (measured recall@100
        // 0.66 at ef=100 vs >=0.95 at k·window)
        val ef = math.max(efSearch, k * math.max(window, 1))
        val hconf = Hnsw.confEntries(spark)
        val frontier = spark.sparkContext
          .parallelize(files, Hnsw.fileSlices(spark, files.length))
          .mapPartitions { it =>
            val conf = Hnsw.mkConf(hconf)
            it.flatMap { f =>
              val g = HnswSq.SqGraphCache.get(f, conf)
              g.searchFrontierLut(bLut.value, ks, ef)
                .iterator.map { case (d, id) => (id, d) }
            }
          }.toDF(idCol, "approx_dist")
        Rerank.fetchByIds(indexed, idCol, vecCol, frontier)
      }
    coarse.select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
