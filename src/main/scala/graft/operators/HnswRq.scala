package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HNSW × RaBitQ composition — the `HnswRq` member of the reference's
 * sealed composition matrix (crates/indexing/src/sealed.rs:25-29),
 * completing {Sq, Pq, Rq} alongside [[HnswSq]] and [[HnswPq]]: the
 * persisted graph stores D sign BITS plus two f32 correction factors per
 * node (D/8 + 8 bytes vs 4D raw — the deepest compression of the
 * matrix), traversal scores the RaBitQ distance ESTIMATOR
 * ([[Rabitq.scoreKernel]] semantics), and the ef frontier is
 * exact-reranked from the source table.
 *
 * The sign-bit dot product runs through a per-query BYTE lookup table
 * (256 entries per code byte: the sum of ±rq over that byte's 8
 * dimensions), so traversal does D/8 table adds per candidate plus the
 * per-node correction arithmetic — no per-dimension float math.
 *
 * Exact mode follows the Sq8 window<=0 contract (skip graphs, score all
 * rows — codes are lossy), so the twin carries the flat oracle.
 */
object HnswRq {

  /** Columnar RaBitQ-coded graph: CSR adjacency + packed sign bits +
    * per-node (norm, cos) corrections. */
  final class RqGraph(
      val dims: Int, val ids: Array[Long], val bits: Array[Byte],
      val norms: Array[Float], val cosvs: Array[Float],
      val levels: Array[Int], val listStart: Array[Int],
      val nbrOff: Array[Int], val nbrs: Array[Int],
      val entry: Int, val maxLevel: Int) extends Serializable {

    def size: Int = ids.length
    def bytesPerRow: Int = (dims + 7) / 8

    /** Per-query byte LUT: lut(b*256 + byte) = Σ_{j<8} (bit_j ? +rq(8b+j)
      * : -rq(8b+j)) — the sign-bit dot product becomes D/8 table adds. */
    def buildLut(rq: Array[Double]): Array[Double] = {
      val bpr = bytesPerRow
      val lut = new Array[Double](bpr * 256)
      var b = 0
      while (b < bpr) {
        var v = 0
        while (v < 256) {
          var acc = 0.0; var j = 0
          while (j < 8) {
            val dim = b * 8 + j
            if (dim < dims) {
              val s = if (((v >>> j) & 1) == 1) 1.0 else -1.0
              acc += s * rq(dim)
            }
            j += 1
          }
          lut(b * 256 + v) = acc
          v += 1
        }
        b += 1
      }
      lut
    }

    @inline private def distTo(lut: Array[Double], qNorm: Double, node: Int): Double = {
      val bpr = bytesPerRow
      val off = node * bpr
      var dot = 0.0; var b = 0
      while (b < bpr) { dot += lut(b * 256 + (bits(off + b) & 0xff)); b += 1 }
      val norm = norms(node).toDouble
      if (norm == 0.0 || qNorm == 0.0) return norm * norm + qNorm * qNorm
      val c = math.max(cosvs(node).toDouble, 1e-9)
      val est = dot / (math.sqrt(dims.toDouble) * qNorm) / c
      norm * norm + qNorm * qNorm - 2.0 * norm * qNorm * est
    }

    private def greedyStep(lut: Array[Double], qNorm: Double, start: Int,
        level: Int): Int = {
      var cur = start
      var curD = distTo(lut, qNorm, cur)
      var improved = true
      while (improved) {
        improved = false
        val li = listStart(cur) + level
        var j = nbrOff(li)
        val end = nbrOff(li + 1)
        while (j < end) {
          val n = nbrs(j)
          val d = distTo(lut, qNorm, n)
          if (d < curD) { curD = d; cur = n; improved = true }
          j += 1
        }
      }
      cur
    }

    private def searchLayer(lut: Array[Double], qNorm: Double, ep: Int,
        ef: Int, level: Int): IndexedSeq[(Double, Int)] = {
      val visited = mutable.BitSet(ep)
      val epD = distTo(lut, qNorm, ep)
      val cand = mutable.PriorityQueue((-epD, ep))(Ordering.by(_._1))
      val res = mutable.PriorityQueue((epD, ep))(Ordering.by(_._1))
      while (cand.nonEmpty) {
        val (ncd, c) = cand.dequeue()
        val cd = -ncd
        if (cd > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          val li = listStart(c) + level
          var j = nbrOff(li)
          val end = nbrOff(li + 1)
          while (j < end) {
            val n = nbrs(j)
            if (!visited.contains(n)) {
              visited += n
              val d = distTo(lut, qNorm, n)
              if (res.size < ef || d < res.head._1) {
                cand.enqueue((-d, n))
                res.enqueue((d, n))
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      res.dequeueAll.reverse.toIndexedSeq
    }

    /** The ef FRONTIER (estimated dist, id) ascending — callers rerank. */
    def searchFrontier(rq: Array[Double], qNorm: Double, ef: Int)
        : Seq[(Double, Long)] = {
      if (entry < 0 || ids.length == 0) return Nil
      val lut = buildLut(rq)
      var ep = entry
      var lc = maxLevel
      while (lc > 0) { ep = greedyStep(lut, qNorm, ep, lc); lc -= 1 }
      searchLayer(lut, qNorm, ep, ef, 0).map { case (d, n) => (d, ids(n)) }
    }
  }

  object RqGraph {
    private val Magic = 0x47525251 // "GRRQ"
    private val Version = 1

    /** Encode every node of a raw FlatGraph: sign bits of the rotated
      * residual + (norm, cos) corrections — [[Rabitq.encodeKernel]]
      * semantics over the flat vector matrix. */
    def fromFlat(g: Hnsw.FlatGraph, model: Rabitq.Model): RqGraph = {
      val n = g.ids.length
      val dims = g.dims
      val bpr = (dims + 7) / 8
      val bits = new Array[Byte](n * bpr)
      val norms = new Array[Float](n)
      val cosvs = new Array[Float](n)
      val r = new Array[Double](dims)
      var node = 0
      while (node < n) {
        val off = node * dims
        var norm2 = 0.0
        var i = 0
        while (i < dims) {
          r(i) = g.vecs(off + i).toDouble - model.centroid(i)
          norm2 += r(i) * r(i); i += 1
        }
        var dotSign = 0.0
        var row = 0
        while (row < dims) {
          var acc = 0.0; var j = 0; val ro = row * dims
          while (j < dims) { acc += model.rot(ro + j).toDouble * r(j); j += 1 }
          if (acc >= 0) {
            bits(node * bpr + (row >> 3)) =
              (bits(node * bpr + (row >> 3)) | (1 << (row & 7))).toByte
            dotSign += acc
          } else dotSign -= acc
          row += 1
        }
        val norm = math.sqrt(norm2)
        norms(node) = norm.toFloat
        cosvs(node) =
          (if (norm == 0.0) 1.0 else dotSign / (norm * math.sqrt(dims.toDouble))).toFloat
        node += 1
      }
      new RqGraph(dims, g.ids, bits, norms, cosvs, g.levels, g.listStart,
        g.nbrOff, g.nbrs, g.entry, g.maxLevel)
    }

    def write(out: java.io.DataOutputStream, g: RqGraph): Unit = {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeInt(g.dims); out.writeInt(g.ids.length)
      out.writeInt(g.entry); out.writeInt(g.maxLevel)
      var i = 0
      while (i < g.ids.length) { out.writeLong(g.ids(i)); i += 1 }
      out.write(g.bits)
      i = 0
      while (i < g.norms.length) { out.writeFloat(g.norms(i)); i += 1 }
      i = 0
      while (i < g.cosvs.length) { out.writeFloat(g.cosvs(i)); i += 1 }
      i = 0
      while (i < g.levels.length) { out.writeInt(g.levels(i)); i += 1 }
      out.writeInt(g.nbrOff.length)
      i = 0
      while (i < g.nbrOff.length) { out.writeInt(g.nbrOff(i)); i += 1 }
      out.writeInt(g.nbrs.length)
      i = 0
      while (i < g.nbrs.length) { out.writeInt(g.nbrs(i)); i += 1 }
    }

    def read(in: java.io.DataInputStream): RqGraph = {
      require(in.readInt() == Magic, "not a graft hnsw-rabitq artifact")
      require(in.readInt() == Version, "unsupported hnsw-rabitq artifact version")
      val dims = in.readInt(); val n = in.readInt()
      val entry = in.readInt(); val maxLevel = in.readInt()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = in.readLong(); i += 1 }
      val bits = new Array[Byte](n * ((dims + 7) / 8))
      in.readFully(bits)
      val norms = new Array[Float](n)
      i = 0
      while (i < n) { norms(i) = in.readFloat(); i += 1 }
      val cosvs = new Array[Float](n)
      i = 0
      while (i < n) { cosvs(i) = in.readFloat(); i += 1 }
      val levels = new Array[Int](n)
      i = 0
      while (i < n) { levels(i) = in.readInt(); i += 1 }
      val listStart = new Array[Int](n + 1)
      i = 0
      while (i < n) { listStart(i + 1) = listStart(i) + levels(i) + 1; i += 1 }
      val nOff = in.readInt()
      val nbrOff = new Array[Int](nOff)
      i = 0
      while (i < nOff) { nbrOff(i) = in.readInt(); i += 1 }
      val nN = in.readInt()
      val nbrs = new Array[Int](nN)
      i = 0
      while (i < nN) { nbrs(i) = in.readInt(); i += 1 }
      new RqGraph(dims, ids, bits, norms, cosvs, levels, listStart,
        nbrOff, nbrs, entry, maxLevel)
    }
  }

  /** Executor-local resident cache, byte-LRU under the shared
    * `spark.graft.hnsw.cacheBytes` budget (bit graphs are ~32× cheaper
    * per row than raw). */
  object RqGraphCache {
    private val DefaultBudget = 4L << 30
    @volatile private var budgetOverride: Long = -1L
    private[graft] def setBudgetForTest(b: Long): Unit = { budgetOverride = b }
    private def budgetBytes: Long = {
      if (budgetOverride > 0) return budgetOverride
      try {
        val env = org.apache.spark.SparkEnv.get
        if (env == null) DefaultBudget
        else env.conf.getLong("spark.graft.hnsw.cacheBytes", DefaultBudget)
      } catch { case _: Throwable => DefaultBudget }
    }

    private[graft] def estBytes(g: RqGraph): Long =
      g.ids.length.toLong * 8 + g.bits.length.toLong +
        g.norms.length.toLong * 4 + g.cosvs.length.toLong * 4 +
        g.levels.length.toLong * 4 + g.listStart.length.toLong * 4 +
        g.nbrOff.length.toLong * 4 + g.nbrs.length.toLong * 4 + 256L

    private val cache =
      new java.util.LinkedHashMap[String, (Long, Long, RqGraph)](
        16, 0.75f, /* accessOrder = */ true)
    private var curBytes = 0L

    def get(path: String, conf: org.apache.hadoop.conf.Configuration): RqGraph = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val st = fs.getFileStatus(p)
      cache.synchronized {
        val cur = cache.get(path)
        if (cur != null && cur._1 == st.getModificationTime && cur._2 == st.getLen)
          return cur._3
      }
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(p), 1 << 20))
      val g = try RqGraph.read(in) finally in.close()
      cache.synchronized {
        val old = cache.put(path, (st.getModificationTime, st.getLen, g))
        if (old != null) curBytes -= estBytes(old._3)
        curBytes += estBytes(g)
        val budget = budgetBytes
        val it = cache.entrySet().iterator()
        while (curBytes > budget && cache.size() > 1 && it.hasNext) {
          val e = it.next()
          if (e.getKey != path) {
            curBytes -= estBytes(e.getValue._3)
            it.remove()
          }
        }
      }
      g
    }
  }

  /** One-time CREATE INDEX job: train the rotation/centroid over the
    * table, build raw-f32 graphs per partition (exact edges), snapshot
    * to bit-coded form, persist `rqgraph-<pid>.bin`. */
  def ensure(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 12, efConstruction: Int = 300)
      : (Rabitq.Model, String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.ensure(spark, name, source,
        requires = Map("format" -> "rqflatbin3", "m" -> m.toString,
          "ef_construction" -> efConstruction.toString,
          "parts" -> parts.toString) ++
          (if (parts > 1) Map("routing" -> Hnsw.RoutingGen)
           else Map.empty))(
      buildInto(spark, df, source, idCol, vecCol, parts, m, efConstruction))
    val model = Rabitq.Model(mf.params("dims").toInt,
      mf.floats("centroid"), mf.floats("rot"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  /** REINDEX: rebuild into a fresh generation dir with one atomic
    * pointer flip — the vacuum path for SQL-created
    * `[indexing.hnsw.quantization.rabitq]` artifacts. */
  def reindex(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 12, efConstruction: Int = 300)
      : (Rabitq.Model, String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.reindex(spark, name)(
      buildInto(spark, df, source, idCol, vecCol, parts, m, efConstruction))
    val model = Rabitq.Model(mf.params("dims").toInt,
      mf.floats("centroid"), mf.floats("rot"))
    (model, IndexCatalog.dataDir(spark, name))
  }

  private def buildInto(spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int, efConstruction: Int)(dataDir: String)
      : graft.index.IndexCatalog.Manifest = {
    import graft.index.IndexCatalog
    import spark.implicits._
    val nonNull = df.filter(col(vecCol).isNotNull &&
      graft.functions.vectorIsFinite(col(vecCol)))
    val model = Rabitq.train(nonNull, vecCol)
    val rows0 = nonNull.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    // round 9: shared SPATIAL build + routing sidecar (rqflatbin3 —
    // the format-bump invariant, build partitioning changed)
    val bModel = spark.sparkContext.broadcast(model)
    val (nFiles, routingParams) = Hnsw.buildGraphFiles(spark, rows0,
      parts, dataDir,
      "rqgraph", m, efConstruction, new GraphEncode {
        def write(flat: Hnsw.FlatGraph, out: java.io.DataOutputStream): Unit =
          RqGraph.write(out, RqGraph.fromFlat(flat, bModel.value))
      })
    IndexCatalog.Manifest("hnsw_rabitq", source, "l2",
      Map("m" -> m.toString, "ef_construction" -> efConstruction.toString,
        "parts" -> parts.toString, "files" -> nFiles.toString,
        "dims" -> model.dims.toString, "format" -> "rqflatbin3") ++
        routingParams,
      floats = Map("centroid" -> model.centroid, "rot" -> model.rot))
  }

  /** Two-stage search: estimator-scored graph frontier per resident
    * bit-coded graph, exact rerank of the union frontier from the
    * source. exact=true skips the graphs (flat-oracle mode). */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      indexed: DataFrame, idCol: String, vecCol: String, q: Array[Float],
      k: Int, model: Rabitq.Model, efSearch: Int = 100,
      window: Int = 4, exact: Boolean = false,
      probeGraphs: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.functions.l2sq
    val coarse =
      if (exact) indexed.select(col(idCol), col(vecCol))
      else {
        val dirPath = new org.apache.hadoop.fs.Path(path)
        val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val allFiles = fs.globStatus(new org.apache.hadoop.fs.Path(path, "rqgraph-*.bin"))
          .map(_.getPath.toString).sorted.toSeq
        if (allFiles.isEmpty)
          return spark.emptyDataset[(Long, Double)].toDF(idCol, "dist")
        // routed coded search (round 9): sidecar l2 bounds on the RAW
        // query (the rotation is an isometry — raw-space ranking is the
        // rotated-space ranking)
        val files = Hnsw.routeFiles(spark, path, allFiles, q, probeGraphs)
        val rq = model.rotate(q)
        val qNorm = math.sqrt(rq.map(x => x * x).sum)
        val bRq = spark.sparkContext.broadcast(rq)
        // k·window frontier before exact rerank — the flat coded scan's
        // rerank-window convention (bit-estimate error at ef == k leaves
        // recoverable neighbors outside the beam)
        val ef = math.max(efSearch, k * math.max(window, 1))
        val hconf = Hnsw.confEntries(spark)
        val frontier = spark.sparkContext
          .parallelize(files, Hnsw.fileSlices(spark, files.length))
          .mapPartitions { it =>
            val conf = Hnsw.mkConf(hconf)
            it.flatMap { f =>
              val g = RqGraphCache.get(f, conf)
              g.searchFrontier(bRq.value, qNorm, ef)
                .iterator.map { case (d, id) => (id, d) }
            }
          }.toDF(idCol, "approx_dist")
        Rerank.fetchByIds(indexed, idCol, vecCol, frontier)
      }
    coarse.select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
