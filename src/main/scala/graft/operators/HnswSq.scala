package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * HNSW × SQ8 composition — the Spark analog of the reference's `HnswSq`
 * sealed-index composition (crates/indexing/src/sealed.rs:25-29): the
 * persisted graph stores ONE-BYTE SQ8 codes instead of raw f32, so the
 * executor-resident artifact is ~4× smaller (the memory-bound HNSW
 * configuration); traversal scores approximate distances through a
 * per-query ADC lookup table, and the ef frontier is exact-reranked by
 * re-fetching just the candidate rows from the source table (the
 * reranker-heap analog, crates/quantization/src/reranker/flat.rs).
 *
 * Graph CONSTRUCTION runs on raw f32 (exact neighbor selection — build
 * cost is one-time; a graph built on quantized distances bakes the
 * quantization error into its edges). Codes are produced at snapshot.
 *
 * Exact mode follows the [[Sq8]] precedent: rerank window unbounded ==
 * skip the coarse graph entirely and score every source row exactly —
 * provably the flat top-k, which is what lets the twin carry the flat
 * DuckDB oracle.
 */
object HnswSq {

  /** Columnar byte-coded graph: FlatGraph's CSR adjacency with a byte
    * code matrix instead of the float vector matrix. `dims` is the CODE
    * BYTES PER NODE — the quantizer decides what they mean (SQ8: one
    * byte per dimension; PQ via [[HnswPq]]: one byte per subspace).
    * Traversal is quantizer-agnostic: every supported coder scores as
    * dist(node) = Σ_s lut(s·stride + code_s) for a per-query LUT. */
  final class SqGraph(
      val dims: Int, val ids: Array[Long], val codes: Array[Byte],
      val levels: Array[Int], val listStart: Array[Int],
      val nbrOff: Array[Int], val nbrs: Array[Int],
      val entry: Int, val maxLevel: Int) extends Serializable {

    def size: Int = ids.length

    /** Per-query ADC LUT: lut(i*256+c) = (decode(i,c) - q_i)² with the
      * same float decode as Sq8.l2Kernel — 256·dims entries built once
      * per (query, graph) pair, then every distance eval is dims table
      * adds with no decode arithmetic. */
    def buildLut(q: Array[Float], mins: Array[Float], widths: Array[Float]): Array[Double] = {
      val lut = new Array[Double](dims * 256)
      var i = 0
      while (i < dims) {
        val mn = mins(i); val w = widths(i); val qi = q(i).toDouble
        var c = 0
        while (c < 256) {
          val dec = mn + (c / 255.0f) * w
          val dd = dec.toDouble - qi
          lut(i * 256 + c) = dd * dd
          c += 1
        }
        i += 1
      }
      lut
    }

    @inline private def distTo(lut: Array[Double], stride: Int, node: Int): Double = {
      val off = node * dims
      var acc = 0.0; var i = 0
      while (i < dims) { acc += lut(i * stride + (codes(off + i) & 0xff)); i += 1 }
      acc
    }

    private def greedyStep(lut: Array[Double], stride: Int, start: Int, level: Int): Int = {
      var cur = start
      var curD = distTo(lut, stride, cur)
      var improved = true
      while (improved) {
        improved = false
        val li = listStart(cur) + level
        var j = nbrOff(li)
        val end = nbrOff(li + 1)
        while (j < end) {
          val n = nbrs(j)
          val d = distTo(lut, stride, n)
          if (d < curD) { curD = d; cur = n; improved = true }
          j += 1
        }
      }
      cur
    }

    private def searchLayer(lut: Array[Double], stride: Int, ep: Int, ef: Int,
        level: Int): IndexedSeq[(Double, Int)] = {
      val visited = mutable.BitSet(ep)
      val epD = distTo(lut, stride, ep)
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
              val d = distTo(lut, stride, n)
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

    /** The ef FRONTIER (approximate dist, id) ascending for an arbitrary
      * per-query LUT — callers rerank exactly; this never truncates to k
      * before the rerank. */
    def searchFrontierLut(lut: Array[Double], stride: Int, ef: Int)
        : Seq[(Double, Long)] = {
      if (entry < 0 || ids.length == 0) return Nil
      var ep = entry
      var lc = maxLevel
      while (lc > 0) { ep = greedyStep(lut, stride, ep, lc); lc -= 1 }
      searchLayer(lut, stride, ep, ef, 0).map { case (d, n) => (d, ids(n)) }
    }

    /** SQ8 frontier: per-dimension 256-entry ADC LUT. */
    def searchFrontier(q: Array[Float], mins: Array[Float], widths: Array[Float],
        ef: Int): Seq[(Double, Long)] =
      searchFrontierLut(buildLut(q, mins, widths), 256, ef)
  }

  object SqGraph {
    private val Magic = 0x47525351 // "GRSQ"
    private val Version = 1

    def fromFlat(g: Hnsw.FlatGraph, mins: Array[Float], widths: Array[Float]): SqGraph = {
      val n = g.ids.length
      val codes = new Array[Byte](n * g.dims)
      var i = 0
      while (i < codes.length) {
        val d = i % g.dims
        val x = (g.vecs(i) - mins(d)) / widths(d)
        codes(i) = math.round(math.max(0.0f, math.min(1.0f, x)) * 255.0f).toByte
        i += 1
      }
      new SqGraph(g.dims, g.ids, codes, g.levels, g.listStart, g.nbrOff,
        g.nbrs, g.entry, g.maxLevel)
    }

    def write(out: java.io.DataOutputStream, g: SqGraph): Unit = {
      out.writeInt(Magic); out.writeInt(Version)
      out.writeInt(g.dims); out.writeInt(g.ids.length)
      out.writeInt(g.entry); out.writeInt(g.maxLevel)
      var i = 0
      while (i < g.ids.length) { out.writeLong(g.ids(i)); i += 1 }
      out.write(g.codes)
      i = 0
      while (i < g.levels.length) { out.writeInt(g.levels(i)); i += 1 }
      out.writeInt(g.nbrOff.length)
      i = 0
      while (i < g.nbrOff.length) { out.writeInt(g.nbrOff(i)); i += 1 }
      out.writeInt(g.nbrs.length)
      i = 0
      while (i < g.nbrs.length) { out.writeInt(g.nbrs(i)); i += 1 }
    }

    def read(in: java.io.DataInputStream): SqGraph = {
      require(in.readInt() == Magic, "not a graft hnsw-sq8 artifact")
      require(in.readInt() == Version, "unsupported hnsw-sq8 artifact version")
      val dims = in.readInt(); val n = in.readInt()
      val entry = in.readInt(); val maxLevel = in.readInt()
      val ids = new Array[Long](n)
      var i = 0
      while (i < n) { ids(i) = in.readLong(); i += 1 }
      val codes = new Array[Byte](n * dims)
      in.readFully(codes)
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
      new SqGraph(dims, ids, codes, levels, listStart, nbrOff, nbrs,
        entry, maxLevel)
    }
  }

  /** Executor-local resident cache, byte-LRU-bounded like
    * [[Hnsw.GraphCache]] (same `spark.graft.hnsw.cacheBytes` budget —
    * coded graphs are ~4× cheaper per row, so the same budget holds ~4×
    * the rows). */
  object SqGraphCache {
    private val DefaultBudget = 4L << 30
    @volatile private var budgetOverride: Long = -1L
    private[graft] def setBudgetForTest(b: Long): Unit = { budgetOverride = b }
    private[graft] def clearForTest(): Unit = cache.synchronized {
      cache.clear(); curBytes = 0L
    }
    private def budgetBytes: Long = {
      if (budgetOverride > 0) return budgetOverride
      try {
        val env = org.apache.spark.SparkEnv.get
        if (env == null) DefaultBudget
        else env.conf.getLong("spark.graft.hnsw.cacheBytes", DefaultBudget)
      } catch { case _: Throwable => DefaultBudget }
    }

    private[graft] def estBytes(g: SqGraph): Long =
      g.ids.length.toLong * 8 + g.codes.length.toLong +
        g.levels.length.toLong * 4 + g.listStart.length.toLong * 4 +
        g.nbrOff.length.toLong * 4 + g.nbrs.length.toLong * 4 + 256L

    private val cache =
      new java.util.LinkedHashMap[String, (Long, Long, SqGraph)](
        16, 0.75f, /* accessOrder = */ true)
    private var curBytes = 0L

    def get(path: String, conf: org.apache.hadoop.conf.Configuration): SqGraph = {
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
      val g = try SqGraph.read(in) finally in.close()
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

  /** One-time CREATE INDEX job: train SQ8 bounds over the table, build
    * one raw-f32 graph per partition (exact edges), snapshot to the
    * coded columnar form, persist `sqgraph-<pid>.bin`. Returns
    * (mins, widths, dataDir). */
  def ensure(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 12, efConstruction: Int = 300)
      : (Array[Float], Array[Float], String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.ensure(spark, name, source,
        requires = Map("format" -> "sqflatbin3", "m" -> m.toString,
          "ef_construction" -> efConstruction.toString,
          "parts" -> parts.toString) ++
          (if (parts > 1) Map("routing" -> Hnsw.RoutingGen)
           else Map.empty))(
      buildInto(spark, df, source, idCol, vecCol, parts, m, efConstruction))
    (mf.floats("mins"), mf.floats("widths"), IndexCatalog.dataDir(spark, name))
  }

  /** REINDEX: rebuild into a fresh generation dir with one atomic
    * pointer flip — the vacuum path for SQL-created
    * `[indexing.hnsw.quantization.scalar]` artifacts. */
  def reindex(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int = 12, efConstruction: Int = 300)
      : (Array[Float], Array[Float], String) = {
    import graft.index.IndexCatalog
    val mf = IndexCatalog.reindex(spark, name)(
      buildInto(spark, df, source, idCol, vecCol, parts, m, efConstruction))
    (mf.floats("mins"), mf.floats("widths"), IndexCatalog.dataDir(spark, name))
  }

  private def buildInto(spark: org.apache.spark.sql.SparkSession,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      parts: Int, m: Int, efConstruction: Int)(dataDir: String)
      : graft.index.IndexCatalog.Manifest = {
    import graft.index.IndexCatalog
    import spark.implicits._
    val nonNull = df.filter(col(vecCol).isNotNull &&
      graft.functions.vectorIsFinite(col(vecCol)))
    val (mins, widths) = Sq8.train(nonNull, vecCol)
    val rows0 = nonNull.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    // round 9: the shared SPATIAL build — k-means partitioning + a
    // routing sidecar at parts>1, so coded searches route like the
    // dense family (sqflatbin3: the build partitioning changed, the
    // format-bump invariant)
    val bMins = spark.sparkContext.broadcast(mins)
    val bWidths = spark.sparkContext.broadcast(widths)
    val (nFiles, routingParams) = Hnsw.buildGraphFiles(spark, rows0,
      parts, dataDir,
      "sqgraph", m, efConstruction, new GraphEncode {
        def write(flat: Hnsw.FlatGraph, out: java.io.DataOutputStream): Unit =
          SqGraph.write(out, SqGraph.fromFlat(flat, bMins.value, bWidths.value))
      })
    IndexCatalog.Manifest("hnsw_sq8", source, "l2",
      Map("m" -> m.toString, "ef_construction" -> efConstruction.toString,
        "parts" -> parts.toString, "files" -> nFiles.toString,
        "bits" -> "8", "format" -> "sqflatbin3") ++ routingParams,
      floats = Map("mins" -> mins, "widths" -> widths))
  }

  /** Two-stage search: coded-graph frontier (per resident graph, LUT
    * traversal) -> exact rerank of the union frontier re-fetched from
    * the SOURCE table by id (IN pushdown -> row-group pruning). The
    * fetch is bounded by files × ef candidate ids. `exact = true`
    * follows the Sq8 window<=0 contract: skip the graphs, score every
    * source row — provably the flat top-k. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      indexed: DataFrame, idCol: String, vecCol: String, q: Array[Float],
      k: Int, mins: Array[Float], widths: Array[Float], efSearch: Int = 100,
      window: Int = 4, exact: Boolean = false,
      probeGraphs: Int = 0): DataFrame = {
    import spark.implicits._
    import graft.functions.l2sq
    val coarse =
      if (exact) indexed.select(col(idCol), col(vecCol))
      else {
        val dirPath = new org.apache.hadoop.fs.Path(path)
        val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val allFiles = fs.globStatus(new org.apache.hadoop.fs.Path(path, "sqgraph-*.bin"))
          .map(_.getPath.toString).sorted.toSeq
        if (allFiles.isEmpty)
          return spark.emptyDataset[(Long, Double)].toDF(idCol, "dist")
        // routed coded search (round 9): rank graphs by the sidecar's
        // l2 bounds; exact mode skips the graphs entirely
        val files = Hnsw.routeFiles(spark, path, allFiles, q, probeGraphs)
        val bq = spark.sparkContext.broadcast(q)
        val bMins = spark.sparkContext.broadcast(mins)
        val bWidths = spark.sparkContext.broadcast(widths)
        // frontier breadth follows the coded-graph rerank-window
        // convention (HnswPq/HnswRq: k·window candidates before exact
        // rerank — round 5). SQ8's estimate error is smaller than PQ's,
        // so window defaults to the Sq8 rerank window (4, vs PQ's 8);
        // an ef == k beam measured hnsw_sq8 clustered recall@100 0.97.
        val ef = math.max(efSearch, k * math.max(window, 1))
        val hconf = Hnsw.confEntries(spark)
        val frontier = spark.sparkContext
          .parallelize(files, Hnsw.fileSlices(spark, files.length))
          .mapPartitions { it =>
            val conf = Hnsw.mkConf(hconf)
            it.flatMap { f =>
              val g = SqGraphCache.get(f, conf)
              g.searchFrontier(bq.value, bMins.value, bWidths.value, ef)
                .iterator.map { case (d, id) => (id, d) }
            }
          }.toDF(idCol, "approx_dist")
        Rerank.fetchByIds(indexed, idCol, vecCol, frontier)
      }
    coarse.select(col(idCol), l2sq(col(vecCol), typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol)).limit(k)
  }
}
