package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * HNSW ANN graph, per Spark partition — the distributed shape of the
 * reference's per-segment HNSW (crates/hnsw/src/lib.rs, search
 * crates/graph/src/search.rs): each partition builds a small-world graph
 * over its rows; a query searches every partition-local graph and the
 * per-partition top-k streams merge through a global TakeOrdered(k) —
 * the LoserTree-merge analog (crates/index/src/utils/tournament_tree.rs).
 *
 * Algorithm: Malkov & Yashunin, "Efficient and robust approximate nearest
 * neighbor search using Hierarchical Navigable Small World graphs" (2018).
 * Defaults mirror the reference: m=12, ef_construction=300, ef_search=100
 * (crates/base/src/index.rs:406-413, 561-563).
 */
object Hnsw {

  final class Graph(metric: String, m: Int = 12, efConstruction: Int = 300,
      seed: Long = 42L) extends Serializable {
    private val mMax0 = 2 * m
    private val mL = 1.0 / math.log(m.toDouble)
    private val rnd = new java.util.Random(seed)
    private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    private val ids = mutable.ArrayBuffer.empty[Long]
    // adjacency per node per level
    private val links = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
    private var entry: Int = -1
    private var maxLevel: Int = -1

    @inline private def dist(a: Array[Float], b: Array[Float]): Double =
      IvfIndex.Kernels.dist(metric, a, b)

    def size: Int = vecs.length

    def insert(id: Long, v: Array[Float]): Unit = {
      val node = vecs.length
      vecs += v; ids += id
      val level = math.floor(-math.log(math.max(rnd.nextDouble(), 1e-12)) * mL).toInt
      links += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = node; maxLevel = level; return }
      var ep = entry
      // greedy descent through levels above the node's level
      var lc = maxLevel
      while (lc > level) {
        ep = greedyStep(v, ep, lc); lc -= 1
      }
      // insert at each level from min(level, maxLevel) down to 0
      lc = math.min(level, maxLevel)
      while (lc >= 0) {
        val cands = searchLayer(v, ep, efConstruction, lc)
        val mAllowed = if (lc == 0) mMax0 else m
        val selected = cands.take(m)
        for ((_, c) <- selected) {
          links(node)(lc) += c
          links(c)(lc) += node
          if (links(c)(lc).length > mAllowed) {
            // prune neighbor's list back to closest mAllowed
            val pruned = links(c)(lc)
              .map(n => (dist(vecs(c), vecs(n)), n)).sortBy(_._1)
              .take(mAllowed).map(_._2)
            links(c)(lc) = mutable.ArrayBuffer(pruned.toSeq: _*)
          }
        }
        if (selected.nonEmpty) ep = selected.head._2
        lc -= 1
      }
      if (level > maxLevel) { maxLevel = level; entry = node }
    }

    private def greedyStep(q: Array[Float], start: Int, level: Int): Int = {
      var cur = start
      var curD = dist(q, vecs(cur))
      var improved = true
      while (improved) {
        improved = false
        for (n <- links(cur)(level)) {
          val d = dist(q, vecs(n))
          if (d < curD) { curD = d; cur = n; improved = true }
        }
      }
      cur
    }

    /** Best-first search on one layer; returns (dist, node) ascending. */
    private def searchLayer(q: Array[Float], ep: Int, ef: Int, level: Int)
        : IndexedSeq[(Double, Int)] = {
      val visited = mutable.BitSet(ep)
      val epD = dist(q, vecs(ep))
      // candidates: min-heap; results: max-heap bounded to ef
      val cand = mutable.PriorityQueue((-epD, ep))(Ordering.by(_._1))
      val res = mutable.PriorityQueue((epD, ep))(Ordering.by(_._1))
      while (cand.nonEmpty) {
        val (ncd, c) = cand.dequeue()
        val cd = -ncd
        if (cd > res.head._1 && res.size >= ef) { cand.clear() }
        else {
          for (n <- links(c)(level) if !visited.contains(n)) {
            visited += n
            val d = dist(q, vecs(n))
            if (res.size < ef || d < res.head._1) {
              cand.enqueue((-d, n))
              res.enqueue((d, n))
              if (res.size > ef) res.dequeue()
            }
          }
        }
      }
      res.dequeueAll.reverse.toIndexedSeq
    }

    /** Top-k (distance, id) for a query. */
    def search(q: Array[Float], k: Int, efSearch: Int = 100): Seq[(Double, Long)] = {
      if (entry < 0) return Nil
      var ep = entry
      var lc = maxLevel
      while (lc > 0) { ep = greedyStep(q, ep, lc); lc -= 1 }
      searchLayer(q, ep, math.max(efSearch, k), 0)
        .take(k).map { case (d, n) => (d, ids(n)) }
    }
  }

  /** Distributed top-k with per-call graph build — spec/testing path only;
    * production queries go through [[ensure]] + [[searchIndex]]. */
  def topk(df: DataFrame, idCol: String, vecCol: String, metric: String,
      q: Array[Float], k: Int, m: Int = 12, efConstruction: Int = 300,
      efSearch: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(q)
    val rows = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val hits = rows.mapPartitions { it =>
      val g = new Graph(metric, m, efConstruction)
      it.foreach { case (id, v) => g.insert(id, v) }
      g.search(bq.value, k, efSearch).iterator.map { case (d, id) => (id, d) }
    }.toDF(idCol, "dist")
    hits.orderBy(col("dist"), col(idCol)).limit(k)
  }

  def serializeGraph(g: Graph): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    try out.writeObject(g) finally out.close()
    bos.toByteArray
  }

  def deserializeGraph(b: Array[Byte]): Graph = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try in.readObject().asInstanceOf[Graph] finally in.close()
  }

  /** One-time CREATE INDEX job: build one graph per hash partition and
    * persist the serialized graphs as the index artifact — the sealed-
    * segment analog (crates/index/src/segment/sealed.rs). Searches load
    * graphs, never rebuild. `parts <= 1` builds a single graph over
    * id-sorted rows (deterministic; used by the exact-mode query). */
  def ensure(spark: org.apache.spark.sql.SparkSession, name: String,
      df: => DataFrame, source: String, idCol: String, vecCol: String,
      metric: String, parts: Int, m: Int = 12, efConstruction: Int = 300): String = {
    import graft.index.IndexCatalog
    IndexCatalog.ensure(spark, name, source) { dataDir =>
      import spark.implicits._
      // cosine follows the IVF rewrite: normalize at build, search by dot
      val nonNull = df.filter(col(vecCol).isNotNull)
      val prepped =
        if (metric == "cos")
          nonNull.withColumn(vecCol, graft.functions.vectorNormalize(col(vecCol)))
        else nonNull
      val rows0 = prepped.select(col(idCol).cast("long"), col(vecCol))
        .as[(Long, Array[Float])]
      val rows =
        if (parts <= 1) rows0.coalesce(1).sortWithinPartitions(col(idCol))
        else rows0.repartition(parts, col(idCol))
      rows.mapPartitions { it =>
        val g = new Graph(metric, m, efConstruction)
        it.foreach { case (id, v) => g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else Iterator.single(serializeGraph(g))
      }.toDF("graph").write.mode("overwrite").parquet(dataDir)
      IndexCatalog.Manifest("hnsw", source, metric,
        Map("m" -> m.toString, "ef_construction" -> efConstruction.toString,
          "parts" -> parts.toString))
    }
    IndexCatalog.dataDir(spark, name)
  }

  /** Search persisted per-partition graphs; global ordered merge of the
    * per-graph top-k streams (the LoserTree analog). Per-query cost is
    * k·efSearch per graph — independent of per-partition row count. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, q: Array[Float], k: Int, efSearch: Int = 100): DataFrame = {
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(q)
    val hits = spark.read.parquet(path).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { blob =>
          deserializeGraph(blob).search(bq.value, k, efSearch)
            .iterator.map { case (d, id) => (id, d) }
        }
      }.toDF(idCol, "dist")
    hits.orderBy(col("dist"), col(idCol)).limit(k)
  }
}
