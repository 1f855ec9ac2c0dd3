package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, xxhash64}

/** Shared build-time probe calibration (the round-11 IVF cal2/cal3
  * statistic, round-12: lifted out of [[IvfIndex]] so spatial GRAPH
  * fleets calibrate their probeGraphs the same way — the
  * measure-at-build / guard-at-plan philosophy applied uniformly).
  *
  * Statistic: a deterministic 64-query holdout (lowest xxhash64 of the
  * stored vector — corpus-size-independent), each query's true top-100
  * under the family's own kernel with the query's OWN stored row and
  * byte-identical duplicates EXCLUDED (cal3 de-bias: a self-hit at
  * dist 0 always lands in the top-ranked probe and made the statistic
  * optimistic for out-of-corpus queries), the 95th-percentile probe
  * rank of those neighbors per query, p90 across queries.
  *
  * Scale shape: per-partition bounded heaps (64 × top-100) — no N-row
  * shuffle; the partial top-k merges over #partitions × 6400 tiny rows.
  */
private[graft] object ProbeCal {

  /** `frame` must expose exactly (v: array<float>, pid: int) — the
    * stored vector and its probe-unit id (IVF list / graph partition).
    * `mcode`: 0 = l2sq, 1 = -dot, else 1-dot (stored-space kernels —
    * cos families store normalize-at-build rows). `rank`: per holdout
    * query, pid -> 1-based rank under the family's SEARCH-TIME probe
    * ranking. Returns the hint >= 1; callers clamp to their family's
    * probe ceiling. */
  def hint(spark: SparkSession, frame: DataFrame, mcode: Int,
      rank: Array[Float] => Map[Int, Int]): Int = {
    val qPairs = frame
      .select(col("v"), xxhash64(col("v")).as("qh"))
      .orderBy(col("qh")).limit(64)
      .collect().map(r => (r.getSeq[Float](0).toArray, r.getLong(1)))
    if (qPairs.isEmpty) return 1
    val bq = spark.sparkContext.broadcast(qPairs)
    import spark.implicits._
    // per-partition: keep the 100 smallest (dist, pid) per query —
    // deterministic lexicographic order so replica merges tie-break
    // identically
    val partials = frame
      .select(col("v"), col("pid"), xxhash64(col("v")).as("rh"))
      .mapPartitions { it =>
        val qp = bq.value
        val qs = qp.map(_._1)
        val qhs = qp.map(_._2)
        val heaps = Array.fill(qs.length)(
          scala.collection.mutable.PriorityQueue.empty[(Double, Int)](
            Ordering.Tuple2[Double, Int]))
        it.foreach { r =>
          val v = r.getSeq[Float](0)
          val arr = new Array[Float](v.length)
          var i = 0
          while (i < arr.length) { arr(i) = v(i); i += 1 }
          val pid = r.getInt(1)
          val rh = r.getLong(2)
          var qi = 0
          while (qi < qs.length) {
            // IvfKernels referenced DIRECTLY: naming a nested alias
            // inside this closure would capture a non-serializable
            // outer (the round-9 GraphFileWriter lesson)
            if (rh != qhs(qi)) {
              val d = mcode match {
                case 0 => IvfKernels.l2sq(arr, qs(qi))
                case 1 => -IvfKernels.dot(arr, qs(qi))
                case _ => 1.0 - IvfKernels.dot(arr, qs(qi))
              }
              val h = heaps(qi)
              if (h.size < 100) h.enqueue((d, pid))
              else if (Ordering.Tuple2[Double, Int].lt((d, pid), h.head)) {
                h.dequeue(); h.enqueue((d, pid))
              }
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.iterator.map { case (d, pid) => (qi, d, pid) }
        }
      }.toDF("qi", "dist", "pid")
    // final top-100 per query over the tiny partial set, driver-side
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qi"))
      .orderBy(col("dist"), col("pid"))
    val nbrPids = partials
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 100).select(col("qi"), col("pid"))
      .collect().groupBy(_.getInt(0))
      .map { case (qi, rs) => qi -> rs.map(_.getInt(1)) }
    // the holdout broadcast is per-ensure; long-lived drivers run many
    // ensures (ensureAll) — release it once the partials are in
    bq.destroy()
    val depths = qPairs.indices.map { qi =>
      val rk = rank(qPairs(qi)._1)
      // per-ROW probe ranks (a multiset — one probe unit can hold many
      // of the top-100): the 95%-coverage depth is the 95th-percentile
      // rank
      val ranks = nbrPids.getOrElse(qi, Array.empty[Int])
        .map(rk).sorted
      if (ranks.isEmpty) 1
      else ranks(math.max(math.ceil(ranks.length * 0.95).toInt - 1, 0))
    }.sorted
    val p90 = depths(math.max(math.ceil(depths.length * 0.9).toInt - 1, 0))
    math.max(p90, 1)
  }
}
