package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.Dedup

/** One (band bucket, document) pair on the stream: the doc's FNV shingle
  * hash set rides along so matches verify EXACTLY against prior arrivals
  * (the batch path's verifyJaccard contract — signature-only state would
  * make the verdict an estimate). `ts` duplicates `ts_us` as a timestamp
  * for the watermark. */
case class NearDupBucketDoc(band_idx: Int, band_hash: Int, doc_id: Long,
    ts_us: Long, sh: Array[Long], ts: java.sql.Timestamp)

/** An emitted near-dup match: `doc_a` arrived first (keep-first order),
  * `jacc` is the exact hash-set Jaccard. */
case class NearDupHit(doc_a: Long, doc_b: Long, jacc: Double)

private[streaming] case class NearDupBucketState(
    ids: Array[Long], tss: Array[Long], shs: Array[Array[Long]])

/**
 * Continuous MinHash near-dup detection — the streaming twin of
 * `q_dedup_minhash` for an ingest pipeline that must flag a document
 * near-duplicating ANY earlier arrival, not just one inside the current
 * micro-batch. Shape:
 *
 *   docs → shingleHashes → minhashSignatureHashed → banded keys
 *        → explode to (band_idx, band_hash) buckets
 *        → flatMapGroupsWithState per bucket
 *
 * Bucket state holds the (doc_id, shingle-hash-set) of every retained
 * prior arrival in that bucket; a new doc compares against them with the
 * EXACT hash-set Jaccard (the batch family's verify step — identical
 * arithmetic, shared FNV collision odds), emitting a [[NearDupHit]] per
 * matching pair. The same banding as the batch path (any-band collision,
 * miss p ~1e-15 at jacc >= 0.8 under 16×4) makes the emitted pair set
 * equal the batch exact-Jaccard pairs, so the gate carries the SAME
 * oracle as q_dedup_minhash over its corpus.
 *
 * Determinism/emission contract: a pair emits exactly once per shared
 * band — IN THE BATCH THE LATER DOC ARRIVES IN — because state mutates
 * only forward; pairs sharing several bands emit once per band, so
 * consumers drop duplicates PER MICRO-BATCH (cross-batch re-emission is
 * impossible). Within a batch, bucket slices process in (ts_us, doc_id)
 * order, the sessionize convention.
 *
 * State is bounded three ways (the watermark contract every stateful op
 * here follows): entries older than `retention` behind the watermark are
 * trimmed on every bucket visit, an idle bucket's whole state is
 * dropped by event-time timeout, and a HOT bucket (near-constant band
 * hash on boilerplate corpora) is capped at `maxBucketMembers` retained
 * members WITHIN the horizon — oldest evicted first, drops counted in
 * the `graft.streamNearDup.capDrops` accumulator (a bounded-state
 * recall trade: evicted members can no longer match later arrivals).
 * Historical dedup beyond the retention horizon is the batch path's job
 * (dedupByContent's documented split).
 *
 * Scale shape: each doc emits `bands` rows; the only shuffle is the
 * bucket groupBy (uniform murmur3 band hashes); per-bucket state is
 * O(retained bucket members) shingle sets — the 16× set duplication
 * across a doc's buckets is the price of exact verdicts; pass
 * signature-sized shingle sets (shingleK ≥ 3 on token streams) or lower
 * `bands` to trade memory for recall.
 */
object StreamingNearDup {

  /** Exact Jaccard over two distinct-hash arrays — the verifyJaccard
    * arithmetic (int counts, one double division). */
  private[streaming] def jaccHashSets(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    val sa = new java.util.HashSet[Long](a.length * 2)
    var i = 0
    while (i < a.length) { sa.add(a(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** The streaming transform: call on a streaming DataFrame carrying
    * (idCol: long-castable, textCol: string, tsCol: timestamp); returns
    * the stream of [[NearDupHit]]s. Start it with your own writeStream
    * (per-batch `dropDuplicates` in the sink — see the emission
    * contract above).
    *
    * `bootstrap`: an optional BATCH corpus (same idCol/textCol/tsCol
    * shape) that seeds the bucket state before the first micro-batch —
    * the historical-corpus dedup a real ingest pipeline needs WITHOUT
    * replaying history through the stream (flatMapGroupsWithState's
    * initial-state path; seeded entries age out through the same
    * retention horizon as streamed ones). */
  def hits(docs: DataFrame, idCol: String, textCol: String, tsCol: String,
      watermarkDelay: String, retention: String = "7 days",
      shingleK: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
      minJacc: Double = 0.8, bootstrap: Option[DataFrame] = None,
      maxBucketMembers: Int = 4096): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._
    require(maxBucketMembers > 0, "maxBucketMembers must be positive")
    // hot-bucket cap (round 9): a near-constant band hash — boilerplate
    // corpora hashing most docs into one bucket — would otherwise grow
    // that bucket's state unboundedly WITHIN the retention horizon.
    // Evict-OLDEST by (ts, id) beyond the cap; evicted members can no
    // longer match later arrivals (a bounded-state recall trade,
    // surfaced through the `graft.streamNearDup.capDrops` accumulator
    // and an executor-side warn). The gate corpus never hits the
    // default cap, so the q_dedup_minhash oracle is untouched.
    val dropAcc = docs.sparkSession.sparkContext
      .longAccumulator("graft.streamNearDup.capDrops")
    def capped(ids: Array[Long], tss: Array[Long],
        shs: Array[Array[Long]])
        : (Array[Long], Array[Long], Array[Array[Long]]) = {
      if (ids.length <= maxBucketMembers) (ids, tss, shs)
      else {
        val dropped = ids.length - maxBucketMembers
        dropAcc.add(dropped)
        // name-based logger: `getClass` would capture the enclosing
        // (non-serializable) singleton in the stateful-func closure
        org.slf4j.LoggerFactory.getLogger("graft.streaming.StreamingNearDup").warn(
          s"near-dup bucket over cap ($maxBucketMembers): evicting " +
            s"$dropped oldest member(s)")
        val keep = ids.indices
          .sortBy(i => (tss(i), ids(i)))
          .drop(dropped)
          .sorted
        (keep.map(ids).toArray, keep.map(tss).toArray,
          keep.map(shs).toArray)
      }
    }
    val retentionUs =
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String
          .fromString(retention)) match {
        case iv =>
          require(iv.months == 0, "retention must not use month units")
          iv.days * 86400000000L + iv.microseconds
      }
    def keyDocs(df: DataFrame): Dataset[NearDupBucketDoc] = df
      .select(col(idCol).cast("long").as("doc_id"),
        unix_micros(col(tsCol)).as("ts_us"), col(tsCol).as("ts"),
        Dedup.shingleHashes(col(textCol), shingleK).as("sh"),
        Dedup.minhashSignatureHashed(
          Dedup.shingleHashes(col(textCol), shingleK),
          bands * rowsPerBand).as("sig"))
      .select(col("doc_id"), col("ts_us"), col("ts"), col("sh"),
        posexplode(Dedup.bandKeys(col("sig"), bands, rowsPerBand))
          .as(Seq("band_idx", "band_hash")))
      .select(col("band_idx").cast("int"), col("band_hash").cast("int"),
        col("doc_id"), col("ts_us"), col("sh"), col("ts"))
      .as[NearDupBucketDoc]
    val keyed = keyDocs(docs.withWatermark(tsCol, watermarkDelay))
    // seeded buckets arm their timeout on first visit (the retention
    // trim runs per visit regardless); until then they live like any
    // other pre-first-watermark state
    val initialState = bootstrap.map { corpus =>
      keyDocs(corpus)
        .groupByKey(d => (d.band_idx, d.band_hash))
        .mapGroups { (k, it) =>
          val arr = it.toArray.sortBy(d => (d.ts_us, d.doc_id))
          val (ci, ct, cs) = capped(arr.map(_.doc_id), arr.map(_.ts_us),
            arr.map(_.sh))
          (k, NearDupBucketState(ci, ct, cs))
        }
        .groupByKey(_._1)
        .mapValues(_._2)
    }
    val func = (_: (Int, Int), it: Iterator[NearDupBucketDoc],
        state: GroupState[NearDupBucketState]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val arr = it.toArray.sortBy(d => (d.ts_us, d.doc_id))
            val horizonUs =
              state.getCurrentWatermarkMs() * 1000L - retentionUs
            val prior = state.getOption
              .map { st =>
                val keep = st.tss.indices.filter(st.tss(_) >= horizonUs)
                (keep.map(st.ids).toArray, keep.map(st.tss).toArray,
                  keep.map(st.shs).toArray)
              }
              .getOrElse((Array.empty[Long], Array.empty[Long],
                Array.empty[Array[Long]]))
            var (ids, tss, shs) = prior
            val out = scala.collection.mutable.ArrayBuffer[NearDupHit]()
            var maxTsUs = if (tss.isEmpty) 0L else tss.max
            arr.foreach { d =>
              var i = 0
              while (i < ids.length) {
                if (ids(i) != d.doc_id) {
                  val j = jaccHashSets(shs(i), d.sh)
                  if (j >= minJacc) out += NearDupHit(ids(i), d.doc_id, j)
                }
                i += 1
              }
              ids = ids :+ d.doc_id
              tss = tss :+ d.ts_us
              shs = shs :+ d.sh
              if (d.ts_us > maxTsUs) maxTsUs = d.ts_us
            }
            val (ci, ct, cs) = capped(ids, tss, shs)
            state.update(NearDupBucketState(ci, ct, cs))
            // drop the whole bucket once the watermark passes its newest
            // member's retention horizon (the sessionize clamp)
            state.setTimeoutTimestamp(
              math.max(maxTsUs / 1000L + retentionUs / 1000L + 1L,
                state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
        }: Iterator[NearDupHit]
    val grouped = keyed.groupByKey(d => (d.band_idx, d.band_hash))
    initialState match {
      case Some(init) =>
        grouped.flatMapGroupsWithState[NearDupBucketState, NearDupHit](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout, init)(func)
      case None =>
        grouped.flatMapGroupsWithState[NearDupBucketState, NearDupHit](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(func)
    }
  }
}
