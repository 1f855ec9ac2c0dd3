package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import graft.operators.Segments

/**
 * Streaming ingest — the aminsert analog (crates/index/src/segment/
 * growing.rs:132-158): each micro-batch appends a growing delta segment
 * through [[Segments]], so a concurrent snapshot read sees base ∪
 * already-committed batches, exactly like the reference's growing
 * segments becoming visible per insert, and the offline compaction job
 * later seals them.
 *
 * Also provides the watermarked windowed aggregation shape
 * (`readStream → withWatermark → groupBy(window) → writeStream`) used
 * for continuous stats over an event stream.
 */
object StreamingIngest {

  /** Attach a foreachBatch sink that appends every micro-batch to the
    * segment store at `dir`. Caller starts/stops the returned writer.
    * `autoSeal` (default on) applies the reference's timer/count sealing
    * policy after each append ([[Segments.sealIfDue]], sealing_secs
    * analog): a trickle stream folds its accumulated small deltas once
    * the oldest passes `spark.graft.segments.sealingSecs` or the pile
    * passes `maxDeltas` — without it the pile grows forever and every
    * snapshot read pays per-delta costs. Stores that back INCREMENTAL
    * indexes must pass autoSeal = false and run the index-aware
    * compaction path on their own schedule (promote-on-compact). */
  def intoSegments(stream: DataFrame, dir: String, idCol: String,
      autoSeal: Boolean = true)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          Segments.append(batch.sparkSession, dir, batch, idCol)
          if (autoSeal) Segments.sealIfDue(batch.sparkSession, dir, idCol)
        }
        ()
      }

  /** Continuous ANN serving, IVF-kind: every micro-batch of
    * (qid, qvec) rows is answered through the TABLE-VALUED join
    * ([[graft.operators.KnnJoin.join]]) — the query batch never
    * collects to the driver, so a micro-batch can be arbitrarily large
    * (contrast the searchIndexBatch shape, which collects a `Seq`).
    * `sink` receives the (qid, id, dist, rn) result frame per batch;
    * at nprobe = nlist each batch's answers are exact. */
  def serveKnnIvf(stream: DataFrame, qidCol: String, qvecCol: String,
      path: String, model: graft.operators.IvfIndex.Model, idCol: String,
      vecCol: String, k: Int, nprobe: Int)(sink: DataFrame => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.KnnJoin.join(batch.sparkSession, batch,
            qidCol, qvecCol, path, model, idCol, vecCol, k, nprobe))
        ()
      }

  /** Continuous ANN serving, HNSW-kind: micro-batches flow through
    * [[graft.operators.Hnsw.knnJoin]] — resident graphs, no driver
    * collect. `exact = true` flat-scans (the spec's oracle mode). */
  def serveKnnHnsw(stream: DataFrame, path: String, idCol: String,
      qidCol: String, qvecCol: String, k: Int, efSearch: Int = 100,
      exact: Boolean = false, probeGraphs: Int = 0)(sink: DataFrame => Unit)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          sink(graft.operators.Hnsw.knnJoin(batch.sparkSession, path, idCol,
            batch, qidCol, qvecCol, k, efSearch, exact, probeGraphs))
        ()
      }

  /** Watermarked per-window counts over a timestamped stream. */
  def windowedCounts(stream: DataFrame, tsCol: String, keyCol: String,
      window: String, watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(s"window.start").as("w_start"), col(keyCol), col("cnt"))

  /** Streaming EXACT dedup (the continuous-ingest form of
    * q_dedup_exact): keep the first arrival of each content hash, with
    * the dedup state bounded by the watermark — the standard shape for a
    * training-data ingest pipeline that must not admit the same document
    * twice. `dropDuplicatesWithinWatermark` is what actually EVICTS
    * state at the watermark horizon (plain dropDuplicates on a non-event-
    * time key keeps every hash forever); historical dedup beyond the
    * horizon is the batch content-hash join. */
  def dedupByContent(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String): DataFrame =
    stream
      .withColumn("content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
