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
    * segment store at `dir`. Caller starts/stops the returned writer. */
  def intoSegments(stream: DataFrame, dir: String, idCol: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) Segments.append(batch.sparkSession, dir, batch, idCol)
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
