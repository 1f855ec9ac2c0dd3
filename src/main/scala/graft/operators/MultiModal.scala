package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal (image/audio/video) column plumbing: payloads are opaque
 * `binary` columns with a typed metadata struct; decode/feature-extract
 * runs per-partition over batches so a real decoder (JNI/ONNX/ffmpeg)
 * would amortize model/codec init per partition, not per row.
 *
 * The actual media decode is STUBBED (no image/audio libs in this
 * environment): [[decodeStub]] produces a deterministic fake "pixel
 * buffer" from the payload bytes. Everything around it — schema,
 * partition batching, fixed-size feature shape, catalog-friendly
 * output — is real and tested (MultiModalSpec).
 */
object MultiModal {

  val FeatureDims = 16

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)
  case class FeatureRow(doc_id: Long, mime: String, n_bytes: Long,
      feature: Array[Float])

  /** STUB decode: a real implementation would run the image/audio codec
    * here (???). Deterministic fake: the payload bytes ARE the "pixels". */
  private def decodeStub(payload: Array[Byte], mime: String): Array[Byte] =
    payload

  /** Byte-histogram "embedding" of the decoded buffer — a stand-in with
    * the exact shape of a real feature extractor: fixed FeatureDims
    * output, normalized to sum 1. */
  def featurizeKernel(decoded: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDims)
    var i = 0
    while (i < decoded.length) {
      hist((decoded(i) & 0xff) % FeatureDims) += 1.0f
      i += 1
    }
    if (decoded.length > 0) {
      var j = 0
      while (j < FeatureDims) { hist(j) /= decoded.length; j += 1 }
    }
    hist
  }

  /** Batch featurize: (doc_id, payload, mime) -> (doc_id, mime, n_bytes,
    * feature[FeatureDims]). Per-partition init point for a real codec. */
  def featurize(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: open codec/model ONCE here
      it.map { r =>
        val decoded = decodeStub(r.payload, r.mime)
        FeatureRow(r.doc_id, r.mime, r.payload.length.toLong,
          featurizeKernel(decoded))
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, n_frame_bytes: Long,
      feature: Array[Float])

  /** Frame sampling (the video-pipeline shape): split each payload into
    * fixed `frameBytes` chunks, keep every `stride`-th frame, featurize
    * each — one flatMap pass, codec init once per partition. At 100 TB
    * this is the standard decode-fanout: rows multiply by
    * nFrames/stride, so the stage after it repartitions by size, not
    * count. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int,
      stride: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: open the video codec ONCE here
      it.flatMap { r =>
        val n = r.payload.length
        val nFrames = (n + frameBytes - 1) / frameBytes
        (0 until nFrames).iterator.filter(_ % stride == 0).map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, n)
          val chunk = java.util.Arrays.copyOfRange(r.payload, from, until)
          FrameRow(r.doc_id, f.toLong, chunk.length.toLong,
            featurizeKernel(decodeStub(chunk, r.mime)))
        }
      }
    }
  }

  /** Wrap a text table as a media table (payload = utf-8 bytes) — the
    * fixture path used by queries/tests in this corpus. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(textCol).cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[MediaRow]
  }
}
