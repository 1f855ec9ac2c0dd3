package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{Embed, Segments}
import graft.streaming.StreamingIngest

/** Streaming ingest (aminsert analog) through the segment store, the
  * watermarked window shape, and batch-embedding semantics. */
class StreamingEmbedSpec extends SparkSpec {
  import spark.implicits._

  test("streaming micro-batches append growing segments; reads see them") {
    val dir = Files.createTempDirectory("graft_stream_seg").toFile.getAbsolutePath
    Segments.init(spark, dir, Seq((1L, 10)).toDF("id", "v"), "id")

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Int)]
    val q = StreamingIngest.intoSegments(
      source.toDF().toDF("id", "v"), dir, "id")
      .start()
    try {
      source.addData((2L, 20), (3L, 30))
      q.processAllAvailable()
      val afterB1 = Segments.read(spark, dir, "id")
        .select("id", "v").as[(Long, Int)].collect().toSet
      assert(afterB1 == Set((1L, 10), (2L, 20), (3L, 30)))

      // a second batch reinserting id 2 shadows the first version
      source.addData((2L, 21))
      q.processAllAvailable()
      val afterB2 = Segments.read(spark, dir, "id")
        .select("id", "v").as[(Long, Int)].collect().toSet
      assert(afterB2 == Set((1L, 10), (2L, 21), (3L, 30)))
    } finally q.stop()

    // sealing: compaction folds streamed deltas into the base generation
    Segments.compact(spark, dir, "id")
    assert(Segments.state(dir).gen == 1)
    val sealedRows = Segments.read(spark, dir, "id")
      .select("id", "v").as[(Long, Int)].collect().toSet
    assert(sealedRows == Set((1L, 10), (2L, 21), (3L, 30)))
  }

  test("watermarked windowed counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(java.sql.Timestamp, String)]
    val counts = StreamingIngest.windowedCounts(
      source.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("win_counts").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      source.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b"))
      q.processAllAvailable()
      val got = spark.table("win_counts")
        .select(date_format(col("w_start"), "HH:mm").as("w"), col("k"), col("cnt"))
        .as[(String, String, Long)].collect().toSet
      assert(got == Set(("10:00", "a", 2L), ("10:10", "b", 1L)))
    } finally q.stop()
  }

  test("file-source stream over the events fixture matches the batch window agg") {
    val batch = graft.queries.CoreQueries.events(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("w"),
        col("event_type"), col("cnt"))
      .as[(String, String, Long)].collect().toSet

    // file stream sources consume directories of arriving files
    val dir = Files.createTempDirectory("graft_events_stream")
    Files.copy(java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    val stream = graft.queries.CoreQueries.normalizeEventTs(
      spark.readStream.schema(schema).parquet(dir.toString))
    val counts = StreamingIngest.windowedCounts(
      stream, "ts", "event_type", "1 hour", "1 hour")
    val q = counts.writeStream.outputMode("update")
      .format("memory").queryName("ev_counts").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_counts")
        .groupBy(date_format(col("w_start"), "yyyy-MM-dd HH").as("w"),
          col("event_type"))
        .agg(max(col("cnt")).as("cnt"))
        .as[(String, String, Long)].collect().toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming exact dedup keeps first arrival per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = StreamingIngest.dedupByContent(
      source.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
      source.addData((1L, ts(1), "the quick fox"), (2L, ts(2), "a lazy dog"))
      q.processAllAvailable()
      // same content re-arrives (different doc_id, later ts) -> dropped
      source.addData((3L, ts(3), "the quick fox"), (4L, ts(4), "fresh text"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select("doc_id").as[Long].collect().toSet
      assert(got == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("batch embedding: unit norm, deterministic, token-overlap knn") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val model = Embed.fit(docs, "text", 64)
    val emb = Embed.transform(model, docs, "doc_id", "text").cache()
    // unit norm everywhere
    val norms = emb.select(graft.functions.vectorNorm(col("embedding")))
      .as[Double].collect()
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
    // deterministic
    val again = Embed.transform(model, docs, "doc_id", "text")
      .orderBy("doc_id").limit(3).select("embedding").as[Seq[Float]].collect()
    val first = emb.orderBy("doc_id").limit(3).select("embedding")
      .as[Seq[Float]].collect()
    assert(first.toSeq == again.toSeq)
    // a doc is its own nearest neighbour under cosine
    val q0 = emb.filter(col("doc_id") === 0).select(col("embedding").as("qv"))
    val top = emb.crossJoin(broadcast(q0))
      .select(col("doc_id"),
        graft.functions.cosdist(col("embedding"), col("qv")).as("d"))
      .orderBy(col("d")).limit(1).select("doc_id").as[Long].head()
    assert(top == 0L)
  }
}
