package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingNearDup

/** Continuous MinHash near-dup: streamed hits must equal the batch
  * LSH+verify pairs when fed the same corpus (state carries earlier
  * arrivals across micro-batches), and bucket state must stay bounded
  * by the retention horizon. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  test("streamed hits across micro-batches equal the batch LSH+verify pairs") {
    val docs0 = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text")
    val corpus = docs0.unionAll(docs0.filter($"doc_id" < 20)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" zzz")).as("text")))
    val sh = corpus.select($"doc_id", Dedup.shingleHashes($"text", 3).as("sh"))
    val sig = sh.select($"doc_id",
      Dedup.minhashSignatureHashed($"sh", 64).as("sig"))
    val want = Dedup.verifyJaccard(
        Dedup.lshCandidates(sig, "doc_id", "sig", bands = 16, rows = 4),
        sh, "doc_id", "sh")
      .filter($"jacc" >= 0.8)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture must contain near-dup pairs")

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val hits = StreamingNearDup.hits(
      source.toDS().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermarkDelay = "1 hour")
    val q = hits.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= b.dropDuplicates("doc_a", "doc_b")
            .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
        }
        ()
      }.start()
    try {
      val rows = corpus.collect()
        .map(r => (r.getLong(0), r.getString(1), T0)).sortBy(_._1)
      // three micro-batches: originals in two chunks, mirrors last —
      // every mirror pair must cross batches through bucket state
      val (orig, mirrors) = rows.partition(_._1 < 100000)
      val (o1, o2) = orig.splitAt(orig.length / 2)
      source.addData(o1.toSeq: _*); q.processAllAvailable()
      source.addData(o2.toSeq: _*); q.processAllAvailable()
      source.addData(mirrors.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    assert(sink.toSet == want,
      s"streamed hits diverged: got ${sink.size} want ${want.size}")
  }

  test("bootstrap seeds bucket state from a batch corpus: streamed docs " +
      "match history without replaying it") {
    val docs0 = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" < 60)
    val history = docs0.withColumn("ts", lit(T0))
    // stream ONLY the mirrors; every hit must come from seeded state
    val mirrors = docs0.filter($"doc_id" < 20)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" zzz")).as("text"))
    val sh = docs0.unionAll(mirrors)
      .select($"doc_id", Dedup.shingleHashes($"text", 3).as("sh"))
    val sig = sh.select($"doc_id",
      Dedup.minhashSignatureHashed($"sh", 64).as("sig"))
    val want = Dedup.verifyJaccard(
        Dedup.lshCandidates(sig, "doc_id", "sig", bands = 16, rows = 4),
        sh, "doc_id", "sh")
      .filter($"jacc" >= 0.8 && $"doc_b" >= 100000 && $"doc_a" < 100000)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val hits = StreamingNearDup.hits(
      source.toDS().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermarkDelay = "1 hour",
      bootstrap = Some(history))
    val q = hits.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= b.dropDuplicates("doc_a", "doc_b")
            .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
        }
        ()
      }.start()
    try {
      val rows = mirrors.collect()
        .map(r => (r.getLong(0), r.getString(1),
          new java.sql.Timestamp(T0.getTime + 60000L)))
      source.addData(rows.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // streamed mirrors never saw each other's originals in-stream —
    // every (history, mirror) pair must surface via the seeded state
    assert(sink.toSet.filter(p => p._1 < 100000) == want,
      s"bootstrap hits diverged: got ${sink.size} want ${want.size}")
  }

  test("retention bounds bucket state: matches beyond the horizon don't emit") {
    implicit val sqlCtx = spark.sqlContext
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def at(min: Int) = new java.sql.Timestamp(T0.getTime + min * 60000L)
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val hits = StreamingNearDup.hits(
      source.toDS().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts",
      watermarkDelay = "0 seconds", retention = "1 minute")
    val q = hits.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= b.select($"doc_a", $"doc_b").as[(Long, Long)].collect()
        }
        ()
      }.start()
    try {
      source.addData((1L, text, at(0))); q.processAllAvailable()
      // an unrelated doc advances the watermark past doc 1's horizon
      source.addData((2L, "one two three four five six seven eight nine ten",
        at(10))); q.processAllAvailable()
      // doc 1's exact copy arrives at +12 min: doc 1 was trimmed from
      // every bucket, so NO (1, 3) hit may emit
      source.addData((3L, text, at(12))); q.processAllAvailable()
    } finally q.stop()
    assert(!sink.exists(p => p == (1L, 3L)),
      s"evicted entry still matched: $sink")
  }

  test("hot-bucket cap bounds retained members; drops are counted") {
    // 30 IDENTICAL docs collide in EVERY band -> one hot bucket per
    // band key; cap=8 must bound state and count evictions, and the
    // capped run still matches new arrivals against the RETAINED set
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val hits = StreamingNearDup.hits(
      source.toDS().toDF("doc_id", "text", "ts"),
      "doc_id", "text", "ts", watermarkDelay = "1 hour",
      maxBucketMembers = 8)
    val q = hits.toDF().writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sink.synchronized {
          sink ++= b.dropDuplicates("doc_a", "doc_b")
            .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
        }
        ()
      }.start()
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    try {
      source.addData((0L until 30L).map(i => (i, boiler, T0)): _*)
      q.processAllAvailable()
      // a later arrival still matches the newest retained members
      source.addData((100L, boiler, T0))
      q.processAllAvailable()
    } finally q.stop()
    // assert the OBSERVABLE contract: the late doc matched at most cap
    // retained members, and pairs against the evicted oldest docs did
    // NOT emit for it (the accumulator is UI/monitoring surface)
    val lateHits = sink.filter(_._2 == 100L).map(_._1).toSet
    assert(lateHits.size <= 8, s"late doc matched ${lateHits.size} > cap")
    assert(lateHits.nonEmpty, "late doc must match the retained members")
    assert(lateHits.forall(_ >= 22L),
      s"late doc matched evicted (oldest) members: $lateHits")
  }
}
