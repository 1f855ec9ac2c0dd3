package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{SessEvent, Session, StreamingSessionize}

/** Streaming sessionization: gap-close parity with the batch
  * q_events_sessionize numbering, and event-time timeout closes idle
  * sessions (state does not outlive the watermark horizon). */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 1800000000L // 30 min, same as the batch twin

  private def mkEv(uid: Long, eid: Long, tsUs: Long) =
    SessEvent(uid, eid, tsUs, new java.sql.Timestamp(tsUs / 1000L))

  test("gap-close sessions match a brute-force reference on fixture events") {
    // a small deterministic slice of the real fixture: users 0..4
    val fixture = graft.queries.CoreQueries.events(spark, sf0001)
      .filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(fixture.nonEmpty)
    val far = fixture.map(_._3).max + 365L * 86400L * 1000000L

    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessEvent]
    val out = StreamingSessionize.sessions(
      source.toDS().withWatermark("ts", "0 seconds"), GapUs)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      source.addData(fixture.map { case (u, e, t) => mkEv(u, e, t) }: _*)
      q.processAllAvailable()
      // sentinel far-future event per user gap-closes every real session
      source.addData((0L until 5L).map(u => mkEv(u, 999999L + u, far)): _*)
      q.processAllAvailable()

      val got = spark.table("sess_out").as[Session].collect()
        .filter(_.start_us < far) // ignore the sentinel's own open sessions
        .map(s => (s.user_id, s.sess_id, s.n_events, s.start_us, s.end_us)).toSet

      // brute-force expected sessions per user
      val want = fixture.groupBy(_._1).flatMap { case (uid, evs) =>
        val ts = evs.map(e => (e._3, e._2)).sorted.map(_._1)
        val sessions = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
        var start = ts.head; var end = ts.head; var n = 1L
        ts.tail.foreach { t =>
          if (t - end > GapUs) { sessions += ((start, end, n)); start = t; end = t; n = 1L }
          else { end = t; n += 1L }
        }
        sessions += ((start, end, n))
        sessions.zipWithIndex.map { case ((s0, s1, cnt), i) =>
          (uid, i + 1L, cnt, s0, s1)
        }
      }.toSet
      assert(got == want, s"got ${got.size} sessions want ${want.size}")
    } finally q.stop()
  }

  test("event-time timeout closes an idle session without new events for that user") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessEvent]
    val out = StreamingSessionize.sessions(
      source.toDS().withWatermark("ts", "0 seconds"), GapUs)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout").start()
    try {
      val base = 1700000000000000L // µs
      source.addData(mkEv(7L, 1L, base), mkEv(7L, 2L, base + 60000000L))
      q.processAllAvailable()
      assert(spark.table("sess_timeout").isEmpty) // session still open

      // OTHER user's much-later event advances the watermark; user 7 has
      // no new events — only the timeout can close their session
      source.addData(mkEv(8L, 3L, base + 10L * GapUs))
      q.processAllAvailable()
      source.addData(mkEv(8L, 4L, base + 11L * GapUs))
      q.processAllAvailable()

      val got = spark.table("sess_timeout").as[Session].collect()
        .filter(_.user_id == 7L)
        .map(s => (s.sess_id, s.n_events, s.start_us, s.end_us)).toSet
      assert(got == Set((1L, 2L, base, base + 60000000L)))
    } finally q.stop()
  }

  test("numbering continues after a timeout-closed session (tombstone state)") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[SessEvent]
    val out = StreamingSessionize.sessions(
      source.toDS().withWatermark("ts", "0 seconds"), GapUs)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_resume").start()
    try {
      val base = 1700000000000000L // µs
      source.addData(mkEv(7L, 1L, base))
      q.processAllAvailable()
      // another user's event pushes the watermark past base + gap: the
      // timeout (not a user-7 event) closes user 7's first session
      source.addData(mkEv(8L, 2L, base + 3L * GapUs))
      q.processAllAvailable()
      source.addData(mkEv(8L, 3L, base + 4L * GapUs))
      q.processAllAvailable()
      assert(spark.table("sess_resume").as[Session].collect()
        .exists(s => s.user_id == 7L && s.sess_id == 1L))

      // user 7 RETURNS after the timeout; the tombstone must carry the
      // count so this session is #2, not a restart at #1
      source.addData(mkEv(7L, 4L, base + 5L * GapUs))
      q.processAllAvailable()
      source.addData(mkEv(8L, 5L, base + 9L * GapUs), mkEv(8L, 6L, base + 10L * GapUs))
      q.processAllAvailable()

      val got = spark.table("sess_resume").as[Session].collect()
        .filter(_.user_id == 7L)
        .map(s => (s.sess_id, s.n_events, s.start_us)).toSet
      assert(got == Set((1L, 1L, base), (2L, 1L, base + 5L * GapUs)), got.toString)
    } finally q.stop()
  }
}
