package graft

import org.apache.spark.sql.functions._

/** Event-stream operators: as-of join picks the latest at-or-before view
  * with deterministic tie-breaks, sessionization splits exactly at the
  * gap threshold, and the banded interval self-join counts match a
  * brute-force reference on the fixture. */
class EventSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf0001)

  test("as-of join: every match is the latest view at-or-before the click") {
    val e = graft.queries.CoreQueries.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val views = e.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts_us".as("v_ts"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(v => (v._3, v._1)).sorted).toMap
    val out = q("q_events_asof")
      .select($"click_id", $"user_id", $"click_ts_us", $"view_id")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, uid, cts, vid) =>
      val prior = views.getOrElse(uid, Array.empty[(Long, Long)])
        .filter(_._1 <= cts)
      if (vid == -1L) assert(prior.isEmpty)
      else assert(prior.last._2 == vid) // max (ts, event_id) lexicographic
    }
  }

  test("sessionization: consecutive events in one session gap <= 30min, session spans sane") {
    val out = q("q_events_sessionize")
      .select($"user_id", $"sess_id", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, sess) =>
      val sorted = sess.sortBy(_._2)
      // session ids dense from 1, spans ordered and non-overlapping
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      sorted.foreach { case (_, _, n, s0, s1) =>
        assert(n >= 1 && s0 <= s1)
      }
      sorted.sliding(2).foreach {
        case Array((_, _, _, _, prevEnd), (_, _, _, nextStart, _)) =>
          assert(nextStart - prevEnd > 1800000000L) // gap forced the split
        case _ =>
      }
    }
    // total events conserved
    val total = out.map(_._3).sum
    val nEvents = graft.queries.CoreQueries.events(spark, sf0001).count()
    assert(total == nEvents)
  }

  test("banded range join matches brute force on the fixture") {
    val e = graft.queries.CoreQueries.events(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val errs = e.filter($"event_type" === "error")
      .select($"user_id", $"ts_us").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = q("q_events_range_join")
      .select($"click_id", $"user_id", $"n_nearby").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts_us").as[(Long, Long, Long)].collect()
    assert(out.length == clicks.length)
    val byClick = out.map(r => r._1 -> r._3).toMap
    clicks.foreach { case (cid, uid, cts) =>
      val want = errs.getOrElse(uid, Array.empty[Long])
        .count(t => math.abs(t - cts) <= 3600000000L)
      assert(byClick(cid) == want, s"click $cid: got ${byClick(cid)} want $want")
    }
  }
}
