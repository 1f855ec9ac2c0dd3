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

  test("funnel stages are monotone non-increasing and bounded by user count") {
    val stages = q("q_events_funnel")
      .select($"stage", $"n_users").as[(Long, Long)].collect().sortBy(_._1)
    assert(stages.map(_._1).toSeq == Seq(1L, 2L, 3L))
    val counts = stages.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must shrink: ${counts.toSeq}")
    val nUsers = graft.queries.CoreQueries.events(spark, sf0001)
      .select($"user_id").distinct().count()
    assert(counts.head <= nUsers && counts.forall(_ >= 0))
  }

  test("OOV rates lie in [0,1] and in-vocab counts never exceed totals") {
    val rows = SparkEntry.queries("q_doc_oov")(spark, sf0001)
      .select($"n_tok", $"n_in", $"oov_rate").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nTok, nIn, rate) =>
      assert(nIn >= 0 && nIn <= nTok)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - (nTok - nIn).toDouble / nTok) < 1e-15)
    }
    // the top-1000 vocabulary must cover most of a natural corpus
    val mean = rows.map(_._3).sum / rows.length
    assert(mean < 0.5, s"mean OOV rate suspiciously high: $mean")
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
