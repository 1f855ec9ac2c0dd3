package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream relational operators over the `events` fixture — the
 * time-series query family a training-data/feature pipeline runs next to
 * vector search (the reference composes its vector AM with arbitrary
 * relational plans; these are the canonical time-ordered shapes Spark
 * lacks as built-ins).
 *
 * All three are single-shuffle designs that hold at 100 TB:
 *  - as-of join: one shuffle on user_id + an in-partition ordered window
 *    (never a per-row subquery / range join);
 *  - sessionization: the same single shuffle, two window passes;
 *  - interval self-join: bucketed to fixed time bins so each probe joins
 *    at most 3 bins of one user's rows — never all-pairs, skew bounded
 *    by per-user-per-bin event rate.
 *
 * Every metric is exact integer (µs timestamps) or untouched double
 * pass-through, so the DuckDB oracles are trivially bit-stable.
 * Timestamps are surfaced as epoch-µs longs (`unix_micros` ≡ DuckDB
 * `epoch_us`) — never as timestamp columns, which would re-open the
 * ns-vs-µs parquet precision mismatch.
 */
object EventQueries {

  private val SessionGapUs = 1800000000L // 30 min
  private val NearbyUs = 3600000000L     // ±1 h window = bin width

  private def ev(s: SparkSession, d: String): DataFrame =
    CoreQueries.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- AS-OF JOIN: each click matched to the latest view at-or-before
    //     it by the same user (ties broken by max event_id, so the
    //     result is a pure function of the data). Implemented as a
    //     union + one ordered window per user — the scale-correct as-of
    //     shape: a single hash shuffle on user_id, in-partition sort,
    //     last(ignoreNulls) carry-forward. Views sort before clicks at
    //     equal ts (kind 0 < 1), giving <= semantics. Unmatched clicks
    //     keep sentinel (-1, -1.0) rather than NULL so both engines
    //     produce non-nullable frames (driver compare is NULL-fragile). ---
    "q_events_asof" -> ((s, d) => {
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
      val clicks = e.filter(col("event_type") === "click")
      val vsType = "struct<vid:bigint,vval:double>"
      val tagged = views.select(col("user_id"), col("ts_us"),
          lit(0).as("kind"), col("event_id").as("eid"),
          struct(col("event_id").as("vid"), col("value").as("vval")).as("vs"))
        .unionAll(clicks.select(col("user_id"), col("ts_us"),
          lit(1).as("kind"), col("event_id").as("eid"),
          lit(null).cast(vsType).as("vs")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("kind"), col("eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged.withColumn("m", last(col("vs"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("eid").as("click_id"), col("user_id"),
          col("ts_us").as("click_ts_us"),
          coalesce(col("m.vid"), lit(-1L)).as("view_id"),
          coalesce(col("m.vval"), lit(-1.0d)).as("view_value"))
        .orderBy(col("click_id"))
    }),

    // --- SESSIONIZATION: gap-based session ids (new session when the
    //     user's inter-event gap exceeds 30 min). lag + cumulative sum
    //     over one user-partitioned ordered window; per-session span
    //     stats. All integer µs arithmetic. ---
    "q_events_sessionize" -> ((s, d) => {
      val e = ev(s, d).select(col("user_id"), col("event_id"), col("ts_us"))
      val ord = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      val flagged = e.withColumn("prev", lag(col("ts_us"), 1).over(ord))
        .withColumn("ns", when(col("prev").isNull ||
          col("ts_us") - col("prev") > SessionGapUs, 1).otherwise(0))
      flagged.withColumn("sess_id",
          sum(col("ns")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
        .orderBy(col("user_id"), col("sess_id"))
    }),

    // --- FUNNEL: users progressing view → click-after-view →
    //     purchase-after-click, each stage anchored at the earliest
    //     qualifying event (min-ts chaining, the standard funnel
    //     semantics). Three hash aggs on user_id + two key-equijoins on
    //     the per-user stage frames (user-cardinality, broadcastable at
    //     any corpus size where users << events). Integer µs only. ---
    "q_events_funnel" -> ((s, d) => {
      val e = ev(s, d)
      def stage(t: String) = e.filter(col("event_type") === t)
        .select(col("user_id"), col("ts_us"))
      val v = stage("view").groupBy("user_id").agg(min(col("ts_us")).as("v_ts"))
      val c = stage("click").join(v, "user_id")
        .filter(col("ts_us") >= col("v_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("c_ts"))
      val p = stage("purchase").join(c, "user_id")
        .filter(col("ts_us") >= col("c_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("p_ts"))
      v.agg(count(lit(1)).as("n_users")).select(lit(1L).as("stage"), col("n_users"))
        .unionAll(c.agg(count(lit(1)).as("n_users")).select(lit(2L).as("stage"), col("n_users")))
        .unionAll(p.agg(count(lit(1)).as("n_users")).select(lit(3L).as("stage"), col("n_users")))
        .orderBy(col("stage"))
    }),

    // --- BANDED INTERVAL SELF-JOIN: per click, how many error events by
    //     the same user within ±1 h. Both sides bucketed to 1 h bins;
    //     each click probes bins {b-1, b, b+1} and the exact |Δt| filter
    //     runs on the join output. An error's own bin appears exactly
    //     once among the three probes, so no double counting. This is
    //     the standard range-join-as-equijoin rewrite that survives
    //     100×: the join key (user_id, bin) caps fan-in at one user-hour
    //     of events. ---
    "q_events_range_join" -> ((s, d) => {
      val e = ev(s, d)
      val errs = e.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts_us").as("e_ts"),
          expr(s"ts_us div ${NearbyUs}L").as("bin"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts_us"),
          expr(s"ts_us div ${NearbyUs}L").as("b"))
      clicks.withColumn("bin", explode(array(col("b") - 1, col("b"), col("b") + 1)))
        .join(errs, Seq("user_id", "bin"), "left")
        .withColumn("hit", when(col("e_ts").isNotNull &&
          abs(col("e_ts") - col("ts_us")) <= NearbyUs, 1).otherwise(0))
        .groupBy(col("click_id"), col("user_id"))
        .agg(sum(col("hit")).cast("long").as("n_nearby"))
        .orderBy(col("click_id"))
    })
  )

  val oracles: Map[String, String] = Map(

    // Deterministic two-step replay of the (ts, event_id)-lexicographic
    // as-of match: max prior ts, then max event_id among views at that ts.
    "q_events_asof" ->
      s"""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
          v AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events WHERE event_type = 'view'),
          m AS (SELECT c.event_id AS click_id, c.user_id AS user_id, c.ts_us AS click_ts_us, max(v.ts_us) AS best_ts
                FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.ts_us <= c.ts_us
                GROUP BY 1, 2, 3),
          m2 AS (SELECT m.click_id, m.user_id, m.click_ts_us, max(v.event_id) AS view_id
                 FROM m LEFT JOIN v ON v.user_id = m.user_id AND v.ts_us = m.best_ts
                 GROUP BY 1, 2, 3)
          SELECT m2.click_id, m2.user_id, m2.click_ts_us,
                 coalesce(m2.view_id, CAST(-1 AS BIGINT)) AS view_id,
                 coalesce(v2.value, -1.0) AS view_value
          FROM m2 LEFT JOIN v v2 ON v2.event_id = m2.view_id
          ORDER BY click_id""",

    "q_events_sessionize" ->
      s"""WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                       lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
                     FROM events),
          s AS (SELECT user_id, event_id, ts_us,
                  CASE WHEN prev IS NULL OR ts_us - prev > ${SessionGapUs} THEN 1 ELSE 0 END AS ns FROM o),
          t AS (SELECT user_id, ts_us,
                  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id FROM s)
          SELECT user_id, sess_id, count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us
          FROM t GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_events_funnel" ->
      s"""WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_ts FROM events
                     WHERE event_type = 'view' GROUP BY 1),
          c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS c_ts FROM events e
                JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.v_ts GROUP BY 1),
          p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS p_ts FROM events e
                JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.c_ts GROUP BY 1)
          SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS stage, count(*) AS n_users FROM v
            UNION ALL SELECT CAST(2 AS BIGINT), count(*) FROM c
            UNION ALL SELECT CAST(3 AS BIGINT), count(*) FROM p)
          ORDER BY stage""",

    "q_events_range_join" ->
      s"""WITH c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'click'),
          e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events WHERE event_type = 'error')
          SELECT c.click_id, c.user_id, count(e.event_id) AS n_nearby
          FROM c LEFT JOIN e ON e.user_id = c.user_id AND abs(e.ts_us - c.ts_us) <= ${NearbyUs}
          GROUP BY 1, 2 ORDER BY 1"""
  )
}
