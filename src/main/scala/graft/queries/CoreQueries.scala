package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.ParquetCache.read(spark, s"$dir/$name.parquet")

  /** Driver-side cache of the tiny per-dir fixture fetches (query
    * vectors, sparse query terms, query batches): deterministic per data
    * dir, a handful of rows each — but every ANN query would otherwise
    * pay a separate Spark job (scan+filter+head) to re-read them. The
    * fixtures are immutable test inputs, so no invalidation is needed. */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def fixture[T <: AnyRef](key: String)(f: => T): T =
    fixtureCache.computeIfAbsent(key, _ => f).asInstanceOf[T]

  /** Round 18 (guide §2, scale-adaptive partitioning): spread the input
    * of a per-row-EXPENSIVE kernel pass (shingle sets, plane dots,
    * per-pair distance verify) across the session's cores when the scan
    * offers fewer partitions. The bench fixtures are single-file,
    * single-ROW-GROUP parquet, which no split setting can parallelize —
    * measured round 18: q_ngram_top's whole shingle pass ran as ONE
    * 0.44 s task on 32 cores. The moved bytes are the kernel input,
    * small by premise; a corpus big enough for the shuffle to matter
    * arrives in many splits and takes the no-op branch, so nothing is
    * tuned to local[32]. ONLY for queries whose downstream aggregation
    * is partition-order-insensitive (integer counts, per-row/per-pair
    * kernels, per-key sorted folds) — never in front of a cross-row
    * float accumulation, which the oracle float-parity contract pins to
    * single-partition merge order. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}

/**
 * Core query inventory: dense vector expressions + relational plumbing,
 * each with a DuckDB-expressible oracle (exact float/double parity: all
 * kernels accumulate sequentially in double, matching the oracle's
 * list_aggregate chains).
 *
 * Scale notes: every query here is a single scan + (at most) one
 * broadcast-able self-join on a key or a constant-size dimension — no
 * quadratic joins, no driver-side collects; all top-k run through
 * TakeOrderedAndProject (k-bounded per partition, then merged).
 */
object CoreQueries {
  import Tables.t

  // DuckDB lambda snippets for float->double exact distance parity.
  private def dzip(f: String) =
    s"list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> $f), 'sum')"
  private val dL2 = dzip("(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")
  private val dDot = dzip("CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)")
  private def qzip(f: String) =
    s"list_aggregate(list_transform(list_zip(e.embedding, q.qv), p -> $f), 'sum')"
  private val qL2 = qzip("(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))")
  private val qDot = qzip("CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)")
  private val selfDot =
    "list_aggregate(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
  private val qvDot =
    "list_aggregate(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"

  /** Pairs (i, i+1) of embeddings — a key-equijoin (broadcastable; at scale
    * this co-partitions on vec_id, no cross product). */
  private def pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val a = e.select(col("vec_id"), col("embedding"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("emb_b"))
    a.join(b, "vec_id")
  }

  /** Normalizes events.ts to a session-tz TimestampType regardless of how
    * the fixture was written. Generations of the driver's testdata have
    * shipped ts as TIMESTAMP(NANOS) (Spark reads it only as a long under
    * the legacy conf; integer `div` 1000, not `/` — epoch-ns ~2^60
    * exceeds double's 53-bit mantissa) and as timestamp[us] without tz
    * (Spark reads TIMESTAMP_NTZ). The session tz is pinned to UTC here so
    * the NTZ→TZ cast surfaces exactly the stored µs value — the same
    * number DuckDB's `epoch_us` returns for a naive timestamp. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(spark, dir, "events"))
  }

  /** Type-dispatched ts normalization shared with the streaming specs
    * (their file-stream reads see the same fixture schema). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  private def queryVec(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  /** Build-once versioned segment store for a data dir: base = embeddings,
    * reinsert ids < 30 with bumped labels, delete ids ending in 3. */
  def ensureSegments(s: SparkSession, d: String): String = {
    import graft.operators.Segments
    val dir = sys.props("java.io.tmpdir") + "/graft_segments_" +
      d.replaceAll("[^a-zA-Z0-9]", "_")
    Segments.synchronized {
      if (Segments.state(dir).gen < 0) {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("label"))
        Segments.init(s, dir, e, "vec_id")
        Segments.append(s, dir, e.filter(col("vec_id") < 30)
          .select(col("vec_id"), (col("label") + 1000).as("label")), "vec_id")
        Segments.delete(s, dir,
          e.filter(col("vec_id") % 10 === 3).select(col("vec_id")), "vec_id")
      }
    }
    dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational baseline (scan + partial agg; no vector code) ---
    "q1_lineitem_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // --- dense distance expressions over a key self-join ---
    "q_l2sq_pairs" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
        l2sq(col("embedding"), col("emb_b")).as("dist")).orderBy(col("vec_id"))
    }),
    "q_negdot_pairs" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
        negdot(col("embedding"), col("emb_b")).as("dist")).orderBy(col("vec_id"))
    }),
    "q_cosdist_pairs" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
        cosdist(col("embedding"), col("emb_b")).as("dist")).orderBy(col("vec_id"))
    }),

    // --- element-wise arithmetic + scalar functions ---
    // (array results are exploded to scalar rows: the driver's pandas
    //  compare sorts by every column and can't sort ndarray cells)
    "q_vec_arith" -> ((s, d) => {
      pairs(s, d).select(
          col("vec_id"),
          vecAdd(col("embedding"), col("emb_b")).as("v_add"),
          vecSub(col("embedding"), col("emb_b")).as("v_sub"),
          vecMul(col("embedding"), col("emb_b")).as("v_mul"))
        .select(col("vec_id"),
          posexplode(arrays_zip(col("v_add"), col("v_sub"), col("v_mul")))
            .as(Seq("i", "z")))
        .select(col("vec_id"), col("i").cast("long").as("i"),
          col("z.v_add").as("x_add"), col("z.v_sub").as("x_sub"),
          col("z.v_mul").as("x_mul"))
        .orderBy(col("vec_id"), col("i"))
    }),
    "q_vec_norm" -> ((s, d) => {
      t(s, d, "embeddings").select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dims"),
          vectorNorm(col("embedding")).as("nrm"),
          vectorNormalize(col("embedding")).as("unit"))
        // graft posexplode (round 18): ExplodeBase + inferred-filter
        // pushdown evaluated vector_normalize 3x per row
        .select(col("vec_id"), col("dims"), col("nrm"),
          graft.functions.GraftExplode.posexplodeOnce(col("unit"))
            .as(Seq("i", "unit_x")))
        .select(col("vec_id"), col("dims"), col("nrm"),
          col("i").cast("long").as("i"), col("unit_x"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- text I/O: parse a literal built from table ints ---
    "q_parse_vector" -> ((s, d) => {
      val c = t(s, d, "customer")
      c.select(col("c_custkey"),
          parseVector(concat(lit("["), col("c_custkey"), lit(", "),
            col("c_nationkey"), lit("]"))).as("v"))
        .select(col("c_custkey"),
          element_at(col("v"), 1).as("v1"), element_at(col("v"), 2).as("v2"),
          vectorNorm(col("v")).as("nrm"))
        .orderBy(col("c_custkey"))
    }),
    // format->parse roundtrip must be exact (shortest-roundtrip floats)
    "q_format_roundtrip" -> ((s, d) => {
      t(s, d, "embeddings").select(col("vec_id"),
          (parseVector(formatVector(col("embedding"))) === col("embedding"))
            .as("roundtrip_ok"))
        .orderBy(col("vec_id"))
    }),

    // --- exact top-k (flat path analog: TakeOrderedAndProject) ---
    "q_topk_l2" -> ((s, d) => {
      val e = t(s, d, "embeddings").as("e")
      e.crossJoin(broadcast(queryVec(s, d)))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), l2sq(col("embedding"), col("qv")).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(100)
    }),
    // --- TPC-H Q3 analog (shipping priority): the canonical
    //     fact-fact-dim join. The customer dimension filter broadcasts
    //     (small side), orders⋈lineitem co-shuffles on the order key,
    //     date filters push to both parquet scans, revenue is a
    //     map-side partial sum, and the top-10 runs through
    //     TakeOrderedAndProject. Dates surface as strings (the
    //     q_events_window precedent — no timestamp dtype compare). ---
    "q3_shipping" -> ((s, d) => {
      val cut = lit("1996-06-30").cast("timestamp")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_orderdate") < cut)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > cut)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      // no broadcast() hint on customer: it is NOT dim-sized at high SF —
      // AQE broadcasts it while it fits and falls back to a shuffle join
      // beyond that, which is the plan that survives 100×
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    }),

    // --- TPC-H Q6 analog (forecasting revenue): the pure
    //     scan-and-aggregate shape — every predicate reaches the parquet
    //     scan (PushedFilters), the sum partial-aggregates map-side, no
    //     shuffle beyond the single-row final agg. ---
    "q6_forecast_revenue" -> ((s, d) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
          .as("revenue"))
    }),

    // --- TPC-H Q5 analog (local supplier volume): five-way join where
    //     the dim-sized sides (supplier/nation/region) broadcast and
    //     customer joins adaptively (broadcast while it fits, shuffle
    //     beyond); the remaining shuffles are lineitem⋈orders and the
    //     final nation-keyed agg. The same-nation (customer = supplier)
    //     filter rides the join condition. ---
    "q5_region_volume" -> ((s, d) => {
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1997-01-01").cast("timestamp")
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
        .select(col("o_orderkey"), col("o_custkey"))
      val l = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
        .select(col("r_regionkey"))
      // customer carries no broadcast() hint (see q3_shipping); the true
      // dimension sides (supplier/nation/region) always broadcast
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // --- MAXSIM late-interaction retrieval (ColBERT-style): documents
    //     are groups of 4 token-vectors (gid = vec_id div 4), the query
    //     is gid 0's 4 vectors; score(g) = Σ_i max_j dot(q_i, d_j).
    //     One broadcast of the 4-row query set, pairwise codegen dots,
    //     then ONE hash agg on gid with per-position conditional maxes —
    //     max is order-insensitive and the final 4-term sum is a fixed
    //     left-assoc chain, so the double result is deterministic and
    //     the oracle replays it term-for-term. Scale: one shuffle on
    //     gid, map-side partial maxes; never materializes the per-pair
    //     frame. ---
    "q_maxsim_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings").filter(col("vec_id") >= 4)
        .select(org.apache.spark.sql.functions.expr("vec_id div 4").as("gid"),
          col("embedding"))
      val qset = t(s, d, "embeddings").filter(col("vec_id") < 4)
        .select(col("vec_id").as("qpos"), col("embedding").as("qv"))
      def m(i: Int) = max(when(col("qpos") === i, col("dotv"))).as(s"m$i")
      e.crossJoin(broadcast(qset))
        .select(col("gid"), col("qpos"),
          (-negdot(col("embedding"), col("qv"))).as("dotv"))
        .groupBy(col("gid")).agg(m(0), m(1), m(2), m(3))
        .select(col("gid"),
          (col("m0") + col("m1") + col("m2") + col("m3")).as("score"))
        .orderBy(col("score").desc, col("gid")).limit(50)
    }),
    "q_topk_dot" -> ((s, d) => {
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), negdot(col("embedding"), col("qv")).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(100)
    }),
    "q_topk_cos" -> ((s, d) => {
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"), cosdist(col("embedding"), col("qv")).as("dist"))
        .orderBy(col("dist"), col("vec_id")).limit(100)
    }),

    // --- within-radius (sphere) + combined filter+orderby
    //     (pushdown_range.slt analog) ---
    "q_range_l2" -> ((s, d) => {
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"), col("label"),
          l2sq(col("embedding"), col("qv")).as("dist"))
        .filter(col("dist") < 1.5)
        .orderBy(col("vec_id"))
    }),
    "q_range_and_topk" -> ((s, d) => {
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"),
          l2sq(col("embedding"), col("qv")).as("dist"),
          cosdist(col("embedding"), col("qv")).as("cdist"))
        .filter(col("dist") < 2.5)
        .orderBy(col("cdist"), col("vec_id")).limit(50)
        .select(col("vec_id"), col("dist"))
    }),

    // --- top-k per group via window (batch many-query evaluation) ---
    "q_topk_per_label" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("label"))
        .orderBy(col("dist"), col("vec_id"))
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .select(col("label"), col("vec_id"),
          l2sq(col("embedding"), col("qv")).as("dist"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("label"), col("vec_id"), col("dist"), col("rn"))
        .orderBy(col("label"), col("rn"))
    }),

    // --- the VBASE flagship composition (README.md:23 "Single-Vector
    //     TopK + Filter + Join"): vector top-k composes with a dimension
    //     join and a post-join filter without losing results — top-k runs
    //     AFTER the filter so the contract is "k best matching rows" ---
    "q_topk_filter_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"))
      t(s, d, "embeddings").crossJoin(broadcast(queryVec(s, d)))
        .select(col("vec_id"), l2sq(col("embedding"), col("qv")).as("dist"))
        .join(docs, col("vec_id") === col("doc_id"))
        .filter(col("lang") === "en")
        .select(col("vec_id"), col("dist"), col("lang"), col("source"))
        .orderBy(col("dist"), col("vec_id")).limit(25)
    }),

    // --- tombstone delete semantics (delete.rs analog: anti-join) ---
    "q_tombstone_antijoin" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val tomb = e.filter(col("vec_id") % 10 === 3).select(col("vec_id"))
      e.join(tomb, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label")).orderBy(col("vec_id"))
    }),

    // --- versioned segment scan: base ∪ growing delta minus versioned
    //     tombstones (delete.rs:10-75; growing.rs:132-158). Store built
    //     once per data dir; the query is the snapshot read. ---
    "q_versioned_scan" -> ((s, d) => {
      import graft.operators.Segments
      val dir = ensureSegments(s, d)
      Segments.read(s, dir, "vec_id")
        .select(col("vec_id"), col("label"), col("_ver").as("ver"))
        .orderBy(col("vec_id"))
    }),

    // --- events: time-window aggregation (streaming-maintenance analog,
    //     batch form; Structured Streaming variant in tests) ---
    "q_events_window" -> ((s, d) => {
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 3).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("cnt"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         count(*) AS cnt
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_l2sq_pairs" ->
      s"""SELECT a.vec_id AS vec_id, $dL2 AS dist
          FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          ORDER BY vec_id""",
    "q_negdot_pairs" ->
      s"""SELECT a.vec_id AS vec_id, -($dDot) AS dist
          FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          ORDER BY vec_id""",
    "q_cosdist_pairs" ->
      s"""SELECT a.vec_id AS vec_id,
          1.0 - ($dDot) / sqrt(
            list_aggregate(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
            * list_aggregate(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS dist
          FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
          ORDER BY vec_id""",

    "q_vec_arith" ->
      """SELECT a.vec_id AS vec_id,
         unnest(range(len(a.embedding))) AS i,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> p[1] + p[2])) AS x_add,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> p[1] - p[2])) AS x_sub,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> p[1] * p[2])) AS x_mul
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         ORDER BY vec_id, i""",
    "q_vec_norm" ->
      """SELECT vec_id, len(embedding) AS dims,
         sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm,
         unnest(range(len(embedding))) AS i,
         unnest(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) / sqrt(list_aggregate(list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) AS FLOAT))) AS unit_x
         FROM embeddings ORDER BY vec_id, i""",

    "q_parse_vector" ->
      """SELECT c_custkey,
         CAST(c_custkey AS FLOAT) AS v1, CAST(c_nationkey AS FLOAT) AS v2,
         sqrt(CAST(c_custkey AS DOUBLE) * CAST(c_custkey AS DOUBLE)
            + CAST(c_nationkey AS DOUBLE) * CAST(c_nationkey AS DOUBLE)) AS nrm
         FROM customer ORDER BY c_custkey""",
    "q_format_roundtrip" ->
      "SELECT vec_id, TRUE AS roundtrip_ok FROM embeddings ORDER BY vec_id",

    "q_topk_l2" ->
      s"""SELECT e.vec_id AS vec_id, $qL2 AS dist
          FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id <> 0 ORDER BY dist, vec_id LIMIT 100""",
    "q_topk_dot" ->
      s"""SELECT e.vec_id AS vec_id, -($qDot) AS dist
          FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id <> 0 ORDER BY dist, vec_id LIMIT 100""",
    "q_topk_cos" ->
      s"""SELECT e.vec_id AS vec_id, 1.0 - ($qDot) / sqrt($selfDot * $qvDot) AS dist
          FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE e.vec_id <> 0 ORDER BY dist, vec_id LIMIT 100""",

    "q_range_l2" ->
      s"""SELECT e.vec_id AS vec_id, e.label AS label, $qL2 AS dist
          FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          WHERE $qL2 < 1.5 ORDER BY vec_id""",
    "q_range_and_topk" ->
      s"""SELECT vec_id, dist FROM (
            SELECT e.vec_id AS vec_id, $qL2 AS dist,
              1.0 - ($qDot) / sqrt($selfDot * $qvDot) AS cdist
            FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q)
          WHERE dist < 2.5 ORDER BY cdist, vec_id LIMIT 50""",

    "q_topk_per_label" ->
      s"""SELECT label, vec_id, dist, rn FROM (
            SELECT e.label AS label, e.vec_id AS vec_id, $qL2 AS dist,
              row_number() OVER (PARTITION BY e.label ORDER BY $qL2, e.vec_id) AS rn
            FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q)
          WHERE rn <= 3 ORDER BY label, rn""",

    "q_topk_filter_join" ->
      s"""SELECT e.vec_id AS vec_id, $qL2 AS dist, d.lang AS lang, d.source AS source
          FROM embeddings e
          CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
          JOIN documents d ON e.vec_id = d.doc_id
          WHERE d.lang = 'en'
          ORDER BY dist, vec_id LIMIT 25""",

    "q_tombstone_antijoin" ->
      """SELECT vec_id, label FROM embeddings
         WHERE NOT EXISTS (SELECT 1 FROM embeddings t
           WHERE t.vec_id % 10 = 3 AND t.vec_id = embeddings.vec_id)
         ORDER BY vec_id""",

    "q_versioned_scan" ->
      """SELECT vec_id,
         CASE WHEN vec_id < 30 THEN label + 1000 ELSE label END AS label,
         CAST(CASE WHEN vec_id < 30 THEN 1 ELSE 0 END AS BIGINT) AS ver
         FROM embeddings WHERE vec_id % 10 <> 3 ORDER BY vec_id""",

    "q3_shipping" ->
      """SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
           SELECT l.l_orderkey AS l_orderkey,
                  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
                  o.o_orderpriority AS o_orderpriority
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE c.c_mktsegment = 'BUILDING'
             AND o.o_orderdate < TIMESTAMP '1996-06-30'
             AND l.l_shipdate > TIMESTAMP '1996-06-30'
           GROUP BY 1, 3, 4)
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",

    "q6_forecast_revenue" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",

    "q5_region_volume" ->
      """SELECT n.n_name AS n_name,
                round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'ASIA'
           AND o.o_orderdate >= TIMESTAMP '1996-01-01'
           AND o.o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",

    "q_maxsim_topk" ->
      """WITH q AS (SELECT vec_id AS qpos, embedding AS qv FROM embeddings WHERE vec_id < 4),
         e AS (SELECT vec_id // 4 AS gid, embedding FROM embeddings WHERE vec_id >= 4),
         p AS (SELECT e.gid, q.qpos,
                 list_aggregate(list_transform(list_zip(e.embedding, q.qv),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS dotv
               FROM e, q)
         SELECT gid, max(CASE WHEN qpos = 0 THEN dotv END)
                   + max(CASE WHEN qpos = 1 THEN dotv END)
                   + max(CASE WHEN qpos = 2 THEN dotv END)
                   + max(CASE WHEN qpos = 3 THEN dotv END) AS score
         FROM p GROUP BY gid ORDER BY score DESC, gid LIMIT 50""",

    "q_events_window" ->
      """SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS cnt, round(sum(value), 3) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
