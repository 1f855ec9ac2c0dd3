package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Query inventory for the sparse/binary/f16 type surface, comparisons,
 * slicing, casts and vector aggregates (SURVEY §2.2, §2.4).
 *
 * svectors are constructed deterministically by sparsifying the
 * embeddings (|x| > 0.15 kept); bvectors via binarize (bit = x > 0).
 * Oracles compute the same results from the dense lists — kernels iterate
 * in increasing index order with double accumulation so zero terms are
 * exact identities.
 */
object TypeQueries {
  import Tables.t

  /** sparsified dense vector: keep |x| > 0.15, else exact zero. */
  private def sparsified(c: org.apache.spark.sql.Column) =
    transform(c, x => when(abs(x) > lit(0.15), x).otherwise(lit(0.0f)))

  private val sparseSql =
    "list_transform(%s, x -> CASE WHEN abs(x) > CAST(0.15 AS DOUBLE) THEN x ELSE CAST(0 AS FLOAT) END)"

  private def pairs(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val a = e.select(col("vec_id"), col("embedding"))
    val b = e.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("emb_b"))
    a.join(b, "vec_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- svector distances over sparsified pairs ---
    "q_svec_dist" -> ((s, d) => {
      pairs(s, d).select(
          col("vec_id"),
          svecFromDense(sparsified(col("embedding"))).as("sa"),
          svecFromDense(sparsified(col("emb_b"))).as("sb"))
        .select(col("vec_id"),
          svecL2sq(col("sa"), col("sb")).as("l2"),
          svecNegdot(col("sa"), col("sb")).as("nd"),
          svecCosdist(col("sa"), col("sb")).as("cd"),
          svecNorm(col("sa")).as("nrm"),
          size(col("sa.indexes")).cast("long").as("nnz"))
        .orderBy(col("vec_id"))
    }),

    // --- svector arithmetic (merge-join on indexes; zero results drop) ---
    "q_svec_arith" -> ((s, d) => {
      pairs(s, d).select(
          col("vec_id"),
          svecFromDense(sparsified(col("embedding"))).as("sa"),
          svecFromDense(sparsified(col("emb_b"))).as("sb"))
        .select(col("vec_id"),
          svecToDense(svecAdd(col("sa"), col("sb"))).as("v_add"),
          svecToDense(svecSub(col("sa"), col("sb"))).as("v_sub"),
          svecToDense(svecMul(col("sa"), col("sb"))).as("v_mul"),
          size(col("sa.indexes")).cast("long").as("nnz_a"))
        .select(col("vec_id"), col("nnz_a"),
          posexplode(arrays_zip(col("v_add"), col("v_sub"), col("v_mul")))
            .as(Seq("i", "z")))
        .select(col("vec_id"), col("nnz_a"), col("i").cast("long").as("i"),
          col("z.v_add").as("x_add"), col("z.v_sub").as("x_sub"),
          col("z.v_mul").as("x_mul"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- to_svector constructor + parse/format roundtrip ---
    "q_to_svector" -> ((s, d) => {
      val c = t(s, d, "customer")
      // indexes (c_nationkey, 24 - c_nationkey mod 25 range) guaranteed
      // distinct & < 32; one zero value to exercise zero-dropping
      c.select(col("c_custkey"),
          toSVector(lit(32),
            array(col("c_nationkey").cast("int"), (col("c_nationkey") + 7).cast("int")),
            array(col("c_acctbal").cast("float"), lit(0.0f))).as("sv"))
        .select(col("c_custkey"), col("sv.dims").cast("int").as("dims"),
          size(col("sv.indexes")).cast("long").as("nnz"),
          element_at(col("sv.indexes"), 1).as("idx0"),
          element_at(col("sv.values"), 1).as("val0"),
          (parseSVector(formatSVector(col("sv"))) === col("sv")).as("roundtrip_ok"))
        .orderBy(col("c_custkey"))
    }),

    // --- bvector distances (hamming / negdot / jaccard) ---
    "q_bvec_dist" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
          binarize(col("embedding")).as("ba"), binarize(col("emb_b")).as("bb"))
        .select(col("vec_id"),
          bvecHamming(col("ba"), col("bb")).as("hamming"),
          bvecNegdot(col("ba"), col("bb")).as("nd"),
          bvecJaccard(col("ba"), col("bb")).as("jac"),
          bvecNorm(col("ba")).as("nrm"))
        .orderBy(col("vec_id"))
    }),

    // --- bvector Jaccard sphere predicate (the reference's `<<~>>`
    //     strategy-2 member, finalize.sql sphere_bvector): rows within a
    //     Jaccard distance of the binarized query. Scan + codegen filter
    //     (no index needed — the seq-scan form of the opclass member);
    //     1 - |A∩B|/|A∪B| is an exact long-ratio IEEE division, so the
    //     oracle replays it bit-for-bit. ---
    "q_range_jaccard" -> ((s, d) => {
      val qv = t(s, d, "embeddings").filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"))
      t(s, d, "embeddings").crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          bvecJaccard(binarize(col("embedding")), binarize(col("qe"))).as("dist"))
        .filter(col("dist") < lit(0.48))
        .orderBy(col("vec_id"))
    }),

    // --- bvector bit ops (& | ^) ---
    "q_bvec_ops" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
          binarize(col("embedding")).as("ba"), binarize(col("emb_b")).as("bb"))
        .select(col("vec_id"),
          bvecToDense(bvecAnd(col("ba"), col("bb"))).as("v_and"),
          bvecToDense(bvecOr(col("ba"), col("bb"))).as("v_or"),
          bvecToDense(bvecXor(col("ba"), col("bb"))).as("v_xor"),
          (parseBVector(formatBVector(col("ba"))) === col("ba")).as("roundtrip_ok"))
        .select(col("vec_id"), col("roundtrip_ok"),
          posexplode(arrays_zip(col("v_and"), col("v_or"), col("v_xor")))
            .as(Seq("i", "z")))
        .select(col("vec_id"), col("roundtrip_ok"), col("i").cast("long").as("i"),
          col("z.v_and").as("x_and"), col("z.v_or").as("x_or"),
          col("z.v_xor").as("x_xor"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- vecf16: f16 storage rounding is exact on small ints, so the
    //     end-to-end f16 path has an exact oracle ---
    "q_vecf16_dist" -> ((s, d) => {
      val c = t(s, d, "customer")
      val v16 = toVecf16(parseVector(concat(lit("["), col("c_nationkey"),
        lit(", "), col("c_custkey") % 100, lit("]"))))
      c.select(col("c_custkey"), v16.as("v"))
        .select(col("c_custkey"),
          l2sq(col("v"), toVecf16(parseVector(lit("[12, 50]")))).as("dist"),
          formatVector(col("v")).as("txt"))
        .orderBy(col("c_custkey"))
    }),

    // --- vecf16-DOMAIN arithmetic (round 13; finalize.sql:97-148,
    //     operators_vecf16.rs:7-14): each op rounds its f32 result back
    //     through binary16, unlike the dense vec_add family. Small-int
    //     inputs keep every op's result f16-exact (|mul| <= 1140 <
    //     2048), so the oracle replays in plain integer float math. ---
    "q_vecf16_arith" -> ((s, d) => {
      val c = t(s, d, "customer")
      def v16(body: org.apache.spark.sql.Column) = toVecf16(parseVector(concat(lit("["), body, lit("]"))))
      val va = v16(concat(col("c_nationkey"), lit(", "), col("c_custkey") % 30))
      val vb = v16(concat((col("c_custkey") % 25) + 1, lit(", "),
        col("c_nationkey") * 2 - 10))
      c.select(col("c_custkey"),
          f16Add(va, vb).as("x_add"), f16Sub(va, vb).as("x_sub"),
          f16Mul(va, vb).as("x_mul"))
        .select(col("c_custkey"),
          posexplode(arrays_zip(col("x_add"), col("x_sub"), col("x_mul")))
            .as(Seq("i", "z")))
        .select(col("c_custkey"), col("i").cast("long").as("i"),
          col("z.x_add").as("x_add"), col("z.x_sub").as("x_sub"),
          col("z.x_mul").as("x_mul"))
        .orderBy(col("c_custkey"), col("i"))
    }),

    // --- vecf16 normalize (finalize.sql:628-629) + the dispatching
    //     vector_normalize SQL overload: per-row ROTATED pattern
    //     (6,2,2,2,4)*scale has sum-of-squares 64*scale^2, so every
    //     normalized element is an exact dyadic (0.75/0.25/0.5) — the
    //     f16 result rounding is the identity and the f32 dispatch path
    //     computes the identical values, both replayable exactly. ---
    "q_vecf16_normalize" -> ((s, d) => {
      val c = t(s, d, "customer")
      val scale = (col("c_custkey") % 7 + 1).cast("int")
      val rot = (col("c_custkey") % 5).cast("int")
      val pat = array(lit(6), lit(2), lit(2), lit(2), lit(4))
      val vn = transform(sequence(lit(0), lit(4)),
        i => (element_at(pat, ((i + rot) % 5) + 1) * scale).cast("float"))
      c.select(col("c_custkey"), toVecf16(vn).as("vn"))
        .selectExpr("c_custkey", "f16_normalize(vn) AS nx",
          "vector_normalize(vn) AS dx")
        .select(col("c_custkey"),
          posexplode(arrays_zip(col("nx"), col("dx"))).as(Seq("i", "z")))
        .select(col("c_custkey"), col("i").cast("long").as("i"),
          col("z.nx").as("x_f16"), col("z.dx").as("x_f32"))
        .orderBy(col("c_custkey"), col("i"))
    }),

    // --- svector normalize (finalize.sql:631-632): CSR values / ||v||,
    //     norm over the nonzeros in index order == the dense chain with
    //     exact zero terms, so the densified view replays in DuckDB.
    //     Both the direct svec_normalize and the dispatching
    //     vector_normalize overload are gated. ---
    "q_svec_normalize" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("vec_id"), svecFromDense(sparsified(col("embedding"))).as("sv"))
        .selectExpr("vec_id", "svec_to_dense(svec_normalize(sv)) AS nv",
          "svec_to_dense(vector_normalize(sv)) AS dv")
        .select(col("vec_id"),
          posexplode(arrays_zip(col("nv"), col("dv"))).as(Seq("i", "z")))
        .select(col("vec_id"), col("i").cast("long").as("i"),
          col("z.nv").as("x_n"), col("z.dv").as("x_d"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- lexicographic comparison ---
    "q_vec_compare" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
          vecCompare(col("embedding"), col("emb_b")).as("cmp"),
          (vecCompare(col("embedding"), col("emb_b")) < 0).as("lt"),
          (vecCompare(col("embedding"), col("embedding")) === 0).as("self_eq"))
        .orderBy(col("vec_id"))
    }),

    // --- subscript slice: in-bounds slices plus the no-clamp NULL
    //     contract (hi > dims is NULL, not a clamped slice —
    //     vect.rs subvector returns None past the end) ---
    "q_vec_slice" -> ((s, d) => {
      t(s, d, "embeddings").select(col("vec_id"),
          vecSlice(col("embedding"), lit(100), lit(120)).isNull.as("oob_is_null"),
          vecSlice(col("embedding"), lit(60), lit(100)).isNull.as("overend_is_null"),
          concat(
            vecSlice(col("embedding"), lit(8), lit(24)),
            vecSlice(col("embedding"), lit(60), lit(64)),
            svecToDense(svecSlice(svecFromDense(sparsified(col("embedding"))),
              lit(8), lit(24)))).as("allx"))
        // graft posexplode (round 18): avoids the inferred-filter clone
        // of the slice/concat chain (see GraftExplode doc)
        .select(col("vec_id"), col("oob_is_null"), col("overend_is_null"),
          graft.functions.GraftExplode.posexplodeOnce(col("allx"))
            .as(Seq("i", "x")))
        .select(col("vec_id"), col("oob_is_null"), col("overend_is_null"),
          col("i").cast("long").as("i"), col("x"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- casts: real[] (double) -> vector (f32) ---
    "q_cast_vector" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          array(col("l_quantity"), col("l_discount"), col("l_tax"))
            .cast("array<float>").as("v"))
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(col("v"), 1).as("v1"), element_at(col("v"), 2).as("v2"),
          element_at(col("v"), 3).as("v3"),
          vectorNorm(col("v")).as("nrm"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // --- sphere construct + within-radius predicate over the struct ---
    "q_sphere" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.filter(col("vec_id") === 0)
        .select(struct(col("embedding").as("center"), lit(1.5).as("radius")).as("sph"))
      e.crossJoin(broadcast(q))
        .select(col("vec_id"), l2sq(col("embedding"), col("sph.center")).as("dist"),
          col("sph.radius").as("radius"))
        .filter(col("dist") < col("radius"))
        .orderBy(col("vec_id"))
    }),

    // --- vector aggregates: element-wise avg / sum per group ---
    "q_vec_agg" -> ((s, d) => {
      t(s, d, "embeddings").groupBy(col("label"))
        .agg(vecSum(col("embedding")).as("vsum"),
          vecAvg(col("embedding")).as("vavg"),
          count(lit(1)).as("cnt"))
        .select(col("label"), col("cnt"),
          posexplode(arrays_zip(col("vsum"), col("vavg"))).as(Seq("i", "z")))
        .select(col("label"), col("cnt"), col("i").cast("long").as("i"),
          col("z.vsum").as("sum_x"), col("z.vavg").as("avg_x"))
        .orderBy(col("label"), col("i"))
    }),

    // --- sparse aggregates: sum(svector) + avg(svector) per group ---
    "q_svec_agg" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("label"), svecFromDense(sparsified(col("embedding"))).as("sv"))
        .groupBy(col("label"))
        .agg(svecSumAgg(col("sv"), 64).as("ssum"),
          svecAvgAgg(col("sv"), 64).as("savg"))
        .select(col("label"),
          svecToDense(col("ssum")).as("vsum"), svecToDense(col("savg")).as("vavg"))
        .select(col("label"),
          posexplode(arrays_zip(col("vsum"), col("vavg"))).as(Seq("i", "z")))
        .select(col("label"), col("i").cast("long").as("i"),
          col("z.vsum").as("x"), col("z.vavg").as("avg_x"))
        .orderBy(col("label"), col("i"))
    }),

    // --- cast matrix: vector<->svector/bvector/vecf16 roundtrips
    //     (casts.rs:90-106; bvector casts enforce the 0/1 rule) ---
    "q_cast_matrix" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val zeroOne = bvecToDense(binarize(col("embedding")))
      e.select(col("vec_id"), col("embedding"), zeroOne.as("zo"))
        .select(col("vec_id"),
          (svecToDense(svecFromDense(col("embedding"))) === col("embedding"))
            .as("svec_roundtrip_ok"),
          (bvecToDense(castVecToBVec(col("zo"))) === col("zo"))
            .as("bvec_roundtrip_ok"),
          (toVecf16(svecToDense(svecFromDense(col("embedding"))))
            === toVecf16(col("embedding"))).as("f16_of_roundtrip_ok"),
          bvecNorm(castVecToBVec(col("zo"))).as("bnorm"))
        .orderBy(col("vec_id"))
    }),

    // --- bvector slice + svector/bvector lexicographic compare
    //     (bvect.rs:210-241, 244-276; svect.rs:404-444) ---
    "q_bvec_slice_cmp" -> ((s, d) => {
      pairs(s, d).select(col("vec_id"),
          svecFromDense(sparsified(col("embedding"))).as("sa"),
          svecFromDense(sparsified(col("emb_b"))).as("sb"),
          binarize(col("embedding")).as("ba"), binarize(col("emb_b")).as("bb"))
        .select(col("vec_id"),
          svecCompare(col("sa"), col("sb")).as("scmp"),
          bvecCompare(col("ba"), col("bb")).as("bcmp"),
          svecCompare(col("sa"), col("sa")).as("scmp_self"),
          bvecSlice(col("ba"), lit(60), lit(100)).isNull.as("oob_is_null"),
          bvecToDense(bvecSlice(col("ba"), lit(8), lit(24))).as("bmid"))
        // graft posexplode (round 18): avoids the inferred-filter clone
        // of bvec_to_dense(bvec_slice(binarize(...)))
        .select(col("vec_id"), col("scmp"), col("bcmp"), col("scmp_self"),
          col("oob_is_null"),
          graft.functions.GraftExplode.posexplodeOnce(col("bmid"))
            .as(Seq("i", "x")))
        .select(col("vec_id"), col("scmp"), col("bcmp"), col("scmp_self"),
          col("oob_is_null"), col("i").cast("long").as("i"), col("x"))
        .orderBy(col("vec_id"), col("i"))
    }),

    // --- true vecf16 storage: ShortType binary16 bit patterns + f16
    //     kernels; output formatting shows the f16 rounding (fp16.slt's
    //     0.39990234-style values) ---
    "q_vecf16_storage" -> ((s, d) => {
      val c = t(s, d, "customer")
      val v16 = toF16Bits(parseVector(concat(lit("["), col("c_nationkey"),
        lit(", "), col("c_custkey") % 100, lit("]"))))
      val q16 = toF16Bits(parseVector(lit("[12, 50]")))
      // f16 arithmetic = op on decoded exact values, re-rounded to f16
      // (products/sums of two f16s are exact in f32, so one final
      // rounding matches native half arithmetic — fp16.slt:39)
      def f16Op(f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
          a: String, b: String) =
        formatVector(f16ToVector(toF16Bits(f(
          f16ToVector(toF16Bits(parseVector(lit(a)))),
          f16ToVector(toF16Bits(parseVector(lit(b))))))))
      c.select(col("c_custkey"), v16.as("v"))
        .select(col("c_custkey"),
          f16L2sq(col("v"), q16).as("dist"),
          f16NegDot(col("v"), q16).as("nd"),
          formatVector(f16ToVector(col("v"))).as("txt"),
          formatVector(f16ToVector(toF16Bits(parseVector(lit("[0.4, 1.7]")))))
            .as("rounded"),
          f16Op(vecMul, "[1, 2, 3]", "[4, 5, 6]").as("f16_mul"),
          f16Op(vecAdd, "[1, 2, 3]", "[4, 5, 6]").as("f16_add"))
        .orderBy(col("c_custkey"))
    })
  )

  private val spA = sparseSql.format("a.embedding")
  private val spB = sparseSql.format("b.embedding")

  val oracles: Map[String, String] = Map(
    "q_svec_dist" ->
      s"""WITH p AS (SELECT a.vec_id AS vec_id, $spA AS sa, $spB AS sb
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
          SELECT vec_id,
            list_aggregate(list_transform(list_zip(sa, sb), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS l2,
            -list_aggregate(list_transform(list_zip(sa, sb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum') AS nd,
            1.0 - list_aggregate(list_transform(list_zip(sa, sb), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')
              / sqrt(list_aggregate(list_transform(sa, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')
                   * list_aggregate(list_transform(sb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS cd,
            sqrt(list_aggregate(list_transform(sa, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm,
            len(list_filter(sa, x -> x <> 0)) AS nnz
          FROM p ORDER BY vec_id""",

    "q_svec_arith" ->
      s"""WITH p AS (SELECT a.vec_id AS vec_id, $spA AS sa, $spB AS sb
            FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
          SELECT vec_id, len(list_filter(sa, x -> x <> 0)) AS nnz_a,
            unnest(range(len(sa))) AS i,
            unnest(list_transform(list_zip(sa, sb), p -> p[1] + p[2])) AS x_add,
            unnest(list_transform(list_zip(sa, sb), p -> p[1] - p[2])) AS x_sub,
            unnest(list_transform(list_zip(sa, sb), p -> p[1] * p[2] + 0)) AS x_mul
          FROM p ORDER BY vec_id, i""",

    "q_to_svector" ->
      """SELECT c_custkey, 32 AS dims,
         CAST(CASE WHEN CAST(c_acctbal AS FLOAT) = 0 THEN 0 ELSE 1 END AS BIGINT) AS nnz,
         CASE WHEN CAST(c_acctbal AS FLOAT) = 0 THEN NULL
              ELSE CAST(c_nationkey AS INT) END AS idx0,
         CASE WHEN CAST(c_acctbal AS FLOAT) = 0 THEN NULL
              ELSE CAST(c_acctbal AS FLOAT) END AS val0,
         TRUE AS roundtrip_ok
         FROM customer ORDER BY c_custkey""",

    "q_range_jaccard" ->
      """SELECT vec_id, dist FROM (
           SELECT e.vec_id AS vec_id,
             1.0 - CAST(list_aggregate(list_transform(list_zip(e.embedding, q.qe), p -> CASE WHEN p[1] > 0 AND p[2] > 0 THEN 1 ELSE 0 END), 'sum') AS DOUBLE)
                 / CAST(list_aggregate(list_transform(list_zip(e.embedding, q.qe), p -> CASE WHEN p[1] > 0 OR p[2] > 0 THEN 1 ELSE 0 END), 'sum') AS DOUBLE) AS dist
           FROM embeddings e CROSS JOIN (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
           WHERE e.vec_id <> 0)
         WHERE dist < 0.48 ORDER BY vec_id""",

    "q_bvec_dist" ->
      """SELECT a.vec_id AS vec_id,
         CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END), 'sum') AS DOUBLE) AS hamming,
         -CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CASE WHEN (p[1] > 0) AND (p[2] > 0) THEN 1 ELSE 0 END), 'sum') AS DOUBLE) AS nd,
         1.0 - CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CASE WHEN (p[1] > 0) AND (p[2] > 0) THEN 1 ELSE 0 END), 'sum') AS DOUBLE)
             / CAST(list_aggregate(list_transform(list_zip(a.embedding, b.embedding), p -> CASE WHEN (p[1] > 0) OR (p[2] > 0) THEN 1 ELSE 0 END), 'sum') AS DOUBLE) AS jac,
         sqrt(CAST(list_aggregate(list_transform(a.embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 'sum') AS DOUBLE)) AS nrm
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         ORDER BY vec_id""",

    "q_bvec_ops" ->
      """SELECT a.vec_id AS vec_id, TRUE AS roundtrip_ok,
         unnest(range(len(a.embedding))) AS i,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(CASE WHEN (p[1] > 0) AND (p[2] > 0) THEN 1 ELSE 0 END AS FLOAT))) AS x_and,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(CASE WHEN (p[1] > 0) OR (p[2] > 0) THEN 1 ELSE 0 END AS FLOAT))) AS x_or,
         unnest(list_transform(list_zip(a.embedding, b.embedding), p -> CAST(CASE WHEN (p[1] > 0) <> (p[2] > 0) THEN 1 ELSE 0 END AS FLOAT))) AS x_xor
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         ORDER BY vec_id, i""",

    "q_vecf16_dist" ->
      """SELECT c_custkey,
         (CAST(c_nationkey AS DOUBLE) - 12) * (CAST(c_nationkey AS DOUBLE) - 12)
           + (CAST(c_custkey % 100 AS DOUBLE) - 50) * (CAST(c_custkey % 100 AS DOUBLE) - 50) AS dist,
         '[' || CAST(c_nationkey AS VARCHAR) || ', ' || CAST(c_custkey % 100 AS VARCHAR) || ']' AS txt
         FROM customer ORDER BY c_custkey""",

    "q_vecf16_arith" ->
      """WITH p AS (SELECT c_custkey,
           [CAST(c_nationkey AS FLOAT), CAST(c_custkey % 30 AS FLOAT)] AS va,
           [CAST(c_custkey % 25 + 1 AS FLOAT), CAST(c_nationkey * 2 - 10 AS FLOAT)] AS vb
           FROM customer)
         SELECT c_custkey, unnest(range(2)) AS i,
           unnest(list_transform(list_zip(va, vb), p -> p[1] + p[2])) AS x_add,
           unnest(list_transform(list_zip(va, vb), p -> p[1] - p[2])) AS x_sub,
           unnest(list_transform(list_zip(va, vb), p -> p[1] * p[2])) AS x_mul
         FROM p ORDER BY c_custkey, i""",

    "q_vecf16_normalize" ->
      """WITH v AS (SELECT c_custkey,
           list_transform(range(5), i ->
             CAST(([6, 2, 2, 2, 4])[CAST((i + c_custkey % 5) % 5 AS INT) + 1]
               * (c_custkey % 7 + 1) AS FLOAT)) AS vn
           FROM customer)
         SELECT c_custkey, unnest(range(5)) AS i,
           unnest(list_transform(vn, x -> CAST(CAST(x AS DOUBLE)
             / sqrt(list_aggregate(list_transform(vn, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) AS FLOAT))) AS x_f16,
           unnest(list_transform(vn, x -> CAST(CAST(x AS DOUBLE)
             / sqrt(list_aggregate(list_transform(vn, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) AS FLOAT))) AS x_f32
         FROM v ORDER BY c_custkey, i""",

    "q_svec_normalize" ->
      s"""WITH p AS (SELECT vec_id, ${sparseSql.format("embedding")} AS sv
            FROM embeddings)
          SELECT vec_id, unnest(range(len(sv))) AS i,
            unnest(list_transform(sv, x -> CASE WHEN x = 0 THEN CAST(0 AS FLOAT)
              ELSE CAST(CAST(x AS DOUBLE)
                / sqrt(list_aggregate(list_transform(sv, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) AS FLOAT) END)) AS x_n,
            unnest(list_transform(sv, x -> CASE WHEN x = 0 THEN CAST(0 AS FLOAT)
              ELSE CAST(CAST(x AS DOUBLE)
                / sqrt(list_aggregate(list_transform(sv, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)), 'sum')) AS FLOAT) END)) AS x_d
          FROM p ORDER BY vec_id, i""",

    "q_vec_compare" ->
      """SELECT a.vec_id AS vec_id,
         CASE WHEN a.embedding < b.embedding THEN -1 WHEN a.embedding > b.embedding THEN 1 ELSE 0 END AS cmp,
         a.embedding < b.embedding AS lt,
         TRUE AS self_eq
         FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         ORDER BY vec_id""",

    "q_vec_slice" ->
      s"""WITH s AS (SELECT vec_id,
            list_concat(list_concat(embedding[9:24], embedding[61:64]),
              (${sparseSql.format("embedding")})[9:24]) AS allx
          FROM embeddings)
          SELECT vec_id, TRUE AS oob_is_null, TRUE AS overend_is_null,
            unnest(range(len(allx))) AS i, unnest(allx) AS x
          FROM s ORDER BY vec_id, i""",

    "q_cast_vector" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS FLOAT) AS v1, CAST(l_discount AS FLOAT) AS v2,
         CAST(l_tax AS FLOAT) AS v3,
         sqrt(CAST(CAST(l_quantity AS FLOAT) AS DOUBLE) * CAST(CAST(l_quantity AS FLOAT) AS DOUBLE)
            + CAST(CAST(l_discount AS FLOAT) AS DOUBLE) * CAST(CAST(l_discount AS FLOAT) AS DOUBLE)
            + CAST(CAST(l_tax AS FLOAT) AS DOUBLE) * CAST(CAST(l_tax AS FLOAT) AS DOUBLE)) AS nrm
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",

    "q_sphere" ->
      """SELECT e.vec_id AS vec_id,
         list_aggregate(list_transform(list_zip(e.embedding, q.qv), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') AS dist,
         CAST(1.5 AS DOUBLE) AS radius
         FROM embeddings e CROSS JOIN (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         WHERE list_aggregate(list_transform(list_zip(e.embedding, q.qv), p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), 'sum') < 1.5
         ORDER BY vec_id""",

    "q_vec_agg" ->
      """WITH flat AS (
           SELECT label, unnest(embedding) AS x, unnest(range(len(embedding))) AS i
           FROM embeddings),
         sums AS (
           SELECT label, i, CAST(sum(CAST(x AS DOUBLE)) AS FLOAT) AS s,
                  CAST(sum(CAST(x AS DOUBLE)) / count(*) AS FLOAT) AS m
           FROM flat GROUP BY label, i),
         cnts AS (SELECT label, count(*) AS cnt FROM embeddings GROUP BY label)
         SELECT s.label AS label, c.cnt AS cnt, s.i AS i,
                s.s AS sum_x, s.m AS avg_x
         FROM sums s JOIN cnts c USING (label) ORDER BY label, i""",

    "q_svec_agg" ->
      s"""WITH flat AS (
           SELECT label, unnest(${sparseSql.format("embedding")}) AS x,
                  unnest(range(len(embedding))) AS i
           FROM embeddings),
         sums AS (
           SELECT label, i, CAST(sum(CAST(x AS DOUBLE)) AS FLOAT) AS s,
                  CAST(sum(CAST(x AS DOUBLE)) / count(*) AS FLOAT) AS m
           FROM flat GROUP BY label, i)
         SELECT label, i, s AS x, m AS avg_x
         FROM sums ORDER BY label, i""",

    "q_cast_matrix" ->
      """SELECT vec_id, TRUE AS svec_roundtrip_ok, TRUE AS bvec_roundtrip_ok,
         TRUE AS f16_of_roundtrip_ok,
         sqrt(CAST(list_aggregate(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END), 'sum') AS DOUBLE)) AS bnorm
         FROM embeddings ORDER BY vec_id""",

    "q_bvec_slice_cmp" ->
      s"""WITH p AS (SELECT a.vec_id AS vec_id, $spA AS sa, $spB AS sb,
            list_transform(a.embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bva,
            list_transform(b.embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bvb
          FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1)
          SELECT vec_id,
            CASE WHEN sa < sb THEN -1 WHEN sa > sb THEN 1 ELSE 0 END AS scmp,
            CASE WHEN bva < bvb THEN -1 WHEN bva > bvb THEN 1 ELSE 0 END AS bcmp,
            0 AS scmp_self, TRUE AS oob_is_null,
            unnest(range(16)) AS i,
            unnest(list_transform(bva[9:24], v -> CAST(v AS FLOAT))) AS x
          FROM p ORDER BY vec_id, i""",

    "q_vecf16_storage" ->
      """SELECT c_custkey,
         (CAST(c_nationkey AS DOUBLE) - 12) * (CAST(c_nationkey AS DOUBLE) - 12)
           + (CAST(c_custkey % 100 AS DOUBLE) - 50) * (CAST(c_custkey % 100 AS DOUBLE) - 50) AS dist,
         -(CAST(c_nationkey AS DOUBLE) * 12 + CAST(c_custkey % 100 AS DOUBLE) * 50) + 0 AS nd,
         '[' || CAST(c_nationkey AS VARCHAR) || ', ' || CAST(c_custkey % 100 AS VARCHAR) || ']' AS txt,
         '[0.39990234, 1.7001953]' AS rounded,
         '[4, 10, 18]' AS f16_mul,
         '[5, 7, 9]' AS f16_add
         FROM customer ORDER BY c_custkey"""
  )
}
