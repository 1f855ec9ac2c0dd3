package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Shims

/**
 * Column-level API over the engine's Catalyst expressions — the Spark
 * analog of the reference's SQL operator surface (finalize.sql).
 */
package object functions {
  private[graft] def toCol(e: Expression): Column = Shims.column(e)
  private[graft] def expr(c: Column): Expression = Shims.expression(c)

  // --- dense distances (reference operators <->, <#>, <=>) ---
  def l2sq(a: Column, b: Column): Column = toCol(L2sqDistance(expr(a), expr(b)))
  def negdot(a: Column, b: Column): Column = toCol(NegDotDistance(expr(a), expr(b)))
  def cosdist(a: Column, b: Column): Column = toCol(CosDistance(expr(a), expr(b)))

  // --- dense arithmetic (+ - *) ---
  def vecAdd(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '+'))
  def vecSub(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '-'))
  def vecMul(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '*'))

  // --- scalar functions ---
  /** True iff every component of a float-array vector is finite. Index
    * builds treat non-finite vectors like NULLs (they're stored nowhere
    * and never surface from a top-k — the null.slt contract): MLlib
    * KMeans hard-errors on NaN/Inf features, and a NaN entry node would
    * stall an HNSW greedy descent (every comparison false). */
  def vectorIsFinite(v: Column): Column = {
    import org.apache.spark.sql.functions.{abs, exists, isnan, lit, not}
    not(exists(v, x => isnan(x) || abs(x) > lit(Float.MaxValue)))
  }
  def vectorDims(v: Column): Column = toCol(VectorDims(expr(v)))
  def vectorNorm(v: Column): Column = toCol(VectorNorm(expr(v)))
  def vectorNormalize(v: Column): Column = toCol(VectorNormalize(expr(v)))
  def toVecf16(v: Column): Column = toCol(ToF16(expr(v)))
  def parseVector(s: Column): Column = toCol(ParseVector(expr(s)))
  def formatVector(v: Column): Column = toCol(FormatVector(expr(v)))

  // --- sparse (svector) ---
  def svecL2sq(a: Column, b: Column): Column = toCol(SVecL2sq(expr(a), expr(b)))
  def svecNegdot(a: Column, b: Column): Column = toCol(SVecNegDot(expr(a), expr(b)))
  def svecCosdist(a: Column, b: Column): Column = toCol(SVecCosDist(expr(a), expr(b)))
  def svecAdd(a: Column, b: Column): Column = toCol(SVecArith(expr(a), expr(b), 0))
  def svecSub(a: Column, b: Column): Column = toCol(SVecArith(expr(a), expr(b), 1))
  def svecMul(a: Column, b: Column): Column = toCol(SVecArith(expr(a), expr(b), 2))
  def svecNorm(v: Column): Column = toCol(SVecNorm(expr(v)))
  def svecNormalize(v: Column): Column = toCol(SVecNormalize(expr(v)))
  def f16Add(a: Column, b: Column): Column = toCol(F16Arith(expr(a), expr(b), 0))
  def f16Sub(a: Column, b: Column): Column = toCol(F16Arith(expr(a), expr(b), 1))
  def f16Mul(a: Column, b: Column): Column = toCol(F16Arith(expr(a), expr(b), 2))
  def f16Normalize(v: Column): Column = toCol(F16Normalize(expr(v)))
  def toSVector(dims: Column, idx: Column, vals: Column): Column =
    toCol(ToSVector(expr(dims), expr(idx), expr(vals)))
  def svecToDense(v: Column): Column = toCol(SVecToDense(expr(v)))
  def svecFromDense(v: Column): Column = toCol(SVecFromDense(expr(v)))
  def svecSlice(v: Column, lo: Column, hi: Column): Column =
    toCol(SVecSlice(expr(v), expr(lo), expr(hi)))
  def parseSVector(s: Column): Column = toCol(ParseSVector(expr(s)))
  def formatSVector(v: Column): Column = toCol(FormatSVector(expr(v)))

  // --- binary (bvector) ---
  def bvecHamming(a: Column, b: Column): Column = toCol(BVecHamming(expr(a), expr(b)))
  def bvecNegdot(a: Column, b: Column): Column = toCol(BVecNegDot(expr(a), expr(b)))
  def bvecJaccard(a: Column, b: Column): Column = toCol(BVecJaccard(expr(a), expr(b)))
  def bvecAnd(a: Column, b: Column): Column = toCol(BVecOp(expr(a), expr(b), 0))
  def bvecOr(a: Column, b: Column): Column = toCol(BVecOp(expr(a), expr(b), 1))
  def bvecXor(a: Column, b: Column): Column = toCol(BVecOp(expr(a), expr(b), 2))
  def binarize(v: Column): Column = toCol(Binarize(expr(v)))
  def bvecToDense(v: Column): Column = toCol(BVecToDense(expr(v)))
  def bvecNorm(v: Column): Column = toCol(BVecNorm(expr(v)))
  def parseBVector(s: Column): Column = toCol(ParseBVector(expr(s)))
  def formatBVector(v: Column): Column = toCol(FormatBVector(expr(v)))

  // --- compare / slice ---
  def vecCompare(a: Column, b: Column): Column = toCol(VecCompare(expr(a), expr(b)))
  def vecSlice(v: Column, lo: Column, hi: Column): Column =
    toCol(VecSlice(expr(v), expr(lo), expr(hi)))
  def svecCompare(a: Column, b: Column): Column = toCol(SVecCompare(expr(a), expr(b)))
  def bvecCompare(a: Column, b: Column): Column = toCol(BVecCompare(expr(a), expr(b)))
  def bvecSlice(v: Column, lo: Column, hi: Column): Column =
    toCol(BVecSlice(expr(v), expr(lo), expr(hi)))

  // --- true f16 storage + casts ---
  def toF16Bits(v: Column): Column = toCol(ToF16Bits(expr(v)))
  def f16ToVector(bits: Column): Column = toCol(F16BitsToVector(expr(bits)))
  def f16L2sq(a: Column, b: Column): Column = toCol(F16L2sq(expr(a), expr(b)))
  def f16NegDot(a: Column, b: Column): Column = toCol(F16NegDot(expr(a), expr(b)))
  def f16Cosdist(a: Column, b: Column): Column = toCol(F16CosDist(expr(a), expr(b)))
  def castVecToBVec(v: Column): Column = toCol(CastVecToBVec(expr(v)))

  // --- aggregates ---
  def vecSum(v: Column): Column = toCol(VecSum(expr(v)).toAggregateExpression())
  def vecAvg(v: Column): Column = toCol(VecAvg(expr(v)).toAggregateExpression())
  def svecSumAgg(v: Column, dims: Int): Column =
    toCol(SVecSum(expr(v), dims).toAggregateExpression())
  def svecAvgAgg(v: Column, dims: Int): Column =
    toCol(SVecAvg(expr(v), dims).toAggregateExpression())
  def vecMinMax(v: Column): Column =
    toCol(VecMinMax(expr(v)).toAggregateExpression())

  /** Register all functions for SQL usage (the analog of finalize.sql's
    * CREATE FUNCTION statements). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def reg1(name: String, f: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => f(es.head), "scala_udf")
    def reg2(name: String, f: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => f(es(0), es(1)), "scala_udf")

    reg2("l2sq_distance", L2sqDistance(_, _))
    reg2("negdot_distance", NegDotDistance(_, _))
    reg2("cos_distance", CosDistance(_, _))
    // type-dispatching operator surface (the reference's CREATE OPERATOR
    // overload sets): the injected parser rewrites `<->` `<#>` `<=>`
    // `<~>` and the `<<..>>` sphere forms onto these — see OpDispatch
    reg2("graft_op_l2", OpDist(_, _, "l2"))
    reg2("graft_op_dot", OpDist(_, _, "dot"))
    reg2("graft_op_cos", OpDist(_, _, "cos"))
    reg2("graft_op_jaccard", OpDist(_, _, "jaccard"))
    reg2("graft_sphere_l2", SphereIn(_, _, "l2"))
    reg2("graft_sphere_dot", SphereIn(_, _, "dot"))
    reg2("graft_sphere_cos", SphereIn(_, _, "cos"))
    reg2("graft_sphere_jaccard", SphereIn(_, _, "jaccard"))
    // expr::<vector type> casts — the full reference cast matrix per
    // target, dispatched by operand type (CastDispatch)
    reg1("graft_cast_vector", CastDispatch(_, "vector"))
    reg1("graft_cast_svector", CastDispatch(_, "svector"))
    reg1("graft_cast_bvector", CastDispatch(_, "bvector"))
    reg1("graft_cast_vecf16", CastDispatch(_, "vecf16"))
    // v[lo:hi] subscript slices (the parser's emission; arity picks the
    // open-ended form — v[lo:] runs to the vector's dims)
    reg.createOrReplaceTempFunction("graft_slice",
      es => if (es.length == 3) SliceDispatch(es(0), es(1), es(2))
            else SliceToEnd(es(0), es(1)), "scala_udf")
    reg2("vec_add", DenseArith(_, _, '+'))
    reg2("vec_sub", DenseArith(_, _, '-'))
    reg2("vec_mul", DenseArith(_, _, '*'))
    // the SQL name dispatches the reference's full overload set
    // (finalize.sql:613-623, ×4 vector kinds); the Column helper stays
    // the direct dense expression
    reg1("vector_norm", NormDispatch(_))
    // the SQL name carries the reference's full overload set
    // (finalize.sql:625-632: vector, vecf16, svector) via type dispatch;
    // the Column helper below stays the direct dense expression
    reg1("vector_normalize", NormalizeDispatch(_))
    reg1("svec_normalize", SVecNormalize(_))
    reg1("f16_normalize", F16Normalize(_))
    reg2("f16_add", F16Arith(_, _, 0))
    reg2("f16_sub", F16Arith(_, _, 1))
    reg2("f16_mul", F16Arith(_, _, 2))
    reg1("to_vecf16", ToF16(_))
    reg1("parse_vector", ParseVector(_))
    reg1("format_vector", FormatVector(_))
    reg2("svec_l2sq_distance", SVecL2sq(_, _))
    reg2("svec_negdot_distance", SVecNegDot(_, _))
    reg2("svec_cos_distance", SVecCosDist(_, _))
    reg2("svec_add", SVecArith(_, _, 0))
    reg2("svec_sub", SVecArith(_, _, 1))
    reg2("svec_mul", SVecArith(_, _, 2))
    reg1("svec_norm", SVecNorm(_))
    reg.createOrReplaceTempFunction("to_svector",
      es => ToSVector(es(0), es(1), es(2)), "scala_udf")
    reg1("svec_to_dense", SVecToDense(_))
    reg1("svec_from_dense", SVecFromDense(_))
    reg.createOrReplaceTempFunction("svec_slice",
      es => SVecSlice(es(0), es(1), es(2)), "scala_udf")
    reg1("parse_svector", ParseSVector(_))
    reg1("format_svector", FormatSVector(_))
    reg2("bvec_hamming_distance", BVecHamming(_, _))
    reg2("bvec_negdot_distance", BVecNegDot(_, _))
    reg2("bvec_jaccard_distance", BVecJaccard(_, _))
    reg2("bvec_and", BVecOp(_, _, 0))
    reg2("bvec_or", BVecOp(_, _, 1))
    reg2("bvec_xor", BVecOp(_, _, 2))
    reg1("binarize", Binarize(_))
    reg1("bvec_to_dense", BVecToDense(_))
    reg1("bvec_norm", BVecNorm(_))
    reg1("parse_bvector", ParseBVector(_))
    reg1("format_bvector", FormatBVector(_))
    reg2("vec_compare", VecCompare(_, _))
    reg2("svec_compare", SVecCompare(_, _))
    reg2("bvec_compare", BVecCompare(_, _))
    reg.createOrReplaceTempFunction("vec_slice",
      es => VecSlice(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("bvec_slice",
      es => BVecSlice(es(0), es(1), es(2)), "scala_udf")
    reg1("to_f16_bits", ToF16Bits(_))
    reg1("f16_to_vector", F16BitsToVector(_))
    reg2("f16_l2sq_distance", F16L2sq(_, _))
    reg2("f16_negdot_distance", F16NegDot(_, _))
    reg2("f16_cos_distance", F16CosDist(_, _))
    reg1("vector_dims", VectorDims(_))
    // sphere(center, radius) composite (finalize.sql:640-650): a plain
    // named struct — the range predicates destructure it
    reg.createOrReplaceTempFunction("sphere",
      es => org.apache.spark.sql.catalyst.expressions.CreateNamedStruct(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal("center"), es(0),
        org.apache.spark.sql.catalyst.expressions.Literal("radius"), es(1))),
      "scala_udf")
    reg1("cast_vector_to_bvector", CastVecToBVec(_))
    reg.createOrReplaceTempFunction("vec_sum",
      es => VecSum(es.head).toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("vec_avg",
      es => VecAvg(es.head).toAggregateExpression(), "scala_udf")

    // text/dedup kernels (LLM-pipeline surface)
    def constInt(e: Expression, name: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case _ => throw new IllegalArgumentException(
        s"$name expects an integer literal")
    }
    reg.createOrReplaceTempFunction("shingle_hashes",
      es => graft.operators.Dedup.ShingleHashesExpr(es(0),
        constInt(es(1), "shingle_hashes(toks, n)")), "scala_udf")
    // "minhash_signature" = the string-shingle variant (matches the
    // Scala API and the expression prettyName); "_hashed" takes the
    // array<bigint> sets from shingle_hashes
    reg.createOrReplaceTempFunction("minhash_signature",
      es => graft.operators.Dedup.MinHashSig(es(0),
        constInt(es(1), "minhash_signature(shingles, k)")), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_signature_hashed",
      es => graft.operators.Dedup.MinHashSigFromHashes(es(0),
        constInt(es(1), "minhash_signature_hashed(hashes, k)")), "scala_udf")
    reg1("simhash64", graft.operators.Dedup.SimHash(_))
    // sparse aggregates (finalize.sql:670-684) — dims is a literal
    reg.createOrReplaceTempFunction("svec_sum",
      es => SVecSum(es(0), constInt(es(1), "svec_sum(v, dims)"))
        .toAggregateExpression(), "scala_udf")
    reg.createOrReplaceTempFunction("svec_avg",
      es => SVecAvg(es(0), constInt(es(1), "svec_avg(v, dims)"))
        .toAggregateExpression(), "scala_udf")

    // --- admin surface under its SQL names (finalize.sql:578-599) ---
    // Driver-contract commands, like the reference's backend-process
    // admin functions: with literal args they constant-fold during
    // optimization (ScalaUDF is deterministic + foldable children), so
    // the catalog work runs on the driver exactly once per execution.
    // pgvectors_upgrade takes a name-prefix scope ('' sweeps the whole
    // root — single-driver only, see IndexCatalog.upgrade) and returns
    // the swept names.
    spark.udf.register("alter_vector_index",
      (name: String, key: String, value: String) => {
        // the sql_* vacuum-replay recipe is CREATE/VACUUM-owned: a user
        // alter of it desyncs recipe from artifact (round-11 advice) —
        // same guard as ALTER VECTOR INDEX ... SET
        if (key.startsWith("sql_"))
          throw new IllegalArgumentException(
            s"option not alterable: $key (recipe keys are owned by " +
              "CREATE/VACUUM VECTOR INDEX)")
        graft.index.IndexCatalog.alter(SparkSession.active, name, key, value)
        "ok"
      })
    spark.udf.register("fence_vector_index", (name: String) => {
      graft.index.IndexCatalog.fence(SparkSession.active, name)
      "ok"
    })
    spark.udf.register("pgvectors_upgrade", (prefix: String) =>
      graft.index.IndexCatalog.upgrade(SparkSession.active, prefix)
        .sorted.mkString(","))
    // SQL-text CREATE INDEX / VACUUM (finalize.sql:714, am.rs:135-244;
    // every reference test drives CREATE INDEX as SQL) — the last
    // lifecycle step a SQL-only user couldn't reach (round 10). These
    // LAUNCH SPARK JOBS, so unlike the metadata-only admin UDFs above
    // they cannot run inside a task: the registry builder performs the
    // DDL at statement ANALYSIS, driver-side by construction (the
    // reference's CREATE INDEX likewise executes at statement time), and
    // the resolved expression is just the returned literal. Arguments
    // must be string literals; create is idempotent ensure semantics, so
    // a re-analysis of the same statement text is a harmless no-op.
    def constStr(e: Expression, what: String): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _: org.apache.spark.sql.types.StringType) =>
        if (v == null) throw new IllegalArgumentException(s"$what must not be NULL")
        else v.toString
      case _ => throw new IllegalArgumentException(
        s"$what expects a string literal")
    }
    def lit(s: String): Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType)
    reg.createOrReplaceTempFunction("create_vector_index",
      es => lit(graft.index.SqlDdl.create(SparkSession.active,
        constStr(es(0), "create_vector_index(name, ...)"),
        constStr(es(1), "create_vector_index(..., source, ...)"),
        constStr(es(2), "create_vector_index(..., id_col, ...)"),
        constStr(es(3), "create_vector_index(..., vec_col, ...)"),
        constStr(es(4), "create_vector_index(..., method, ...)"),
        constStr(es(5), "create_vector_index(..., opclass, ...)"),
        constStr(es(6), "create_vector_index(..., options)"))), "scala_udf")
    reg.createOrReplaceTempFunction("vacuum_vector_index",
      es => lit(graft.index.SqlDdl.vacuum(SparkSession.active,
        constStr(es(0), "vacuum_vector_index(name)"))), "scala_udf")
  }
}
