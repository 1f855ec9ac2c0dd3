package graft

import org.apache.spark.sql.functions._
import graft.index.OpSqlRewrite

/** Reference-dialect operator SQL (round 13): the token rewrite, the
  * type dispatch, the `<=>` null-safe-equality fallback, the sphere
  * predicate semantics (strict `<`), and the `::vector` cast forms. */
class OpSqlSpec extends SparkSpec {

  // ------------------------------------------------ pure text rewrite
  test("rewrite leaves plain SQL untouched (fast path)") {
    val q = "SELECT a, b FROM t WHERE a < b AND b > 3"
    assert(OpSqlRewrite(q) eq q)
  }

  test("rewrite maps each operator onto its dispatch function") {
    assert(OpSqlRewrite("SELECT v <-> '[1,2]' FROM t") ===
      "SELECT graft_op_l2(v, '[1,2]') FROM t")
    assert(OpSqlRewrite("SELECT v <#> q FROM t") ===
      "SELECT graft_op_dot(v, q) FROM t")
    assert(OpSqlRewrite("SELECT v <=> q FROM t") ===
      "SELECT graft_op_cos(v, q) FROM t")
    assert(OpSqlRewrite("SELECT v <~> q FROM t") ===
      "SELECT graft_op_jaccard(v, q) FROM t")
    assert(OpSqlRewrite("SELECT * FROM t WHERE v <<->> sphere('[1]', 0.5)") ===
      "SELECT * FROM t WHERE graft_sphere_l2(v, sphere('[1]', 0.5))")
    assert(OpSqlRewrite("SELECT * FROM t WHERE v <<#>> s AND x = 1") ===
      "SELECT * FROM t WHERE graft_sphere_dot(v, s) AND x = 1")
    assert(OpSqlRewrite("SELECT * FROM t WHERE v <<=>> s") ===
      "SELECT * FROM t WHERE graft_sphere_cos(v, s)")
    assert(OpSqlRewrite("SELECT * FROM t WHERE v <<~>> s") ===
      "SELECT * FROM t WHERE graft_sphere_jaccard(v, s)")
  }

  test("operand capture: qualified refs, calls, parens, chained ops") {
    assert(OpSqlRewrite("SELECT e.val <-> q.qv AS d FROM e, q") ===
      "SELECT graft_op_l2(e.val, q.qv) AS d FROM e, q")
    assert(OpSqlRewrite("SELECT binarize(e.v) <~> binarize(f(x, y)) FROM t") ===
      "SELECT graft_op_jaccard(binarize(e.v), binarize(f(x, y))) FROM t")
    assert(OpSqlRewrite("SELECT (a) <-> '[1]' FROM t") ===
      "SELECT graft_op_l2((a), '[1]') FROM t")
    // left-assoc chaining: the spliced call is the next operator's left
    assert(OpSqlRewrite("SELECT a <-> b <#> c FROM t") ===
      "SELECT graft_op_dot(graft_op_l2(a, b), c) FROM t")
    // ORDER BY ... LIMIT shape (the reference's canonical query)
    assert(OpSqlRewrite(
      "SELECT id FROM t ORDER BY val <-> '[3,2,1]' LIMIT 5") ===
      "SELECT id FROM t ORDER BY graft_op_l2(val, '[3,2,1]') LIMIT 5")
    // WHERE keyword never absorbed as a call name
    assert(OpSqlRewrite("SELECT 1 FROM t WHERE (a) <-> b < 1") ===
      "SELECT 1 FROM t WHERE graft_op_l2((a), b) < 1")
  }

  test("operators inside strings and comments are never rewritten") {
    assert(OpSqlRewrite("SELECT '<->' AS s, v <#> q FROM t") ===
      "SELECT '<->' AS s, graft_op_dot(v, q) FROM t")
    val c = "SELECT v <#> q FROM t -- uses <-> soon"
    assert(OpSqlRewrite(c) === "SELECT graft_op_dot(v, q) FROM t -- uses <-> soon")
    assert(OpSqlRewrite("SELECT /* <~> */ v <#> q FROM t") ===
      "SELECT /* <~> */ graft_op_dot(v, q) FROM t")
  }

  test("vector casts rewrite to the type-dispatching cast matrix") {
    assert(OpSqlRewrite("SELECT '[1,2]'::vector") ===
      "SELECT graft_cast_vector('[1,2]')")
    assert(OpSqlRewrite("SELECT '{0:1}/3'::svector AS s") ===
      "SELECT graft_cast_svector('{0:1}/3') AS s")
    assert(OpSqlRewrite("SELECT '[0,1]'::bvector") ===
      "SELECT graft_cast_bvector('[0,1]')")
    assert(OpSqlRewrite("SELECT '[1,2]'::vecf16") ===
      "SELECT graft_cast_vecf16('[1,2]')")
    // cast + operator compose; chained casts nest (the cast-matrix
    // spelling '[..]'::vector::bvector)
    assert(OpSqlRewrite("SELECT v <-> '[1,2]'::vector FROM t") ===
      "SELECT graft_op_l2(v, graft_cast_vector('[1,2]')) FROM t")
    assert(OpSqlRewrite("SELECT '[1]'::vector::bvector") ===
      "SELECT graft_cast_bvector(graft_cast_vector('[1]'))")
    // non-vector casts untouched
    assert(OpSqlRewrite("SELECT x::int, '[1]'::vector FROM t") ===
      "SELECT x::int, graft_cast_vector('[1]') FROM t")
  }

  // -------------------------------------------------- live execution
  private def emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("dense <-> / <#> / <=> execute and match the native kernels") {
    emb.createOrReplaceTempView("opsql_emb")
    val got = spark.sql(
      """SELECT e.vec_id AS vec_id,
                e.embedding <-> q.embedding AS l2,
                e.embedding <#> q.embedding AS nd,
                e.embedding <=> q.embedding AS cd
         FROM opsql_emb e CROSS JOIN
              (SELECT embedding FROM opsql_emb WHERE vec_id = 0) q
         WHERE e.vec_id < 10 ORDER BY e.vec_id""").collect()
    val want = emb.crossJoin(
        broadcast(emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))))
      .filter(col("vec_id") < 10)
      .select(col("vec_id"),
        functions.l2sq(col("embedding"), col("qe")).as("l2"),
        functions.negdot(col("embedding"), col("qe")).as("nd"),
        functions.cosdist(col("embedding"), col("qe")).as("cd"))
      .orderBy(col("vec_id")).collect()
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getDouble(1) === w.getDouble(1))
      assert(g.getDouble(2) === w.getDouble(2))
      assert(g.getDouble(3) === w.getDouble(3))
    }
  }

  test("string literal coerces by the vector side; bvec/svec dispatch") {
    // bvector: <-> is hamming, <~> jaccard; svector: <-> is l2sq
    val r = spark.sql(
      """SELECT '[1, 0, 1, 0]'::bvector <-> '[0, 0, 1, 1]' AS ham,
                '[1, 0, 1, 0]'::bvector <~> '[0, 0, 1, 1]' AS jac,
                '{0:0.5, 3:1.0}/8'::svector <-> '{0:0.5}/8' AS sl2,
                '[1, 2]'::vecf16 <-> '[3, 4]' AS f16l2""").head()
    assert(r.getDouble(0) === 2.0)            // bits 0 and 3 differ
    assert(r.getDouble(1) === 1.0 - 1.0 / 3)  // |A∩B|=1, |A∪B|=3
    assert(r.getDouble(2) === 1.0)            // only index 3 differs
    assert(r.getDouble(3) === 8.0)            // small ints f16-exact
  }

  test("sphere predicates are strict dist < radius") {
    emb.createOrReplaceTempView("opsql_emb")
    val viaOp = spark.sql(
      """SELECT e.vec_id FROM opsql_emb e CROSS JOIN
           (SELECT embedding FROM opsql_emb WHERE vec_id = 0) q
         WHERE e.embedding <<->> sphere(q.embedding, 1.5)
         ORDER BY e.vec_id""").collect().map(_.getLong(0))
    val direct = spark.sql(
      """SELECT e.vec_id FROM opsql_emb e CROSS JOIN
           (SELECT embedding FROM opsql_emb WHERE vec_id = 0) q
         WHERE l2sq_distance(e.embedding, q.embedding) < 1.5
         ORDER BY e.vec_id""").collect().map(_.getLong(0))
    assert(viaOp.nonEmpty && (viaOp sameElements direct))
    // dist(v, v) = 0 < r: the center row itself is inside (strictness
    // sanity: radius 0 excludes everything, even the center)
    val zero = spark.sql(
      """SELECT count(*) FROM opsql_emb e CROSS JOIN
           (SELECT embedding FROM opsql_emb WHERE vec_id = 0) q
         WHERE e.embedding <<->> sphere(q.embedding, 0.0)""").head().getLong(0)
    assert(zero === 0L)
  }

  test("<=> keeps Spark null-safe equality on non-vector operands") {
    assert(spark.sql("SELECT 1 <=> 1").head().getBoolean(0))
    assert(!spark.sql("SELECT 1 <=> 2").head().getBoolean(0))
    assert(spark.sql("SELECT CAST(NULL AS INT) <=> CAST(NULL AS INT)")
      .head().getBoolean(0))
    assert(spark.sql("SELECT 'ab' <=> 'ab'").head().getBoolean(0))
  }

  test("missing overloads fail analysis with a clear message") {
    emb.createOrReplaceTempView("opsql_emb")
    val e1 = intercept[Exception] {
      spark.sql("SELECT embedding <~> embedding FROM opsql_emb").collect()
    }
    assert(e1.getMessage.contains("jaccard"))
    val e2 = intercept[Exception] {
      spark.sql(
        """SELECT binarize(embedding) <=> binarize(embedding)
           FROM opsql_emb""").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("bvector"))
  }

  test("PG typmod casts: ::numeric(p,s) maps, others error clearly (round 14)") {
    // numeric with a typmod → DECIMAL(p[,s]); the suffix is consumed
    assert(spark.sql("SELECT 1.23456::numeric(10,2)").head()
      .getDecimal(0).toPlainString === "1.23")
    assert(spark.sql("SELECT 7.9::numeric(3)").head()
      .getDecimal(0).toPlainString === "8")
    // bare ::numeric keeps the wide default
    assert(spark.sql("SELECT 1::numeric").schema.head.dataType
      .typeName.startsWith("decimal"))
    // a precision group on a non-numeric scalar cast errors actionably
    // instead of leaving '(10,2)' dangling after the spliced CAST
    val e = intercept[Exception] {
      spark.sql("SELECT 1.5::float4(10,2)").collect()
    }
    assert(e.getMessage.contains("precision arguments unsupported"),
      e.getMessage)
  }

  test("no-space spellings and Column-expression strings rewrite too") {
    assert(OpSqlRewrite("SELECT a<->b FROM t") ===
      "SELECT graft_op_l2(a, b) FROM t")
    assert(OpSqlRewrite("SELECT a<#>'[1]' FROM t") ===
      "SELECT graft_op_dot(a, '[1]') FROM t")
    // ASC/DESC after the operand stays outside the capture
    assert(OpSqlRewrite("SELECT id FROM t ORDER BY v <-> q ASC LIMIT 3") ===
      "SELECT id FROM t ORDER BY graft_op_l2(v, q) ASC LIMIT 3")
    // expr() strings go through parseExpression -> the same rewrite
    val d = spark.sql("SELECT array(1.0F, 2.0F) AS a, array(2.0F, 4.0F) AS b")
      .select(expr("a <-> b").as("l2")).head().getDouble(0)
    assert(d === 5.0)
  }

  test("vector + - * and bvector & | ^ resolve in SQL text (round 13)") {
    val r = spark.sql(
      """SELECT '[1, 2]'::vector + '[3, 4]'::vector AS a,
                '[1, 2]'::vector - '[3, 4]'::vector AS s,
                '[1, 2]'::vector * '[3, 4]'::vector AS m,
                bvec_to_dense('[1, 0, 1]'::bvector & '[1, 1, 0]'::bvector) AS band,
                bvec_to_dense('[1, 0, 1]'::bvector | '[1, 1, 0]'::bvector) AS bor,
                bvec_to_dense('[1, 0, 1]'::bvector ^ '[1, 1, 0]'::bvector) AS bxor,
                svec_to_dense('{0:1.5}/3'::svector + '{1:2}/3'::svector) AS sadd""")
      .head()
    assert(r.getSeq[Float](0) === Seq(4f, 6f))
    assert(r.getSeq[Float](1) === Seq(-2f, -2f))
    assert(r.getSeq[Float](2) === Seq(3f, 8f))
    assert(r.getSeq[Float](3) === Seq(1f, 0f, 0f))
    assert(r.getSeq[Float](4) === Seq(1f, 1f, 1f))
    assert(r.getSeq[Float](5) === Seq(0f, 1f, 1f))
    assert(r.getSeq[Float](6) === Seq(1.5f, 2f, 0f))
    // string coercion on one side (the reference's unknown-literal cast)
    val c = spark.sql("SELECT '[1, 2]'::vector + '[3, 4]' AS a").head()
    assert(c.getSeq[Float](0) === Seq(4f, 6f))
    // ordinary arithmetic is untouched
    assert(spark.sql("SELECT 2 + 3").head().getInt(0) === 5)
    assert(spark.sql("SELECT 6 & 3").head().getInt(0) === 2)
    assert(spark.sql("SELECT 2.5 * 2").head().getDecimal(0).doubleValue === 5.0)
  }

  test("undelimitable non-cos operator errors clearly") {
    val e = intercept[IllegalArgumentException] {
      OpSqlRewrite("SELECT <-> FROM t")
    }
    assert(e.getMessage.contains("<->"))
    // <=> with no operands is left for Spark's parser
    assert(OpSqlRewrite("SELECT <=> FROM t") === "SELECT <=> FROM t")
  }
}
