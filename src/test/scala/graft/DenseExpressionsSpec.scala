package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.types.{Fp16, VectorText}

class DenseExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1f, 2f, 3f), Array(3f, 2f, 1f))
  ).toDF("id", "a", "b")

  test("l2sq matches reference semantics: '[1,2,3]' <-> '[3,2,1]' = 8") {
    val r = vecs.select(l2sq($"a", $"b")).as[Double].head()
    assert(r == 8.0)
  }

  test("negdot: -(1*3+2*2+3*1) = -10") {
    assert(vecs.select(negdot($"a", $"b")).as[Double].head() == -10.0)
  }

  test("cosdist: 1 - 10/14") {
    val r = vecs.select(cosdist($"a", $"b")).as[Double].head()
    assert(math.abs(r - (1.0 - 10.0 / 14.0)) < 1e-12)
  }

  test("arith add/sub/mul") {
    val (add, sub, mul) = vecs
      .select(vecAdd($"a", $"b"), vecSub($"a", $"b"), vecMul($"a", $"b"))
      .as[(Array[Float], Array[Float], Array[Float])].head()
    assert(add.toSeq == Seq(4f, 4f, 4f))
    assert(sub.toSeq == Seq(-2f, 0f, 2f))
    assert(mul.toSeq == Seq(3f, 4f, 3f))
  }

  test("dims mismatch errors like the reference") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    val e = intercept[Exception] { df.select(l2sq($"a", $"b")).collect() }
    assert(e.getMessage != null)
  }

  test("norm and normalize") {
    val df = Seq(Tuple1(Array(3f, 4f))).toDF("v")
    assert(df.select(vectorNorm($"v")).as[Double].head() == 5.0)
    val n = df.select(vectorNormalize($"v")).as[Array[Float]].head()
    assert(n.toSeq == Seq(0.6f, 0.8f))
  }

  test("parse/format roundtrip") {
    val df = Seq("[1, 2.5, -3]").toDF("s")
    val v = df.select(parseVector($"s")).as[Array[Float]].head()
    assert(v.toSeq == Seq(1f, 2.5f, -3f))
    val s = df.select(formatVector(parseVector($"s"))).as[String].head()
    assert(s == "[1, 2.5, -3]") // reference Display: integral f32 prints bare
  }

  test("cast.slt literal edge cases") {
    def p(lit0: String): Seq[Float] =
      graft.types.VectorText.parseDense(lit0).toSeq
    assert(p("[1,]") == Seq(1f))          // trailing comma tolerated
    assert(p("[1, ]") == Seq(1f))
    assert(p("[3.5e38, -3.5e38]") ==      // overflow -> ±Inf, not error
      Seq(Float.PositiveInfinity, Float.NegativeInfinity))
    assert(p("[NaN, Infinity, -Infinity]").head.isNaN)
    for (bad <- Seq("[]", "[1,2,3", "[1,2,3]9", "1,2,3", "", "[",
        "[,", "[,]", "[1a]", "[1,,3]", "[1, ,3]"))
      intercept[Exception](p(bad))
  }

  test("f16 rounding matches reference fixture (0.4 -> 0.39990234)") {
    assert(Fp16.roundTrip(0.4f) == 0.39990234f)
    assert(Fp16.roundTrip(0.1f) == 0.099975586f)
    assert(Fp16.roundTrip(1.0f) == 1.0f)
    assert(Fp16.roundTrip(0.0f) == 0.0f)
    assert(Fp16.roundTrip(Float.PositiveInfinity) == Float.PositiveInfinity)
  }

  test("sql registration works") {
    spark.sql("SELECT l2sq_distance(array(1.0f,2.0f,3.0f), array(3.0f,2.0f,1.0f)) AS d")
      .as[Double].head() == 8.0
  }

  test("text parse: sparse sorts, drops zeros, rejects dups") {
    val (d, idx, v) = VectorText.parseSparse("{2:3, 0:1.5, 1:0}/5")
    assert(d == 5 && idx.toSeq == Seq(0, 2) && v.toSeq == Seq(1.5f, 3f))
    intercept[IllegalArgumentException](VectorText.parseSparse("{0:1, 0:2}/5"))
    intercept[IllegalArgumentException](VectorText.parseSparse("{9:1}/5"))
  }

  test("text parse: bvector 0/1 only, packs words") {
    val (d, w) = VectorText.parseBinary("[0, 1, 1]")
    assert(d == 3 && w.toSeq == Seq(6L))
    intercept[IllegalArgumentException](VectorText.parseBinary("[0, 2]"))
    assert(VectorText.formatBinary(d, w) == "[0, 1, 1]")
  }
}
