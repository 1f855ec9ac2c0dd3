package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions._

class TypeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def sv(s: String) = parseSVector(lit(s))
  private def bv(s: String) = parseBVector(lit(s))
  private val one = Seq(1).toDF("x")

  test("svector distances: merge over union of indexes") {
    // {0:1, 2:3}/5 vs {2:1, 4:2}/5 : l2 = 1 + 4 + 4 = 9; dot = 3
    val r = one.select(
      svecL2sq(sv("{0:1, 2:3}/5"), sv("{2:1, 4:2}/5")).as("l2"),
      svecNegdot(sv("{0:1, 2:3}/5"), sv("{2:1, 4:2}/5")).as("nd"))
      .as[(Double, Double)].head()
    assert(r == ((9.0, -3.0)))
  }

  test("svector.slt aggregate semantics: cancellation drop, NULL skip, empty -> NULL") {
    // avg({0:1,1:2,2:3}, {0:-1,1:2,2:-3}) = {1:2}/3 — components that
    // average to exactly 0 are dropped from the sparse result
    val two = Seq("{0:1, 1:2, 2:3}/3", "{0:-1, 1:2, 2:-3}/3").toDF("s")
      .select(parseSVector($"s").as("v"))
    assert(two.agg(formatSVector(svecAvgAgg($"v", 3))).as[String].head()
      == "{1:2}/3")
    // NULL rows are skipped, not counted in the divisor
    val withNull = Seq(Some("{0:1, 1:2, 2:3}/3"), None).toDF("s")
      .select(when($"s".isNotNull, parseSVector($"s")).as("v"))
    assert(withNull.agg(formatSVector(svecAvgAgg($"v", 3))).as[String].head()
      == "{0:1, 1:2, 2:3}/3")
    // empty input aggregates to NULL
    val empty = Seq.empty[String].toDF("s").select(parseSVector($"s").as("v"))
    assert(empty.agg(svecAvgAgg($"v", 3)).head().isNullAt(0))
    assert(empty.agg(svecSumAgg($"v", 3)).head().isNullAt(0))
  }

  test("svector arithmetic: mul keeps intersection, add drops produced zeros") {
    val mul = one.select(formatSVector(
      svecMul(sv("{0:1, 2:3}/5"), sv("{2:2, 4:2}/5")))).as[String].head()
    assert(mul == "{2:6}/5")
    val add = one.select(formatSVector(
      svecAdd(sv("{0:1, 2:-2}/5"), sv("{2:2, 4:5}/5")))).as[String].head()
    assert(add == "{0:1, 4:5}/5") // index 2: -2+2 = 0 dropped
  }

  test("svector dims mismatch errors") {
    intercept[Exception] {
      one.select(svecL2sq(sv("{0:1}/5"), sv("{0:1}/6"))).collect()
    }
  }

  test("bvector: hamming/negdot/jaccard + ops") {
    val (h, nd, j) = one.select(
      bvecHamming(bv("[1, 1, 0, 0]"), bv("[1, 0, 1, 0]")).as("h"),
      bvecNegdot(bv("[1, 1, 0, 0]"), bv("[1, 0, 1, 0]")).as("nd"),
      bvecJaccard(bv("[1, 1, 0, 0]"), bv("[1, 0, 1, 0]")).as("j"))
      .as[(Double, Double, Double)].head()
    assert(h == 2.0 && nd == -1.0 && j == 1.0 - 1.0 / 3.0)
    val s = one.select(formatBVector(bvecXor(bv("[1, 1, 0]"), bv("[1, 0, 1]"))))
      .as[String].head()
    assert(s == "[0, 1, 1]")
  }

  test("bvector > 64 dims crosses word boundary") {
    val ones = "[" + Seq.fill(70)("1").mkString(", ") + "]"
    val zeros = "[" + Seq.fill(70)("0").mkString(", ") + "]"
    val h = one.select(bvecHamming(bv(ones), bv(zeros))).as[Double].head()
    assert(h == 70.0)
  }

  test("binarize: bit = x > 0") {
    val s = one.select(formatBVector(binarize(
      parseVector(lit("[0.5, -1, 0, 2]"))))).as[String].head()
    assert(s == "[1, 0, 0, 1]")
  }

  test("vec slice: half-open, NULL past the end — no clamping (vect.rs subvector)") {
    val df = Seq(Tuple1(Array(1f, 2f, 3f, 4f))).toDF("v")
    assert(df.select(vecSlice($"v", lit(1), lit(3))).as[Array[Float]].head().toSeq
      == Seq(2f, 3f))
    assert(df.select(vecSlice($"v", lit(2), lit(4))).as[Array[Float]].head().toSeq
      == Seq(3f, 4f))
    // hi > dims is NULL, never a clamped slice (slice.get -> None)
    assert(df.select(vecSlice($"v", lit(2), lit(100))).head().isNullAt(0))
    assert(df.select(vecSlice($"v", lit(5), lit(9))).head().isNullAt(0))
    assert(df.select(vecSlice($"v", lit(3), lit(3))).head().isNullAt(0))
    assert(df.select(vecSlice($"v", lit(-1), lit(3))).head().isNullAt(0))
    // sparse follows the same bounds law
    assert(one.select(svecSlice(sv("{1:5, 3:7}/6"), lit(1), lit(7)))
      .head().isNullAt(0))
  }

  test("svec slice re-bases indexes") {
    val s = one.select(formatSVector(
      svecSlice(sv("{1:5, 3:7}/6"), lit(1), lit(4)))).as[String].head()
    assert(s == "{0:5, 2:7}/3")
  }

  test("lexicographic compare incl. shorter-prefix-less") {
    val df = Seq((Array(1f, 2f), Array(1f, 2f, 3f))).toDF("a", "b")
    assert(df.select(vecCompare($"a", $"b")).as[Int].head() == -1)
    assert(df.select(vecCompare($"b", $"a")).as[Int].head() == 1)
    assert(df.select(vecCompare($"a", $"a")).as[Int].head() == 0)
  }

  test("vec_sum / vec_avg parallel aggregation") {
    val df = Seq(
      (0, Array(1f, 2f)), (0, Array(3f, 4f)), (1, Array(10f, 20f))
    ).toDF("g", "v").repartition(3)
    val rows = df.groupBy($"g").agg(vecSum($"v").as("s"), vecAvg($"v").as("m"))
      .orderBy($"g").collect()
    assert(rows(0).getSeq[Float](1) == Seq(4f, 6f))
    assert(rows(0).getSeq[Float](2) == Seq(2f, 3f))
    assert(rows(1).getSeq[Float](1) == Seq(10f, 20f))
  }

  test("aggregate dims mismatch errors like reference") {
    val df = Seq(Tuple1(Array(1f, 2f)), Tuple1(Array(1f, 2f, 3f))).toDF("v")
      .coalesce(1)
    intercept[Exception] { df.agg(vecSum($"v")).collect() }
  }

  test("to_svector sorts and validates") {
    val s = one.select(formatSVector(toSVector(lit(10),
      array(lit(5), lit(1)), array(lit(2.0f), lit(3.0f))))).as[String].head()
    assert(s == "{1:3, 5:2}/10")
    intercept[Exception] {
      one.select(toSVector(lit(10), array(lit(1), lit(1)),
        array(lit(1.0f), lit(2.0f)))).collect()
    }
  }

  test("sparse/dense distance agreement (zero terms are exact identities)") {
    val df = Seq((Array(0f, 1.5f, 0f, -2f), Array(3f, 0f, 0f, 1f))).toDF("a", "b")
    val dense = df.select(l2sq($"a", $"b")).as[Double].head()
    val sparse = df.select(
      svecL2sq(svecFromDense($"a"), svecFromDense($"b"))).as[Double].head()
    assert(dense == sparse)
  }
}
