package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.functions._
import graft.types.Fp16

/** Cast matrix rules, f16 storage rounding, compare/slice edge semantics. */
class CastF16Spec extends SparkSpec {
  import spark.implicits._

  test("cast vector->bvector rejects non-0/1 values (casts.rs:90-106)") {
    val ok = Seq((Seq(0f, 1f, 1f, 0f))).toDF("v")
      .select(bvecNorm(castVecToBVec(col("v")))).head().getDouble(0)
    assert(math.abs(ok - math.sqrt(2)) < 1e-12)
    val e = intercept[Exception] {
      Seq((Seq(0f, 0.5f))).toDF("v")
        .select(bvecNorm(castVecToBVec(col("v")))).head()
    }
    assert(e.getMessage.contains("not 0 or 1") ||
      Option(e.getCause).exists(_.getMessage.contains("not 0 or 1")))
  }

  test("f16 bits storage: round-trip + fp16 rounding") {
    assert(Fp16.halfToFloat(Fp16.floatToHalf(0.4f)) == 0.39990234f)
    val row = Seq((Seq(0.4f, 1.7f, 2.0f))).toDF("v")
      .select(f16ToVector(toF16Bits(col("v"))).as("r"))
      .head().getSeq[Float](0)
    assert(row == Seq(0.39990234f, 1.7001953f, 2.0f))
  }

  test("f16 kernels error on dims mismatch") {
    val e = intercept[Exception] {
      Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
        .select(f16L2sq(toF16Bits(col("a")), toF16Bits(col("b")))).head()
    }
    assert(e.getMessage.contains("dimensions") ||
      e.getCause.getMessage.contains("dimensions"))
  }

  test("bvec slice: reference range semantics (None out of range)") {
    val df = Seq((Seq.fill(70)(1f))).toDF("v")
      .select(castVecToBVec(col("v")).as("b"))
    // in-range
    val n = df.select(bvecNorm(bvecSlice(col("b"), lit(0), lit(70)))).head().getDouble(0)
    assert(math.abs(n - math.sqrt(70)) < 1e-12)
    // hi > dims -> null (no clamping, unlike dense subscript)
    assert(df.select(bvecSlice(col("b"), lit(0), lit(71))).head().isNullAt(0))
    assert(df.select(bvecSlice(col("b"), lit(5), lit(5))).head().isNullAt(0))
  }

  test("svec compare: dense semantics via sparse merge walk") {
    def sv(dense: Seq[Float]) = svecFromDense(typedLit(dense))
    def cmp(a: Seq[Float], b: Seq[Float]): Int =
      spark.range(1).select(svecCompare(sv(a), sv(b))).head().getInt(0)
    assert(cmp(Seq(0f, 1f), Seq(0f, 1f)) == 0)
    assert(cmp(Seq(0f, 1f), Seq(1f, 0f)) == -1)   // pos0: 0 < 1
    assert(cmp(Seq(-1f, 0f), Seq(0f, 5f)) == -1)  // pos0: -1 < 0
    assert(cmp(Seq(0f, 2f), Seq(0f, 1f)) == 1)
    assert(cmp(Seq(0f, 0f), Seq(0f, -3f)) == 1)   // 0 > -3 at pos1
  }

  test("bvec compare: bit-position order (bvect.rs reverse_bits walk)") {
    def bv(dense: Seq[Float]) = castVecToBVec(typedLit(dense))
    def cmp(a: Seq[Float], b: Seq[Float]): Int =
      spark.range(1).select(bvecCompare(bv(a), bv(b))).head().getInt(0)
    assert(cmp(Seq(0f, 1f), Seq(0f, 1f)) == 0)
    assert(cmp(Seq(0f, 1f), Seq(1f, 0f)) == -1)   // first bit decides
    assert(cmp(Seq(1f, 0f), Seq(0f, 1f)) == 1)
    // bit 64+ (second word) only reached when word 0 equal
    val long1 = Seq.fill(64)(1f) ++ Seq(0f, 1f)
    val long2 = Seq.fill(64)(1f) ++ Seq(1f, 0f)
    assert(cmp(long1, long2) == -1)
  }
}
