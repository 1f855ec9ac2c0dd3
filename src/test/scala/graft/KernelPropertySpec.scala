package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions._
import graft.types.Fp16

/** Property tests for the expression kernels: text I/O round-trips,
  * sparse<->dense equivalences, compare semantics vs a dense reference
  * model, f16 rounding idempotence, hash order-invariance. Deterministic:
  * seeded ScalaCheck generators sampled directly (the scalatest bridge
  * artifact isn't in the offline cache). */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val genFloat: Gen[Float] = Gen.oneOf(
    Gen.chooseNum(-1e6f, 1e6f),
    Gen.chooseNum(-1f, 1f),
    Gen.oneOf(0.0f, -0.0f, 1.5f, Float.MinPositiveValue, 3.4e38f))
  private val genVec: Gen[List[Float]] =
    Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, genFloat))

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).head().getAs[T](0)

  private def evalSeqF(c: org.apache.spark.sql.Column): Seq[Float] =
    spark.range(1).select(c).head().getSeq[Float](0).toList

  private def evalSeqL(c: org.apache.spark.sql.Column): Seq[Long] =
    spark.range(1).select(c).head().getSeq[Long](0).toList

  test("parse(format(v)) == v for arbitrary finite floats") {
    forAll(genVec) { v =>
      val got = evalSeqF(parseVector(formatVector(typedLit(v))))
      assert(got == v)
    }
  }

  test("svector dense round-trip preserves every element") {
    forAll(genVec) { v =>
      val got = evalSeqF(svecToDense(svecFromDense(typedLit(v))))
      // -0.0f sparsifies to a dropped zero and densifies to +0.0f —
      // numerically equal, reference zero-drop semantics
      assert(got.length == v.length)
      got.zip(v).foreach { case (g, x) => assert(g == x || (g == 0f && x == 0f)) }
    }
  }

  test("slice kernels follow the reference bounds law for every (lo, hi)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    forAll(genVec) { v =>
      val arr = new GenericArrayData(v.toArray)
      val n = v.length
      for (lo <- -2 to n + 2; hi <- -2 to n + 2) {
        val valid = lo >= 0 && lo < hi && hi <= n
        val dense = graft.functions.CompareKernels.slice(arr, lo, hi)
        if (valid) assert(dense.toFloatArray().toSeq == v.slice(lo, hi),
          s"dense [$lo,$hi) of n=$n")
        else assert(dense == null, s"dense [$lo,$hi) of n=$n must be NULL")
        // sparse shares the law; slice of the sparsified vector densifies
        // back to the dense slice (modulo dropped zeros)
        val sv = graft.functions.SparseKernels.fromDense(arr)
        val ssv = graft.functions.SparseKernels.slice(sv, lo, hi)
        if (valid) {
          val back = graft.functions.SparseKernels.toDense(ssv)
            .toFloatArray().toSeq
          v.slice(lo, hi).zip(back).foreach { case (x, g) =>
            assert(g == x || (g == 0f && x == 0f)) }
        } else assert(ssv == null, s"sparse [$lo,$hi) of n=$n must be NULL")
      }
    }
  }

  test("svecCompare matches lexicographic compare of dense arrays") {
    val gen = for {
      n <- Gen.choose(1, 12)
      a <- Gen.listOfN(n, Gen.oneOf(-2f, -1f, 0f, 1f, 2f))
      b <- Gen.listOfN(n, Gen.oneOf(-2f, -1f, 0f, 1f, 2f))
    } yield (a, b)
    forAll(gen) { case (a, b) =>
      val expected = a.zip(b).iterator
        .map { case (x, y) => java.lang.Float.compare(x, y) }
        .find(_ != 0).getOrElse(0)
      val got = eval1[Int](svecCompare(
        svecFromDense(typedLit(a)), svecFromDense(typedLit(b))))
      assert(Integer.signum(got) == Integer.signum(expected), s"a=$a b=$b")
    }
  }

  test("bvecCompare matches lexicographic compare of bit lists") {
    val gen = for {
      n <- Gen.choose(1, 150) // cross the 64-bit word boundary
      a <- Gen.listOfN(n, Gen.oneOf(0f, 1f))
      b <- Gen.listOfN(n, Gen.oneOf(0f, 1f))
    } yield (a, b)
    forAll(gen) { case (a, b) =>
      val expected = a.zip(b).iterator
        .map { case (x, y) => java.lang.Float.compare(x, y) }
        .find(_ != 0).getOrElse(0)
      val got = eval1[Int](bvecCompare(
        castVecToBVec(typedLit(a)), castVecToBVec(typedLit(b))))
      assert(Integer.signum(got) == Integer.signum(expected), s"a=$a b=$b")
    }
  }

  test("f16 rounding is idempotent and order-preserving") {
    forAll(genFloat) { x =>
      val once = Fp16.roundTrip(x)
      assert(Fp16.roundTrip(once) == once || once.isInfinite)
    }
    forAll(Gen.zip(genFloat, genFloat)) { case (a, b) =>
      val (ra, rb) = (Fp16.roundTrip(a), Fp16.roundTrip(b))
      if (!ra.isInfinite && !rb.isInfinite && a <= b) assert(ra <= rb)
    }
  }

  test("simhash and minhash signatures are order-invariant") {
    val genTokens = Gen.choose(1, 20)
      .flatMap(n => Gen.listOfN(n, Gen.identifier.map(_.take(8))))
    forAll(genTokens) { toks =>
      val shuffled = scala.util.Random.shuffle(toks)
      assert(graft.operators.Dedup.simhash64(toks) ==
        graft.operators.Dedup.simhash64(shuffled))
      val sigA = evalSeqL(graft.operators.Dedup.minhashSignature(
        typedLit(toks.distinct), 16))
      val sigB = evalSeqL(graft.operators.Dedup.minhashSignature(
        typedLit(shuffled.distinct), 16))
      assert(sigA == sigB)
    }
  }

  test("typed query-literal decoder inverts every folded constructor") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.plans.AnnPushdown
    // fold an expression the way ConstantFolding would: eval + retype
    def folded(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      Literal.create(e.eval(null), e.dataType)
    // longer vectors than genVec so bvector packing crosses word
    // boundaries (dims > 64) and exercises the padding bits
    val gen = Gen.choose(1, 130).flatMap(n => Gen.listOfN(n, genFloat))
    forAll(gen) { v =>
      val lit = Literal.create(v.toArray,
        ArrayType(FloatType, containsNull = false))
      // raw f32 array (unfolded spelling)
      assert(AnnPushdown.typedQueryFloats(lit).toSeq == v)
      // f16 bits: decode = the f16-rounded view
      val f16 = AnnPushdown.typedQueryFloats(folded(ToF16Bits(lit)))
      assert(f16.toSeq == v.map(x => Fp16.halfToFloat(Fp16.floatToHalf(x))))
      // packed bvector words: decode = the 0/1 densification
      val bv = AnnPushdown.typedQueryFloats(folded(Binarize(lit)))
      assert(bv.toSeq == v.map(x => if (x > 0f) 1f else 0f))
      // CSR svector: decode re-densifies (explicit zeros normalize to +0)
      val sv = AnnPushdown.typedQueryFloats(folded(SVecFromDense(lit)))
      assert(sv.length == v.length &&
        sv.indices.forall(i => sv(i) == v(i)))
    }
  }

  test("shingle strings kernel = distinct sorted n-grams, empties skipped") {
    val genTok: Gen[String] = Gen.oneOf(
      Gen.oneOf("", "a", "b", "ab", "the", "über"),
      Gen.listOfN(3, Gen.alphaLowerChar).map(_.mkString))
    val genToks: Gen[List[String]] = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genTok))
    forAll(genToks) { toks =>
      val kept = toks.filter(_.nonEmpty)
      val want = kept.sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSeq.distinct.sorted
      val got = spark.range(1)
        .select(graft.operators.Dedup.shingleStrings(typedLit(toks), 3))
        .head().getSeq[String](0).toList
      assert(got == want, s"toks=$toks")
    }
  }

  test("dense distance kernels match a double-reference model") {
    forAll(Gen.zip(genVec, genVec)) { case (a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val (a, b) = (a0.take(n), b0.take(n))
      val expL2 = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }
      val gotL2 = eval1[Double](l2sq(typedLit(a), typedLit(b)))
      assert(gotL2 == expL2)
      val expDot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
      val gotDot = eval1[Double](negdot(typedLit(a), typedLit(b)))
      assert(gotDot == -expDot)
    }
  }
}
