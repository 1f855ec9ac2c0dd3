package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims.AbstractDataType
import org.apache.spark.sql.types._
import graft.types.{Fp16, VectorTypes}

/**
 * True f16 storage, the cast matrix, and the sparse/binary comparison +
 * slice surface:
 *
 *  - vecf16 stored as ArrayType(ShortType) binary16 bit patterns (the
 *    reference stores half-words, crates/base/src/scalar/f16.rs); kernels
 *    decode per element and accumulate in double, so distance results
 *    match computing on f16-rounded f32 values.
 *  - casts vector <-> bvector enforce the 0/1-only rule
 *    (src/datatype/casts.rs:90-106: "values must be 0 or 1").
 *  - svector compare walks the CSR merge with dense semantics
 *    (svect.rs:404-444: missing index compares as zero).
 *  - bvector compare orders by bit position (bvect.rs:244-276 compares
 *    words after reverse_bits — position-0-first lexicographic order).
 *  - bvector subvector: null when lo >= hi or hi > dims (bvect.rs:210-241
 *    returns None out of range — unlike PG-style dense slice clamping).
 */
object F16Kernels {
  def toBits(v: ArrayData): ArrayData = {
    val n = v.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = Fp16.floatToHalf(v.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }

  def toFloats(bits: ArrayData): ArrayData = {
    val n = bits.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = Fp16.halfToFloat(bits.getShort(i)); i += 1 }
    new GenericArrayData(out)
  }

  @inline private def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $n != $m")

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    checkDims(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val d = Fp16.halfToFloat(a.getShort(i)).toDouble -
        Fp16.halfToFloat(b.getShort(i)).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  def negdot(a: ArrayData, b: ArrayData): Double = {
    checkDims(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      acc -= Fp16.halfToFloat(a.getShort(i)).toDouble *
        Fp16.halfToFloat(b.getShort(i)).toDouble
      i += 1
    }
    acc
  }

  /** vecf16-domain element-wise arithmetic over the SURFACE arrays
    * (f16-rounded floats): each op computes in f32 and rounds the
    * result back through binary16 — the reference's half-precision
    * operators promote to f32 per op and round the result
    * (src/datatype/operators_vecf16.rs:7-14, finalize.sql:97-148),
    * unlike the dense f32 `vec_add` family which never rounds.
    * op: 0 add, 1 sub, 2 mul. */
  def arith(a: ArrayData, b: ArrayData, op: Int): ArrayData = {
    val n = a.numElements(); checkDims(n, b.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      val r = op match {
        case 0 => x + y
        case 1 => x - y
        case _ => x * y
      }
      out(i) = Fp16.roundTrip(r)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** vecf16 normalize (finalize.sql:628-629): norm accumulated in
    * double, index order (the repo's kernel convention), divide in
    * double, round each element back through binary16 — the per-op f16
    * rounding the dense normalize never applies. */
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    val nrm = math.sqrt(acc)
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = Fp16.roundTrip((a.getFloat(i) / nrm).toFloat); i += 1
    }
    new GenericArrayData(out)
  }

  /** Same accumulation order as DenseKernels.cosDist (one pass, three
    * double accumulators) so the DuckDB oracle replays it exactly on
    * f16-exact values. */
  def cosdist(a: ArrayData, b: ArrayData): Double = {
    checkDims(a.numElements(), b.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0; val n = a.numElements()
    while (i < n) {
      val x = Fp16.halfToFloat(a.getShort(i)).toDouble
      val y = Fp16.halfToFloat(b.getShort(i)).toDouble
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    1.0 - xy / math.sqrt(xx * yy)
  }
}

object CastKernels {
  /** vector -> bvector, 0/1-only (casts.rs:90-106). */
  def denseToBVec(arr: ArrayData): InternalRow = {
    val dims = arr.numElements()
    val words = new Array[Long]((dims + 63) / 64)
    var i = 0
    while (i < dims) {
      val x = arr.getFloat(i)
      if (x == 1.0f) words(i >> 6) |= (1L << (i & 63))
      else if (x != 0.0f) throw new IllegalArgumentException(
        s"The vector contains a value that is not 0 or 1: $x")
      i += 1
    }
    InternalRow(dims, new GenericArrayData(words))
  }

  /** svector lexicographic compare with dense semantics (svect.rs:404-444). */
  def svecCompare(a: InternalRow, b: InternalRow): Int = {
    val ad = a.getInt(0); val bd = b.getInt(0)
    if (ad != bd) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $ad != $bd")
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val an = ai.numElements(); val bn = bi.numElements()
    var x = 0; var y = 0
    while (x < an || y < bn) {
      if (x < an && y < bn) {
        val ia = ai.getInt(x); val ib = bi.getInt(y)
        if (ia == ib) {
          val c = java.lang.Float.compare(av.getFloat(x), bv.getFloat(y))
          if (c != 0) return c
          x += 1; y += 1
        } else if (ia < ib) {
          return if (av.getFloat(x) < 0.0f) -1 else 1
        } else {
          return if (bv.getFloat(y) > 0.0f) -1 else 1
        }
      } else if (x < an) {
        return java.lang.Float.compare(av.getFloat(x), 0.0f)
      } else {
        return java.lang.Float.compare(0.0f, bv.getFloat(y))
      }
    }
    0
  }

  /** bvector compare: position-0-first bit order (bvect.rs:244-276). */
  def bvecCompare(a: InternalRow, b: InternalRow): Int = {
    val ad = a.getInt(0); val bd = b.getInt(0)
    if (ad != bd) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $ad != $bd")
    val aw = a.getArray(1); val bw = b.getArray(1)
    var i = 0; val n = aw.numElements()
    while (i < n) {
      val l = java.lang.Long.reverse(aw.getLong(i))
      val r = java.lang.Long.reverse(bw.getLong(i))
      val c = java.lang.Long.compareUnsigned(l, r)
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** bvector subvector [lo, hi): null out of range (bvect.rs:210-241). */
  def bvecSlice(a: InternalRow, lo: Int, hi: Int): InternalRow = {
    val dims = a.getInt(0)
    if (lo < 0 || lo >= hi || hi > dims) return null
    val w = a.getArray(1)
    val outDims = hi - lo
    val out = new Array[Long]((outDims + 63) / 64)
    var i = 0
    while (i < outDims) {
      val src = lo + i
      if (((w.getLong(src >> 6) >>> (src & 63)) & 1L) == 1L)
        out(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    InternalRow(outDims, new GenericArrayData(out))
  }
}

/** vector -> vecf16 storage bits (array<short>). */
case class ToF16Bits(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)
  override def nullSafeEval(v: Any): Any = F16Kernels.toBits(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.F16Kernels.toBits($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "to_f16_bits"
}

/** vecf16 storage bits -> vector (exact f16 values as f32). */
case class F16BitsToVector(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.VectorType
  override def nullSafeEval(v: Any): Any = F16Kernels.toFloats(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.F16Kernels.toFloats($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "f16_bits_to_vector"
}

abstract class F16Dist extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.F16Kernels.$kernel($a, $b);")
}

case class F16L2sq(left: Expression, right: Expression) extends F16Dist {
  override protected def kernel = "l2sq"
  override def nullSafeEval(a: Any, b: Any): Any =
    F16Kernels.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "f16_l2sq"
}

case class F16NegDot(left: Expression, right: Expression) extends F16Dist {
  override protected def kernel = "negdot"
  override def nullSafeEval(a: Any, b: Any): Any =
    F16Kernels.negdot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "f16_negdot"
}

case class F16CosDist(left: Expression, right: Expression) extends F16Dist {
  override protected def kernel = "cosdist"
  override def nullSafeEval(a: Any, b: Any): Any =
    F16Kernels.cosdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "f16_cosdist"
}

/** vecf16 `+ - *` over the f16-rounded surface arrays (finalize.sql:
  * 97-148): f32 op + binary16 result rounding per element. op: 0 add,
  * 1 sub, 2 mul. */
case class F16Arith(left: Expression, right: Expression, op: Int)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    F16Kernels.arith(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], op)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.F16Kernels.arith($a, $b, $op);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = Seq("f16_add", "f16_sub", "f16_mul")(op)
}

/** vector_normalize(vecf16) (finalize.sql:628-629): per-element f16
  * rounding of v / ||v|| over the f16-rounded surface arrays. */
case class F16Normalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    F16Kernels.normalize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.F16Kernels.normalize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "f16_normalize"
}

/** Cast vector -> bvector (0/1-only rule). */
case class CastVecToBVec(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.BVectorType
  override def nullSafeEval(v: Any): Any =
    CastKernels.denseToBVec(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.CastKernels.denseToBVec($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "cast_vector_to_bvector"
}

case class SVecCompare(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    CastKernels.svecCompare(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CastKernels.svecCompare($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "svec_compare"
}

case class BVecCompare(left: Expression, right: Expression) extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    CastKernels.bvecCompare(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CastKernels.bvecCompare($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "bvec_compare"
}

case class BVecSlice(child: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression {
  override def first = child; override def second = lo; override def third = hi
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def dataType: DataType = VectorTypes.BVectorType
  override def nullSafeEval(v: Any, l: Any, h: Any): Any =
    CastKernels.bvecSlice(v.asInstanceOf[InternalRow],
      l.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, h) => s"""
      ${ev.value} = graft.functions.CastKernels.bvecSlice($v, $l, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(child = a, lo = b, hi = c)
  override def prettyName = "bvec_slice"
}
