package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.types.VectorTypes

/**
 * Binary vector (`bvector`) kernels: bits packed little-endian into u64
 * words, padding bits zero (reference: crates/base/src/vector/bvect.rs).
 *
 * Distances: Hamming = popcount(xor) (bvect.rs:165-167); negdot =
 * -popcount(and) (bvect.rs:150-152); Jaccard dist = 1 - |and|/|or|
 * (bvect.rs:169-173); norm = sqrt(popcount) (bvect.rs:145-147).
 */
object BitKernels {
  @inline def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $n != $m")

  def hamming(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val aw = a.getArray(1); val bw = b.getArray(1)
    var acc = 0L; var i = 0; val n = aw.numElements()
    while (i < n) { acc += java.lang.Long.bitCount(aw.getLong(i) ^ bw.getLong(i)); i += 1 }
    acc.toDouble
  }

  def negdot(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val aw = a.getArray(1); val bw = b.getArray(1)
    var acc = 0L; var i = 0; val n = aw.numElements()
    while (i < n) { acc += java.lang.Long.bitCount(aw.getLong(i) & bw.getLong(i)); i += 1 }
    -acc.toDouble
  }

  def jaccard(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val aw = a.getArray(1); val bw = b.getArray(1)
    var inter = 0L; var union = 0L; var i = 0; val n = aw.numElements()
    while (i < n) {
      val x = aw.getLong(i); val y = bw.getLong(i)
      inter += java.lang.Long.bitCount(x & y)
      union += java.lang.Long.bitCount(x | y)
      i += 1
    }
    1.0 - inter.toDouble / union.toDouble
  }

  def popcount(a: InternalRow): Long = {
    val aw = a.getArray(1)
    var acc = 0L; var i = 0; val n = aw.numElements()
    while (i < n) { acc += java.lang.Long.bitCount(aw.getLong(i)); i += 1 }
    acc
  }

  def norm(a: InternalRow): Double = math.sqrt(popcount(a).toDouble)

  /** op: 0=and 1=or 2=xor (reference: finalize.sql:150-166). */
  def bitop(a: InternalRow, b: InternalRow, op: Int): InternalRow = {
    checkDims(a.getInt(0), b.getInt(0))
    val dims = a.getInt(0)
    val aw = a.getArray(1); val bw = b.getArray(1)
    val n = aw.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = op match {
        case 0 => aw.getLong(i) & bw.getLong(i)
        case 1 => aw.getLong(i) | bw.getLong(i)
        case 2 => aw.getLong(i) ^ bw.getLong(i)
      }
      i += 1
    }
    InternalRow(dims, new GenericArrayData(out))
  }

  /** binarize(vector): bit i = (x_i > 0)
    * (reference: src/datatype/functions_bvector.rs:17-27). */
  def binarize(arr: ArrayData): InternalRow = {
    val dims = arr.numElements()
    val words = new Array[Long]((dims + 63) / 64)
    var i = 0
    while (i < dims) {
      if (arr.getFloat(i) > 0.0f) words(i >> 6) |= (1L << (i & 63))
      i += 1
    }
    InternalRow(dims, new GenericArrayData(words))
  }

  /** Densify to 0/1 float array. */
  def toDense(a: InternalRow): ArrayData = {
    val dims = a.getInt(0); val w = a.getArray(1)
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) {
      out(i) = if (((w.getLong(i >> 6) >>> (i & 63)) & 1L) == 1L) 1.0f else 0.0f
      i += 1
    }
    new GenericArrayData(out)
  }


  def parse(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val (d, w) = graft.types.VectorText.parseBinary(s.toString)
    InternalRow(d, new GenericArrayData(w))
  }

  def format(a: InternalRow): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.types.VectorText.formatBinary(a.getInt(0), a.getArray(1).toLongArray()))
}

abstract class BitBinaryDist extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  protected def kernel: String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitKernels.$kernel($a, $b);")
}

case class BVecHamming(left: Expression, right: Expression) extends BitBinaryDist {
  override protected def kernel = "hamming"
  override def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.hamming(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "bvec_hamming"
}

case class BVecNegDot(left: Expression, right: Expression) extends BitBinaryDist {
  override protected def kernel = "negdot"
  override def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.negdot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "bvec_negdot"
}

case class BVecJaccard(left: Expression, right: Expression) extends BitBinaryDist {
  override protected def kernel = "jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.jaccard(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "bvec_jaccard"
}

case class BVecOp(left: Expression, right: Expression, op: Int)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.BVectorType
  override def nullSafeEval(a: Any, b: Any): Any =
    BitKernels.bitop(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow], op)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitKernels.bitop($a, $b, $op);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName = Seq("bvec_and", "bvec_or", "bvec_xor")(op)
}

case class Binarize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.BVectorType
  override def nullSafeEval(v: Any): Any = BitKernels.binarize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BitKernels.binarize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "binarize"
}

case class BVecToDense(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any = BitKernels.toDense(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BitKernels.toDense($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "bvec_to_dense"
}

case class BVecNorm(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = BitKernels.norm(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BitKernels.norm($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "bvec_norm"
}

case class ParseBVector(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.BVectorType
  override def nullSafeEval(v: Any): Any =
    BitKernels.parse(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BitKernels.parse($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "parse_bvector"
}

case class FormatBVector(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = BitKernels.format(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.BitKernels.format($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "format_bvector"
}
