package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims.AbstractDataType
import org.apache.spark.sql.types._

/**
 * Dense-vector (ArrayType(FloatType)) scalar expressions with whole-stage
 * codegen. Semantics mirror the reference's dense kernels:
 *
 *  - l2sq    `<->` : squared L2, sum((x-y)^2)   (crates/base/src/vector/vect.rs:119-121)
 *  - negdot  `<#>` : negative dot, -sum(x*y)    (vect.rs:114-116)
 *  - cosdist `<=>` : 1 - dot/sqrt(|x||y|)       (vect.rs:124-129)
 *
 * All kernels accumulate in double, iterating elements sequentially
 * (i = 0..n-1), so results are bit-identical to a sequential oracle that
 * performs the same double-precision op chain. Dimension mismatch throws,
 * matching the reference's operator functions
 * (src/datatype/operators_vecf32.rs:37-70).
 */
object DenseKernels {
  @inline def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $n != $m")

  def l2sq(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def cosDist(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); checkDims(n, b.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      xy += x * y; xx += x * x; yy += y * y; i += 1
    }
    1.0 - xy / math.sqrt(xx * yy)
  }

  def norm(a: ArrayData): Double = {
    val n = a.numElements(); var acc = 0.0; var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val nrm = norm(a)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = (a.getFloat(i) / nrm).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  def toF16(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = graft.types.Fp16.roundTrip(a.getFloat(i)); i += 1 }
    new GenericArrayData(out)
  }

  def parse(s: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    new GenericArrayData(graft.types.VectorText.parseDense(s.toString))

  def format(a: ArrayData): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.types.VectorText.formatDense(a.toFloatArray()))
}

/** Base for binary dense-vector -> double distance expressions. */
abstract class DenseDistanceExpression extends BinaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Name of the static kernel method on DenseKernels. */
  protected def kernel: String

  override def nullSafeEval(a: Any, b: Any): Any =
    evalKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  protected def evalKernel(a: ArrayData, b: ArrayData): Double

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DenseKernels.$kernel($a, $b);")
}

case class L2sqDistance(left: Expression, right: Expression)
    extends DenseDistanceExpression {
  override protected def kernel = "l2sq"
  override protected def evalKernel(a: ArrayData, b: ArrayData) = DenseKernels.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "l2sq_distance"
}

case class NegDotDistance(left: Expression, right: Expression)
    extends DenseDistanceExpression {
  override protected def kernel = "dot"
  override protected def evalKernel(a: ArrayData, b: ArrayData) = -DenseKernels.dot(a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = -graft.functions.DenseKernels.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "negdot_distance"
}

case class CosDistance(left: Expression, right: Expression)
    extends DenseDistanceExpression {
  override protected def kernel = "cosDist"
  override protected def evalKernel(a: ArrayData, b: ArrayData) = DenseKernels.cosDist(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cos_distance"
}

/** Element-wise arithmetic (+ - *) over dense vectors; dims must match
  * (reference: finalize.sql:90-148, src/datatype/operators_vecf32.rs:7-14). */
case class DenseArith(left: Expression, right: Expression, op: Char)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements(); DenseKernels.checkDims(n, b.numElements())
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      out(i) = op match {
        case '+' => x + y
        case '-' => x - y
        case '*' => x * y
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = op match {
    case '+' => "vec_add"; case '-' => "vec_sub"; case '*' => "vec_mul"
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val opStr = op.toString
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
        int $n = $a.numElements();
        graft.functions.DenseKernels.checkDims($n, $b.numElements());
        float[] $out = new float[$n];
        for (int $i = 0; $i < $n; $i++) {
          $out[$i] = $a.getFloat($i) $opStr $b.getFloat($i);
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """
    })
  }
}

/** L2 norm of a dense vector (reference: finalize.sql:613-623). */
case class VectorNorm(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = DenseKernels.norm(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.DenseKernels.norm($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vector_norm"
}

/** dims of any vector type (finalize.sql:601-611, ×4 overloads folded
  * into one type-dispatching expression): dense float arrays and f16
  * bit arrays report their length; svector/bvector structs report
  * their `dims` field. */
case class VectorDims(child: Expression) extends UnaryExpression {
  private def fromStruct: Boolean = child.dataType.isInstanceOf[StructType]
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(ShortType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType if s.nonEmpty && s.head.name == "dims" &&
        s.head.dataType == IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_dims does not support type ${other.catalogString}")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    if (fromStruct) v.asInstanceOf[InternalRow].getInt(0)
    else v.asInstanceOf[ArrayData].numElements()
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (fromStruct) s"${ev.value} = $c.getInt(0);"
      else s"${ev.value} = $c.numElements();")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vector_dims"
}

/** v / ||v|| (reference: finalize.sql:625-632, vect.rs:142-147). */
case class VectorNormalize(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DenseKernels.normalize(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DenseKernels.normalize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vector_normalize"
}

/** Round every element through IEEE binary16 — the storage semantics of
  * `vecf16(n)` (reference: crates/base/src/scalar/f16.rs). */
case class ToF16(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DenseKernels.toF16(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DenseKernels.toF16($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_vecf16"
}

/** Parse a dense `'[x, y, z]'` literal (reference: src/utils/parse.rs:20-82). */
case class ParseVector(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DenseKernels.parse(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DenseKernels.parse($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "parse_vector"
}

/** Format a dense vector as `'[x, y, z]'` (reference: text_vecf32.rs out). */
case class FormatVector(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    DenseKernels.format(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DenseKernels.format($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "format_vector"
}
