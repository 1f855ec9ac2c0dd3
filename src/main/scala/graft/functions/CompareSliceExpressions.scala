package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims.AbstractDataType
import org.apache.spark.sql.types._

/**
 * Lexicographic comparison and subscript-slice over dense vectors.
 *
 * Comparison: element-wise lexicographic, shorter-prefix-less — usable as
 * sort keys and equality tests (reference: finalize.sql:168-406,
 * crates/base/src/vector/vect.rs:185-215). The reference's *operator*
 * functions error on dims mismatch (operators_vecf32.rs:37-70) while the
 * bare trait compare does not; we follow the trait (total order over
 * varying dims) because it composes with ORDER BY, and check dims in the
 * dedicated distance/arith operators instead.
 */
object CompareKernels {
  def compare(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    val k = math.min(n, m)
    var i = 0
    while (i < k) {
      val x = a.getFloat(i); val y = b.getFloat(i)
      if (x < y) return -1
      if (x > y) return 1
      i += 1
    }
    java.lang.Integer.compare(n, m)
  }

  /** [[compare]] with the OPERATOR-function dims check: the reference's
    * comparison operators error on mismatched dims
    * (src/error.rs:81 "Operands of the operator differs in dimensions
    * or scalar type.", operator.slt:35) while the bare trait compare
    * prefix-compares. Dispatched by the analyzer rule for the `< <= >
    * >= =` spellings over vector operands; the registered vec_compare
    * SQL function keeps the total-order trait semantics. */
  def compareStrict(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    if (n != m) throw new IllegalArgumentException(
      "Operands of the operator differs in dimensions or scalar type: " +
        s"$n != $m")
    compare(a, b)
  }

  /** [lo, hi) 0-based half-open; NULL on negative/inverted/out-of-range
    * bounds — NO clamping: the reference's `slice.get((start, end))`
    * returns None when hi > dims, and its SQL layer nulls negative
    * bounds (subscript_vecf32.rs:103-131, vect.rs:174-182). */
  def slice(a: ArrayData, lo: Int, hi: Int): ArrayData = {
    val dims = a.numElements()
    if (lo < 0 || lo >= hi || hi > dims) return null
    val out = new Array[Float](hi - lo)
    var i = lo
    while (i < hi) { out(i - lo) = a.getFloat(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** Three-way comparison (-1/0/1), the building block for =, <>, <, <=, >, >=. */
case class VecCompare(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    CompareKernels.compare(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CompareKernels.compare($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName = "vec_compare"
}

/** Dims-checked three-way comparison — the reference's operator-class
  * semantics (errors on mismatched dims where [[VecCompare]] orders by
  * prefix). Analyzer-dispatched only, never SQL-registered. */
case class VecCompareStrict(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    CompareKernels.compareStrict(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CompareKernels.compareStrict($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName = "vec_compare_strict"
}

case class VecSlice(child: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression with ExpectsInputTypes {
  override def first = child; override def second = lo; override def third = hi
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), IntegerType, IntegerType)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any, l: Any, h: Any): Any =
    CompareKernels.slice(v.asInstanceOf[ArrayData], l.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, l, h) => s"""
      ${ev.value} = graft.functions.CompareKernels.slice($v, $l, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(v: Expression, l: Expression, h: Expression) =
    copy(child = v, lo = l, hi = h)
  override def prettyName = "vec_slice"
}
