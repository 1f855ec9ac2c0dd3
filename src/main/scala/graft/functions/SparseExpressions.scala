package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shims.AbstractDataType
import org.apache.spark.sql.types._
import graft.types.VectorTypes

/**
 * Sparse vector (`svector`) kernels and expressions. Representation:
 * StructType(dims INT, indexes ARRAY<INT>, values ARRAY<FLOAT>) — CSR per
 * row, indexes strictly increasing, values nonzero (reference:
 * crates/base/src/vector/svect.rs:21-41).
 *
 * Distance kernels iterate the index merge in increasing order and
 * accumulate in double, so results are bit-identical to the equivalent
 * dense sequential computation (zero terms add exactly 0.0).
 *
 * Reference kernels: dot svect.rs:179-182, l2 svect.rs:184-188, cos
 * svect.rs:190-196; arithmetic merge svect.rs:228-352 (mul drops produced
 * zeros); slice svect.rs:354-402.
 */
object SparseKernels {
  @inline def checkDims(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"vectors differ in dimensions: $n != $m")

  def dot(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    var i = 0; var j = 0; var acc = 0.0
    val n = ai.numElements(); val m = bi.numElements()
    while (i < n && j < m) {
      val x = ai.getInt(i); val y = bi.getInt(j)
      if (x == y) { acc += av.getFloat(i).toDouble * bv.getFloat(j).toDouble; i += 1; j += 1 }
      else if (x < y) i += 1 else j += 1
    }
    acc
  }

  def l2sq(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    var i = 0; var j = 0; var acc = 0.0
    val n = ai.numElements(); val m = bi.numElements()
    while (i < n || j < m) {
      val x = if (i < n) ai.getInt(i) else Int.MaxValue
      val y = if (j < m) bi.getInt(j) else Int.MaxValue
      if (x == y) {
        val d = av.getFloat(i).toDouble - bv.getFloat(j).toDouble
        acc += d * d; i += 1; j += 1
      } else if (x < y) {
        val d = av.getFloat(i).toDouble; acc += d * d; i += 1
      } else {
        val d = bv.getFloat(j).toDouble; acc += d * d; j += 1
      }
    }
    acc
  }

  def cosDist(a: InternalRow, b: InternalRow): Double = {
    checkDims(a.getInt(0), b.getInt(0))
    val xy = dot(a, b)
    val xx = normSq(a); val yy = normSq(b)
    1.0 - xy / math.sqrt(xx * yy)
  }

  def normSq(a: InternalRow): Double = {
    val av = a.getArray(2); var acc = 0.0; var i = 0
    val n = av.numElements()
    while (i < n) { val x = av.getFloat(i).toDouble; acc += x * x; i += 1 }
    acc
  }

  def norm(a: InternalRow): Double = math.sqrt(normSq(a))

  /** Element-wise merge; op: 0=add 1=sub 2=mul. Zero results are dropped
    * (svector invariant). Mul only needs the index intersection. */
  def arith(a: InternalRow, b: InternalRow, op: Int): InternalRow = {
    checkDims(a.getInt(0), b.getInt(0))
    val dims = a.getInt(0)
    val ai = a.getArray(1); val av = a.getArray(2)
    val bi = b.getArray(1); val bv = b.getArray(2)
    val n = ai.numElements(); val m = bi.numElements()
    val outI = new Array[Int](n + m); val outV = new Array[Float](n + m)
    var i = 0; var j = 0; var k = 0
    while (i < n || j < m) {
      val x = if (i < n) ai.getInt(i) else Int.MaxValue
      val y = if (j < m) bi.getInt(j) else Int.MaxValue
      var idx = 0; var v = 0.0f
      if (x == y) {
        idx = x
        v = op match {
          case 0 => av.getFloat(i) + bv.getFloat(j)
          case 1 => av.getFloat(i) - bv.getFloat(j)
          case 2 => av.getFloat(i) * bv.getFloat(j)
        }
        i += 1; j += 1
      } else if (x < y) {
        idx = x
        v = op match {
          case 0 => av.getFloat(i)
          case 1 => av.getFloat(i)
          case 2 => 0.0f
        }
        i += 1
      } else {
        idx = y
        v = op match {
          case 0 => bv.getFloat(j)
          case 1 => -bv.getFloat(j)
          case 2 => 0.0f
        }
        j += 1
      }
      if (v != 0.0f) { outI(k) = idx; outV(k) = v; k += 1 }
    }
    mk(dims, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
  }

  /** Build the struct row. */
  def mk(dims: Int, idx: Array[Int], vals: Array[Float]): InternalRow =
    InternalRow(dims, new GenericArrayData(idx), new GenericArrayData(vals))

  /** vector_normalize(svector) (finalize.sql:631-632): values / ||v||,
    * norm accumulated in double over the CSR values in index order —
    * zero terms contribute exactly 0.0, so the result equals the dense
    * normalize of the densified view element-wise (the oracle replay).
    * Dims/indexes are unchanged; a produced zero (float underflow of a
    * subnormal value) is dropped to keep the type's nonzero invariant,
    * the SVecArith mul convention. */
  def normalize(a: InternalRow): InternalRow = {
    val dims = a.getInt(0)
    val ai = a.getArray(1); val av = a.getArray(2)
    val n = ai.numElements()
    val nrm = norm(a)
    val outI = new Array[Int](n); val outV = new Array[Float](n)
    var i = 0; var k = 0
    while (i < n) {
      val v = (av.getFloat(i) / nrm).toFloat
      if (v != 0.0f) { outI(k) = ai.getInt(i); outV(k) = v; k += 1 }
      i += 1
    }
    mk(dims, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
  }

  /** to_svector(dims, idx[], val[]): sorts pairs, errors on dup/oob,
    * drops zeros (reference: src/datatype/functions_svecf32.rs:22-61). */
  def toSVector(dims: Int, idx: ArrayData, vals: ArrayData): InternalRow = {
    val n = idx.numElements()
    if (vals.numElements() != n)
      throw new IllegalArgumentException("indexes and values lengths differ")
    val pairs = new Array[(Int, Float)](n)
    var i = 0
    while (i < n) {
      val ix = idx.getInt(i)
      if (ix < 0 || ix >= dims) throw new IllegalArgumentException(s"index out of bounds: $ix")
      pairs(i) = (ix, vals.getFloat(i)); i += 1
    }
    val sorted = pairs.sortBy(_._1)
    i = 1
    while (i < n) {
      if (sorted(i - 1)._1 == sorted(i)._1)
        throw new IllegalArgumentException(s"duplicate index: ${sorted(i)._1}")
      i += 1
    }
    val nz = sorted.filter(_._2 != 0.0f)
    mk(dims, nz.map(_._1), nz.map(_._2))
  }

  /** Densify to ArrayType(Float). */
  def toDense(a: InternalRow): ArrayData = {
    val dims = a.getInt(0)
    val ai = a.getArray(1); val av = a.getArray(2)
    val out = new Array[Float](dims)
    var i = 0; val n = ai.numElements()
    while (i < n) { out(ai.getInt(i)) = av.getFloat(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Build sparse from dense, dropping zeros. */
  def fromDense(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val outI = new Array[Int](n); val outV = new Array[Float](n)
    var i = 0; var k = 0
    while (i < n) {
      val v = arr.getFloat(i)
      if (v != 0.0f) { outI(k) = i; outV(k) = v; k += 1 }
      i += 1
    }
    mk(n, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
  }

  /** Subvector slice [lo, hi) — 0-based half-open, indexes re-based;
    * NULL on negative/inverted/out-of-range bounds, NO clamping
    * (reference svect.rs:354-379: `start >= end || end > dims` -> None,
    * SQL layer nulls negative bounds). */
  def slice(a: InternalRow, lo: Int, hi: Int): InternalRow = {
    val dims = a.getInt(0)
    if (lo < 0 || lo >= hi || hi > dims) return null
    val l = lo; val h = hi
    val ai = a.getArray(1); val av = a.getArray(2)
    val n = ai.numElements()
    val outI = new Array[Int](n); val outV = new Array[Float](n)
    var i = 0; var k = 0
    while (i < n) {
      val ix = ai.getInt(i)
      if (ix >= l && ix < h) { outI(k) = ix - l; outV(k) = av.getFloat(i); k += 1 }
      i += 1
    }
    mk(h - l, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
  }

  def parse(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    val (d, i, v) = graft.types.VectorText.parseSparse(s.toString)
    mk(d, i, v)
  }

  def format(a: InternalRow): org.apache.spark.unsafe.types.UTF8String = {
    val ai = a.getArray(1); val av = a.getArray(2)
    org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.types.VectorText.formatSparse(a.getInt(0), ai.toIntArray(), av.toFloatArray()))
  }
}

abstract class SparseBinaryExpr extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case s: StructType => s.length == 3
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects svector structs, got ${left.dataType} / ${right.dataType}")
  }
}

case class SVecL2sq(left: Expression, right: Expression) extends SparseBinaryExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SparseKernels.l2sq(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SparseKernels.l2sq($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "svec_l2sq"
}

case class SVecNegDot(left: Expression, right: Expression) extends SparseBinaryExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    -SparseKernels.dot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = -graft.functions.SparseKernels.dot($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "svec_negdot"
}

case class SVecCosDist(left: Expression, right: Expression) extends SparseBinaryExpr {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SparseKernels.cosDist(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SparseKernels.cosDist($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName = "svec_cosdist"
}

case class SVecArith(left: Expression, right: Expression, op: Int)
    extends SparseBinaryExpr {
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(a: Any, b: Any): Any =
    SparseKernels.arith(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow], op)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SparseKernels.arith($a, $b, $op);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName = Seq("svec_add", "svec_sub", "svec_mul")(op)
}

/** vector_normalize(svector): see [[SparseKernels.normalize]]. */
case class SVecNormalize(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(v: Any): Any =
    SparseKernels.normalize(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SparseKernels.normalize($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "svec_normalize"
}

case class SVecNorm(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = SparseKernels.norm(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SparseKernels.norm($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "svec_norm"
}

case class ToSVector(dims: Expression, indexes: Expression, values: Expression)
    extends TernaryExpression {
  override def first = dims; override def second = indexes; override def third = values
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(d: Any, i: Any, v: Any): Any =
    SparseKernels.toSVector(d.asInstanceOf[Int],
      i.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, i, v) =>
      s"${ev.value} = graft.functions.SparseKernels.toSVector($d, $i, $v);")
  override protected def withNewChildrenInternal(d: Expression, i: Expression, v: Expression) =
    copy(dims = d, indexes = i, values = v)
  override def prettyName = "to_svector"
}

case class SVecToDense(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any = SparseKernels.toDense(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SparseKernels.toDense($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "svec_to_dense"
}

case class SVecFromDense(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(v: Any): Any = SparseKernels.fromDense(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SparseKernels.fromDense($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "svec_from_dense"
}

/** Slice [lo, hi) — NULL on empty/out-of-bounds result like the
  * reference's subscript (src/datatype/subscript_vecf32.rs:14-100). */
case class SVecSlice(child: Expression, lo: Expression, hi: Expression)
    extends TernaryExpression {
  override def first = child; override def second = lo; override def third = hi
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(v: Any, l: Any, h: Any): Any =
    SparseKernels.slice(v.asInstanceOf[InternalRow], l.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (v, l, h) => s"""
      ${ev.value} = graft.functions.SparseKernels.slice($v, $l, $h);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
    code
  }
  override protected def withNewChildrenInternal(v: Expression, l: Expression, h: Expression) =
    copy(child = v, lo = l, hi = h)
  override def prettyName = "svec_slice"
}

case class ParseSVector(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = VectorTypes.SVectorType
  override def nullSafeEval(v: Any): Any =
    SparseKernels.parse(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SparseKernels.parse($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "parse_svector"
}

case class FormatSVector(child: Expression) extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = SparseKernels.format(v.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.functions.SparseKernels.format($c);")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName = "format_svector"
}
