package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.types.VectorTypes

/**
 * Element-wise vector aggregates, mirroring the reference's
 * sfunc/combinefunc/finalfunc triple (parallel-safe partial aggregation,
 * reference: src/datatype/aggregate_vecf32.rs:44-146, finalize.sql:654-684):
 * update = per-partition accumulate, merge = combine partial states,
 * eval = final division. State accumulates in double; dims mismatch inside
 * one aggregate errors ("differs in dimensions", aggregate_vecf32.rs:66).
 */
// NOTE: must stay parameterless — Expression subclasses are Java-serialized
// into tasks, and deserialization calls the no-arg ctor of the first
// non-serializable superclass in the chain.
abstract class VecAggBase extends TypedImperativeAggregate[VecAggBuffer] {

  override def createAggregationBuffer(): VecAggBuffer = new VecAggBuffer(null, 0L)

  protected def inputVector(row: InternalRow): ArrayData

  override def update(buf: VecAggBuffer, input: InternalRow): VecAggBuffer = {
    val arr = inputVector(input)
    if (arr != null) {
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      else if (buf.sums.length != n)
        throw new IllegalArgumentException(
          s"aggregated vectors differ in dimensions: ${buf.sums.length} != $n")
      var i = 0
      while (i < n) { buf.sums(i) += arr.getFloat(i).toDouble; i += 1 }
      buf.count += 1
    }
    buf
  }

  override def merge(a: VecAggBuffer, b: VecAggBuffer): VecAggBuffer = {
    if (b.sums == null) a
    else if (a.sums == null) b
    else {
      if (a.sums.length != b.sums.length)
        throw new IllegalArgumentException(
          s"aggregated vectors differ in dimensions: ${a.sums.length} != ${b.sums.length}")
      var i = 0
      while (i < a.sums.length) { a.sums(i) += b.sums(i); i += 1 }
      a.count += b.count
      a
    }
  }

  override def serialize(buf: VecAggBuffer): Array[Byte] = {
    val n = if (buf.sums == null) -1 else buf.sums.length
    val bb = ByteBuffer.allocate(12 + math.max(n, 0) * 8)
    bb.putLong(buf.count); bb.putInt(n)
    if (n > 0) { var i = 0; while (i < n) { bb.putDouble(buf.sums(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAggBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val count = bb.getLong(); val n = bb.getInt()
    val sums = if (n < 0) null else {
      val a = new Array[Double](n)
      var i = 0; while (i < n) { a(i) = bb.getDouble(); i += 1 }
      a
    }
    new VecAggBuffer(sums, count)
  }

  override def nullable: Boolean = true
}

final class VecAggBuffer(var sums: Array[Double], var count: Long)

/** sum(vector) -> vector (f32) — identity finish (aggregate_vecf32.rs:141-146). */
case class VecSum(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends VecAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def inputVector(row: InternalRow): ArrayData = {
    val v = child.eval(row)
    if (v == null) null else v.asInstanceOf[ArrayData]
  }
  override def eval(buf: VecAggBuffer): Any = {
    if (buf.sums == null) null
    else {
      val out = new Array[Float](buf.sums.length)
      var i = 0; while (i < out.length) { out(i) = buf.sums(i).toFloat; i += 1 }
      new GenericArrayData(out)
    }
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
  override def prettyName = "vec_sum"
}

/** avg(vector) -> vector (f32) — divides by count (aggregate_vecf32.rs:44-139). */
case class VecAvg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends VecAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def inputVector(row: InternalRow): ArrayData = {
    val v = child.eval(row)
    if (v == null) null else v.asInstanceOf[ArrayData]
  }
  override def eval(buf: VecAggBuffer): Any = {
    if (buf.sums == null || buf.count == 0) null
    else {
      val out = new Array[Float](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = (buf.sums(i) / buf.count).toFloat; i += 1 }
      new GenericArrayData(out)
    }
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
  override def prettyName = "vec_avg"
}

final class MinMaxBuffer(var mins: Array[Float], var maxs: Array[Float])

/** Per-dimension (min, max) over a vector column in ONE aggregate —
  * quantizer training statistics (crates/quantization/src/scalar.rs
  * trains from per-dim bounds). Replaces the 2×dims-column wide plan:
  * at dims=1536 that was a 3,000-column Catalyst plan; this is one
  * TypedImperativeAggregate with a 2×dims float state. */
case class VecMinMax(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MinMaxBuffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("mins", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("maxs", ArrayType(FloatType, containsNull = false), nullable = false)))
  override def createAggregationBuffer(): MinMaxBuffer = new MinMaxBuffer(null, null)
  override def update(buf: MinMaxBuffer, input: InternalRow): MinMaxBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.mins == null) {
        buf.mins = Array.fill(n)(Float.PositiveInfinity)
        buf.maxs = Array.fill(n)(Float.NegativeInfinity)
      } else if (buf.mins.length != n)
        throw new IllegalArgumentException(
          s"aggregated vectors differ in dimensions: ${buf.mins.length} != $n")
      var i = 0
      while (i < n) {
        val x = arr.getFloat(i)
        if (x < buf.mins(i)) buf.mins(i) = x
        if (x > buf.maxs(i)) buf.maxs(i) = x
        i += 1
      }
    }
    buf
  }
  override def merge(a: MinMaxBuffer, b: MinMaxBuffer): MinMaxBuffer = {
    if (b.mins == null) a
    else if (a.mins == null) b
    else {
      if (a.mins.length != b.mins.length)
        throw new IllegalArgumentException(
          s"aggregated vectors differ in dimensions: ${a.mins.length} != ${b.mins.length}")
      var i = 0
      while (i < a.mins.length) {
        if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
        if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
        i += 1
      }
      a
    }
  }
  override def eval(buf: MinMaxBuffer): Any =
    if (buf.mins == null) null
    else InternalRow(new GenericArrayData(buf.mins), new GenericArrayData(buf.maxs))
  override def serialize(buf: MinMaxBuffer): Array[Byte] = {
    val n = if (buf.mins == null) -1 else buf.mins.length
    val bb = ByteBuffer.allocate(4 + math.max(n, 0) * 8)
    bb.putInt(n)
    if (n > 0) {
      var i = 0; while (i < n) { bb.putFloat(buf.mins(i)); i += 1 }
      i = 0; while (i < n) { bb.putFloat(buf.maxs(i)); i += 1 }
    }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): MinMaxBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    if (n < 0) new MinMaxBuffer(null, null)
    else {
      val mins = new Array[Float](n); val maxs = new Array[Float](n)
      var i = 0; while (i < n) { mins(i) = bb.getFloat(); i += 1 }
      i = 0; while (i < n) { maxs(i) = bb.getFloat(); i += 1 }
      new MinMaxBuffer(mins, maxs)
    }
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
  override def prettyName = "vec_min_max"
}

/** sum(svector) -> svector — dense double accumulation state like the
  * reference (src/datatype/aggregate_svecf32.rs), zero results dropped. */
case class SVecSum(child: Expression, dims: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends VecAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = VectorTypes.SVectorType
  override protected def inputVector(row: InternalRow): ArrayData = {
    val v = child.eval(row)
    if (v == null) null
    else SparseKernels.toDense(v.asInstanceOf[InternalRow]) // dense accumulate
  }
  override def eval(buf: VecAggBuffer): Any = {
    if (buf.sums == null) null
    else {
      val n = buf.sums.length
      val outI = new Array[Int](n); val outV = new Array[Float](n)
      var i = 0; var k = 0
      while (i < n) {
        val f = buf.sums(i).toFloat
        if (f != 0.0f) { outI(k) = i; outV(k) = f; k += 1 }
        i += 1
      }
      SparseKernels.mk(n, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
    }
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
  override def prettyName = "svec_sum"
}

/** avg(svector) -> svector — sum/count with zero-drop on finish
  * (finalize.sql:670-684, aggregate_svecf32.rs:253-276). */
case class SVecAvg(child: Expression, dims: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends VecAggBase {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = VectorTypes.SVectorType
  override protected def inputVector(row: InternalRow): ArrayData = {
    val v = child.eval(row)
    if (v == null) null
    else SparseKernels.toDense(v.asInstanceOf[InternalRow])
  }
  override def eval(buf: VecAggBuffer): Any = {
    if (buf.sums == null || buf.count == 0) null
    else {
      val n = buf.sums.length
      val outI = new Array[Int](n); val outV = new Array[Float](n)
      var i = 0; var k = 0
      while (i < n) {
        val f = (buf.sums(i) / buf.count).toFloat
        if (f != 0.0f) { outI(k) = i; outV(k) = f; k += 1 }
        i += 1
      }
      SparseKernels.mk(n, java.util.Arrays.copyOf(outI, k), java.util.Arrays.copyOf(outV, k))
    }
  }
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(child = cs.head)
  override def prettyName = "svec_avg"
}
