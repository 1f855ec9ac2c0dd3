package graft.types

import org.apache.spark.sql.types._

/**
 * Vector data-model for the engine, mirroring the reference's four vector
 * kinds (reference: crates/base/src/vector/mod.rs:16-21) re-expressed as
 * Spark SQL types:
 *
 *  - dense f32 `vector(n)`  -> ArrayType(FloatType)
 *  - dense f16 `vecf16(n)`  -> ArrayType(FloatType) whose values are
 *    float16-rounded (storage precision of the reference's half vectors,
 *    crates/base/src/scalar/f16.rs); rounding via [[Fp16]].
 *  - sparse f32 `svector(n)` -> StructType(dims INT, indexes ARRAY<INT>,
 *    values ARRAY<FLOAT>) — CSR-per-row like the reference
 *    (crates/base/src/vector/svect.rs:21-41): indexes strictly increasing,
 *    all < dims, values never zero.
 *  - binary `bvector(n)`    -> StructType(dims INT, words ARRAY<LONG>) —
 *    bits packed little-endian into 64-bit words with zero padding
 *    (crates/base/src/vector/bvect.rs:24-35).
 */
object VectorTypes {
  val MaxDenseDims  = 65535      // crates/base/src/vector/vect.rs:19
  val MaxSparseDims = 1048575    // crates/base/src/vector/svect.rs:22

  val SVectorType: StructType = StructType(Seq(
    StructField("dims", IntegerType, nullable = false),
    StructField("indexes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(FloatType, containsNull = false), nullable = false)))

  val BVectorType: StructType = StructType(Seq(
    StructField("dims", IntegerType, nullable = false),
    StructField("words", ArrayType(LongType, containsNull = false), nullable = false)))

  val VectorType: ArrayType = ArrayType(FloatType, containsNull = false)
}

/** IEEE-754 binary16 conversion (JDK < 20 lacks Float.float16ToFloat).
  * Standard public bit-twiddling algorithm; round-to-nearest-even. */
object Fp16 {
  /** f32 -> f16 bit pattern (round-to-nearest-even, overflow -> inf). */
  def floatToHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    var value = (bits & 0x7fffffff)
    if (value >= 0x47800000) { // overflow or inf/nan
      if (value > 0x7f800000) (sign | 0x7e00).toShort // NaN
      else (sign | 0x7c00).toShort                    // +-inf
    } else if (value >= 0x38800000) { // normal
      // round mantissa from 23 to 10 bits, nearest-even
      value = value + 0xfff + ((value >>> 13) & 1)
      ((sign | ((value - 0x38000000) >>> 13)) & 0xffff).toShort
    } else if (value < 0x33000000) { // underflow to zero
      sign.toShort
    } else { // subnormal
      val shift = 126 - (value >>> 23)
      val mant = (value & 0x7fffff) | 0x800000
      val rounded = (mant + (1 << (shift - 1)) - 1 + ((mant >>> shift) & 1)) >>> shift
      (sign | rounded).toShort
    }
  }

  /** f16 bit pattern -> f32. */
  def halfToFloat(h: Short): Float = {
    val hi = h & 0xffff
    val sign = (hi & 0x8000) << 16
    val exp = (hi >>> 10) & 0x1f
    val mant = hi & 0x3ff
    val bits =
      if (exp == 0x1f) sign | 0x7f800000 | (mant << 13)        // inf/nan
      else if (exp != 0) sign | ((exp + 112) << 23) | (mant << 13)
      else if (mant == 0) sign                                  // +-0
      else { // subnormal: normalize
        var m = mant; var e = -1
        while ((m & 0x400) == 0) { m <<= 1; e -= 1 }
        sign | ((113 + e) << 23) | ((m & 0x3ff) << 13)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Round a float through f16 precision (storage semantics of vecf16). */
  def roundTrip(f: Float): Float = halfToFloat(floatToHalf(f))
}

/**
 * Text formats, byte-compatible with the reference's literals:
 *  - dense  `'[1, 2, 3]'`        (reference: src/utils/parse.rs:20-82)
 *  - sparse `'{0:1.5, 2:3}/5'`   (reference: src/utils/parse.rs:98-200,
 *    src/datatype/text_svecf32.rs:10-96 — sorts unsorted indexes, rejects
 *    duplicates, drops explicit zeros)
 *  - bvector: dense literal restricted to 0/1
 *    (reference: src/datatype/text_bvector.rs)
 */
object VectorText {
  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Parse `'[x, y, z]'` into float values. */
  def parseDense(s: String): Array[Float] = {
    val t = s.trim
    if (t.length < 2 || t.head != '[' || t.last != ']')
      fail(s"malformed vector literal: $s")
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) fail("vector must have at least 1 dimension")
    // one trailing comma is tolerated ('[1,]' -> [1], cast.slt): the
    // reference tokenizer flushes on ',' and simply never flushes a
    // final empty token; interior empties still error ('[1,,3]')
    val parts0 = body.split(",", -1)
    val parts = if (parts0.length > 1 && parts0.last.trim.isEmpty)
      parts0.dropRight(1) else parts0
    val out = new Array[Float](parts.length)
    var i = 0
    while (i < parts.length) {
      val p = parts(i).trim
      if (p.isEmpty) fail(s"malformed vector literal: $s")
      out(i) = java.lang.Float.parseFloat(p)
      i += 1
    }
    if (out.length > VectorTypes.MaxDenseDims) fail("too many dimensions")
    out
  }

  /** One f32 the way the reference prints it (Rust `{}` Display,
    * src/datatype/text_vecf32.rs -> f32's shortest-roundtrip Display):
    * fewest digits that parse back to the same f32, plain decimal
    * (never exponent notation — 9.00004e10f prints 90000400000),
    * integral values without a fractional part. Java 17's
    * Float.toString supplies the shortest digit string; BigDecimal
    * expands the exponent form losslessly. */
  def formatFloat(f: Float): String = {
    if (java.lang.Float.isNaN(f)) "NaN"
    else if (java.lang.Float.isInfinite(f)) (if (f > 0) "inf" else "-inf")
    else {
      val s = java.lang.Float.toString(f)
      if (s.indexOf('E') < 0) {
        if (s.endsWith(".0")) s.substring(0, s.length - 2) else s
      } else {
        val plain = new java.math.BigDecimal(s).toPlainString
        if (plain.indexOf('.') >= 0) {
          var e = plain.length
          while (e > 0 && plain.charAt(e - 1) == '0') e -= 1
          if (e > 0 && plain.charAt(e - 1) == '.') e -= 1
          plain.substring(0, e)
        } else plain
      }
    }
  }

  def formatDense(v: Array[Float]): String =
    v.map(formatFloat).mkString("[", ", ", "]")

  /** Parse `'{i:v, ...}/dims'`. Sorts by index, rejects duplicates and
    * out-of-bounds indexes, drops zero values (reference semantics). */
  def parseSparse(s: String): (Int, Array[Int], Array[Float]) = {
    val t = s.trim
    val slash = t.lastIndexOf('/')
    if (slash < 0) fail(s"malformed svector literal: $s")
    val dims = java.lang.Integer.parseInt(t.substring(slash + 1).trim)
    if (dims < 1 || dims > VectorTypes.MaxSparseDims) fail(s"invalid dims: $dims")
    val braces = t.substring(0, slash).trim
    if (braces.length < 2 || braces.head != '{' || braces.last != '}')
      fail(s"malformed svector literal: $s")
    val body = braces.substring(1, braces.length - 1).trim
    val pairs = scala.collection.mutable.ArrayBuffer.empty[(Int, Float)]
    if (body.nonEmpty) {
      for (part <- body.split(",", -1)) {
        val kv = part.split(":", -1)
        if (kv.length != 2) fail(s"malformed svector literal: $s")
        val idx = java.lang.Integer.parseInt(kv(0).trim)
        val v = java.lang.Float.parseFloat(kv(1).trim)
        if (idx < 0 || idx >= dims) fail(s"index out of bounds: $idx")
        pairs += ((idx, v))
      }
    }
    val sorted = pairs.sortBy(_._1)
    var i = 1
    while (i < sorted.length) {
      if (sorted(i - 1)._1 == sorted(i)._1) fail(s"duplicate index: ${sorted(i)._1}")
      i += 1
    }
    val nz = sorted.filter(_._2 != 0.0f) // drop explicit zeros
    (dims, nz.map(_._1).toArray, nz.map(_._2).toArray)
  }

  def formatSparse(dims: Int, indexes: Array[Int], values: Array[Float]): String = {
    val body = indexes.zip(values)
      .map { case (i, v) => s"$i:${formatFloat(v)}" }.mkString(", ")
    s"{$body}/$dims"
  }

  /** Parse bvector literal `'[0, 1, 1]'` into (dims, packed words). */
  def parseBinary(s: String): (Int, Array[Long]) = {
    val bits = parseDense(s)
    val dims = bits.length
    val words = new Array[Long]((dims + 63) / 64)
    var i = 0
    while (i < dims) {
      bits(i) match {
        case 0.0f => ()
        case 1.0f => words(i >> 6) |= (1L << (i & 63))
        case other => fail(s"bvector element must be 0 or 1, got $other")
      }
      i += 1
    }
    (dims, words)
  }

  def formatBinary(dims: Int, words: Array[Long]): String = {
    val sb = new StringBuilder("[")
    var i = 0
    while (i < dims) {
      if (i > 0) sb.append(", ")
      sb.append(if (((words(i >> 6) >>> (i & 63)) & 1L) == 1L) '1' else '0')
      i += 1
    }
    sb.append(']').toString
  }
}
