package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import graft.types.VectorTypes

/**
 * Type-dispatching distance / sphere operators — the analysis-time
 * analog of the reference's operator overload sets (finalize.sql
 * CREATE OPERATOR blocks, src/sql/finalize.sql:408-574): one SQL
 * spelling per operator, resolved to the operand type family's kernel.
 * The injected parser rewrites the reference's operator tokens onto
 * these functions ([[graft.index.OpSqlRewrite]]):
 *
 *   `a <-> b`  -> graft_op_l2(a, b)       (l2sq; bvector: hamming)
 *   `a <#> b`  -> graft_op_dot(a, b)      (negative dot)
 *   `a <=> b`  -> graft_op_cos(a, b)      (cosine distance)
 *   `a <~> b`  -> graft_op_jaccard(a, b)  (bvector jaccard)
 *   `v <<->> sphere(c, r)` -> graft_sphere_l2(v, sphere(c, r))  etc.
 *
 * Families by Spark type ([[VectorTypes]]): dense f32 AND vecf16
 * surface columns are `array<float>` (vecf16 stores f16-ROUNDED floats
 * — the dense kernels over them equal the reference's f16 operators,
 * the q_vecf16_dist convention), f16 BIT arrays are `array<short>`,
 * svector/bvector are their CSR / packed-word structs. A string operand
 * coerces through the OTHER side's parser (the reference's implicit
 * unknown-literal casts): dense <- parse_vector, svec <- parse_svector,
 * bvec <- parse_bvector, f16 bits <- to_f16_bits(parse_vector).
 *
 * [[RuntimeReplaceable]]: the dispatch happens once children resolve,
 * and the optimizer's ReplaceExpressions (Finish Analysis) swaps in the
 * concrete kernel BEFORE the ANN pushdown arms run — so a rewritten
 * `ORDER BY val <-> '[...]' LIMIT k` hits the very same
 * L2sqDistance-shaped match as the native spelling.
 *
 * `<=>` collision: Spark spells null-safe equality `<=>`. On any
 * vector-typed operand the reference dialect wins (cosine distance);
 * on every other type graft_op_cos falls back to EqualNullSafe, so
 * ordinary Spark SQL text keeps its meaning.
 */
object OpDispatch {
  private def isSvec(t: DataType): Boolean = t match {
    case s: StructType => s.fieldNames.toSeq == Seq("dims", "indexes", "values")
    case _ => false
  }
  private def isBvec(t: DataType): Boolean = t match {
    case s: StructType => s.fieldNames.toSeq == Seq("dims", "words")
    case _ => false
  }

  /** Operand type -> family key, None for non-vector types. */
  private[graft] def family(t: DataType): Option[String] = t match {
    case ArrayType(FloatType, _) => Some("dense")
    case ArrayType(ShortType, _) => Some("f16")
    case t if isSvec(t) => Some("svec")
    case t if isBvec(t) => Some("bvec")
    case _ => None
  }

  /** String literal -> the family's vector parser. */
  private def coerce(e: Expression, fam: String): Expression = fam match {
    case "dense" => ParseVector(e)
    case "f16" => ToF16Bits(ParseVector(e))
    case "svec" => ParseSVector(e)
    case "bvec" => ParseBVector(e)
  }

  /** Dispatch (left, right, metric) onto the family kernel; scala.Left(msg)
    * when no overload exists (the reference's "operator does not exist"
    * analog, surfaced as a type-check failure). */
  def dist(left: Expression, right: Expression, metric: String)
      : Either[String, Expression] = {
    val lf = family(left.dataType)
    val rf = family(right.dataType)
    val fam = lf.orElse(rf).getOrElse(return scala.Left(
      s"operator ${opSpelling(metric)} needs a vector operand, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}"))
    def side(e: Expression, f: Option[String]): Either[String, Expression] =
      f match {
        case Some(`fam`) => scala.Right(e)
        case Some(other) => scala.Left(s"operator ${opSpelling(metric)} operand " +
          s"families differ: $fam vs $other")
        case None if e.dataType == StringType => scala.Right(coerce(e, fam))
        case None => scala.Left(s"operator ${opSpelling(metric)} cannot coerce " +
          s"${e.dataType.catalogString} to $fam")
      }
    for {
      l <- side(left, lf)
      r <- side(right, rf)
      d <- kernel(fam, metric, l, r)
    } yield d
  }

  private def kernel(fam: String, metric: String, l: Expression, r: Expression)
      : Either[String, Expression] = (fam, metric) match {
    case ("dense", "l2") => scala.Right(L2sqDistance(l, r))
    case ("dense", "dot") => scala.Right(NegDotDistance(l, r))
    case ("dense", "cos") => scala.Right(CosDistance(l, r))
    case ("f16", "l2") => scala.Right(F16L2sq(l, r))
    case ("f16", "dot") => scala.Right(F16NegDot(l, r))
    case ("f16", "cos") => scala.Right(F16CosDist(l, r))
    case ("svec", "l2") => scala.Right(SVecL2sq(l, r))
    case ("svec", "dot") => scala.Right(SVecNegDot(l, r))
    case ("svec", "cos") => scala.Right(SVecCosDist(l, r))
    case ("bvec", "l2") => scala.Right(BVecHamming(l, r))
    case ("bvec", "dot") => scala.Right(BVecNegDot(l, r))
    case ("bvec", "jaccard") => scala.Right(BVecJaccard(l, r))
    case ("bvec", "cos") =>
      scala.Left("operator <=> (cosine) has no bvector overload (finalize.sql " +
        "defines <=> for vector/vecf16/svector only)")
    case (_, "jaccard") =>
      scala.Left("operator <~> (jaccard) is defined only for bvector operands")
    case _ => scala.Left(s"no $metric overload for $fam")
  }

  /** `+ - *` overloads (finalize.sql:90-148: vector, vecf16, svector;
    * dispatched by [[graft.plans.VectorArithRule]] once children
    * resolve — Spark's own Add/Subtract/Multiply reject array/struct
    * operands, so nothing else claims these shapes). The vecf16 SURFACE
    * is array<float> and indistinguishable from dense here: it takes
    * the f32 path (f16_add/f16_sub/f16_mul are the explicit per-op
    * rounding spellings). String literals coerce through the other
    * side's parser. None -> leave the plan unchanged (Spark's own
    * type error surfaces). op: 0 add, 1 sub, 2 mul. */
  def arith(left: Expression, right: Expression, op: Int)
      : Option[Expression] = {
    val lf = family(left.dataType)
    val rf = family(right.dataType)
    val fam = lf.orElse(rf).getOrElse(return None)
    if (fam != "dense" && fam != "svec") return None
    def side(e: Expression, f: Option[String]): Option[Expression] = f match {
      case Some(`fam`) => Some(e)
      case Some(_) => None
      case None if e.dataType == StringType => Some(coerce(e, fam))
      case None => None
    }
    for (l <- side(left, lf); r <- side(right, rf)) yield fam match {
      case "dense" => DenseArith(l, r, "+-*".charAt(op))
      case "svec" => SVecArith(l, r, op)
    }
  }

  /** `< <= > >= = <>` comparison overloads for vector operands — the
    * reference's dims-CHECKED operator classes (operators_vecf32.rs:
    * 37-70 error with "differs in dimensions" on mismatch,
    * operator.slt:35), dispatched by [[graft.plans.VectorArithRule]].
    * Returns the three-way Int compare to wrap in `cmp OP 0`; string
    * literals coerce through the family's parser (`'[1,2]'::vector <
    * '[2,2]'` — the slt right operands are bare literals). f16 bits
    * compare in the widened f32 space (exact: binary16 → f32 is an
    * order-preserving injection). Cross-family operand pairs return
    * None — the plan stays as-is and Spark's own type error (or struct
    * comparison) surfaces, matching "operator does not exist". */
  def comparison(left: Expression, right: Expression): Option[Expression] = {
    val lf = family(left.dataType)
    val rf = family(right.dataType)
    val fam = lf.orElse(rf).getOrElse(return None)
    def side(e: Expression, f: Option[String]): Option[Expression] = f match {
      case Some(`fam`) => Some(e)
      case Some(_) => None
      case None if e.dataType == StringType => Some(coerce(e, fam))
      case None => None
    }
    for (l <- side(left, lf); r <- side(right, rf)) yield fam match {
      case "dense" => VecCompareStrict(l, r)
      case "f16" => VecCompareStrict(F16BitsToVector(l), F16BitsToVector(r))
      case "svec" => SVecCompare(l, r)
      case "bvec" => BVecCompare(l, r)
    }
  }

  /** bvector `& | ^` overloads (finalize.sql:148-170, operator_and/or/
    * xor in src/datatype/operators_bvector.rs): dispatched like arith.
    * op: 0 and, 1 or, 2 xor. */
  def bitop(left: Expression, right: Expression, op: Int)
      : Option[Expression] = {
    val lf = family(left.dataType)
    val rf = family(right.dataType)
    if (!lf.contains("bvec") && !rf.contains("bvec")) return None
    def side(e: Expression, f: Option[String]): Option[Expression] = f match {
      case Some("bvec") => Some(e)
      case Some(_) => None
      case None if e.dataType == StringType => Some(ParseBVector(e))
      case None => None
    }
    for (l <- side(left, lf); r <- side(right, rf)) yield BVecOp(l, r, op)
  }

  /** `v[lo:hi]` slice overloads (the reference's subscript fetch,
    * src/datatype/subscript_*.rs + *_subscript.slt): dense/bvec/svec by
    * child type, strings as dense. The bounds law lives in the slice
    * kernels (0-based, hi exclusive, NULL on any invalid range). */
  /** A NULL subscript bound NULLs the slice (*_subscript.slt:
    * `v[NULL:8]` etc. are NULL, not errors): NullType literals become
    * typed null ints so the null-intolerant slice kernels resolve —
    * the CastDispatch self-resolving-replacement lesson (replacements
    * see no analyzer coercion). Other integral widths narrow safely. */
  private def sliceBound(e: Expression): Expression = e.dataType match {
    case NullType => Literal(null, IntegerType)
    case IntegerType => e
    case ByteType | ShortType | LongType => Cast(e, IntegerType)
    case _ => e // non-integral bounds fail the kernel's type check below
  }

  def slice(child: Expression, lo0: Expression, hi0: Expression)
      : Either[String, Expression] = {
    val lo = sliceBound(lo0); val hi = sliceBound(hi0)
    family(child.dataType) match {
      case Some("dense") => scala.Right(VecSlice(child, lo, hi))
      case Some("bvec") => scala.Right(BVecSlice(child, lo, hi))
      case Some("svec") => scala.Right(SVecSlice(child, lo, hi))
      // vecf16 bits: slice elementwise through the exact f32 widening
      // (vecf16_subscript.slt) — bits→f32→bits round-trips bit-exactly
      case Some("f16") =>
        scala.Right(ToF16Bits(VecSlice(F16BitsToVector(child), lo, hi)))
      case _ if child.dataType == StringType =>
        scala.Right(VecSlice(ParseVector(child), lo, hi))
      case _ => scala.Left(
        s"slice subscript does not support type ${child.dataType.catalogString}")
    }
  }

  private[functions] def opSpelling(metric: String): String = metric match {
    case "l2" => "<->"
    case "dot" => "<#>"
    case "cos" => "<=>"
    case "jaccard" => "<~>"
    case other => other
  }
}

/** `a <op> b` distance under the reference's operator overload rules;
  * see [[OpDispatch]]. metric in {l2, dot, cos, jaccard}. */
case class OpDist(left: Expression, right: Expression, metric: String)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression] {
  private lazy val dispatched: Either[String, Expression] =
    OpDispatch.dist(left, right, metric) match {
      // the <=> spelling doubles as Spark's null-safe equality: when
      // NEITHER side is vector-typed keep Spark semantics rather than
      // erroring (a vector-family dispatch failure — e.g. the reference
      // defines no bvector <=> — still errors like the other operators)
      case scala.Left(_) if metric == "cos" &&
          OpDispatch.family(left.dataType).isEmpty &&
          OpDispatch.family(right.dataType).isEmpty &&
          left.dataType == right.dataType =>
        scala.Right(EqualNullSafe(left, right))
      case other => other
    }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = s"graft_op_$metric"
}

/** `vector_normalize(v)` overload set (finalize.sql:625-632 defines it
  * for vector, vecf16 AND svector): dense arrays normalize in f32,
  * svectors through [[SVecNormalize]] (dims/indexes preserved). The
  * vecf16 SURFACE is `array<float>` and indistinguishable from dense by
  * type, so it takes the f32 path here — the explicit `f16_normalize`
  * spelling applies the reference's per-element f16 result rounding.
  * A string literal normalizes as a dense vector. */
case class NormalizeDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  private lazy val dispatched: Either[String, Expression] =
    child.dataType match {
      case ArrayType(FloatType, _) => scala.Right(VectorNormalize(child))
      case t if OpDispatch.family(t).contains("svec") =>
        scala.Right(SVecNormalize(child))
      case StringType => scala.Right(VectorNormalize(ParseVector(child)))
      case other => scala.Left(
        s"vector_normalize does not support type ${other.catalogString} " +
          "(vector, svector, or a vector literal; vecf16 surfaces use " +
          "f16_normalize)")
    }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vector_normalize"
}

/** `vector_norm(v)` overload set (finalize.sql:613-623 defines it for
  * all four vector kinds): dense arrays (incl. the vecf16 surface),
  * svector, bvector, and a string literal as a dense vector. */
case class NormDispatch(child: Expression)
    extends UnaryExpression with RuntimeReplaceable {
  private lazy val dispatched: Either[String, Expression] =
    OpDispatch.family(child.dataType) match {
      case Some("dense") => scala.Right(VectorNorm(child))
      case Some("svec") => scala.Right(SVecNorm(child))
      case Some("bvec") => scala.Right(BVecNorm(child))
      case _ if child.dataType == StringType =>
        scala.Right(VectorNorm(ParseVector(child)))
      case _ => scala.Left(
        s"vector_norm does not support type ${child.dataType.catalogString}")
    }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "vector_norm"
}

/** `expr::<vector type>` — the reference's CAST MATRIX (finalize.sql
  * CREATE CAST set: real[]<->vector, vector<->vecf16, vector<->svector,
  * vector<->bvector) as one type-dispatching expression per TARGET.
  * String operands parse (the literal-cast spelling); vector operands
  * convert through the cast expressions (vecf16 = f16 rounding, bvector
  * = the 0/1 rule); NUMERIC arrays take the real[]->vector implicit
  * cast first (`ARRAY(1,2,3)::vector`); the identity cast is a no-op. */
case class CastDispatch(child: Expression, target: String)
    extends UnaryExpression with RuntimeReplaceable {
  private def asDense(e: Expression): Option[Expression] = e.dataType match {
    case t if OpDispatch.family(t).contains("dense") => Some(e)
    case ArrayType(_: NumericType, _) =>
      Some(Cast(e, ArrayType(FloatType, containsNull = false)))
    case _ => None
  }
  private lazy val dispatched: Either[String, Expression] = {
    val fam = OpDispatch.family(child.dataType)
    val out: Option[Expression] = (target, fam) match {
      // NULL literals type as NullType; the replacement must be
      // self-resolving (no analyzer coercion visits it), so emit a
      // typed null directly — the STRICT NULL-in/NULL-out law
      case (t, _) if child.dataType == NullType =>
        Some(Literal.create(null, t match {
          case "svector" => VectorTypes.SVectorType
          case "bvector" => VectorTypes.BVectorType
          case _ => VectorTypes.VectorType
        }))
      case (t, _) if child.dataType == StringType => Some(t match {
        case "vector" => ParseVector(child)
        case "svector" => ParseSVector(child)
        case "bvector" => ParseBVector(child)
        case "vecf16" => ToF16(ParseVector(child))
      })
      case ("vector", Some("dense")) => Some(child)
      case ("vector", Some("svec")) => Some(SVecToDense(child))
      case ("vector", Some("bvec")) => Some(BVecToDense(child))
      case ("vector", Some("f16")) => Some(F16BitsToVector(child))
      case ("vector", None) => asDense(child)
      case ("svector", Some("svec")) => Some(child)
      case ("svector", _) => asDense(child).map(SVecFromDense)
      case ("bvector", Some("bvec")) => Some(child)
      case ("bvector", _) => asDense(child).map(CastVecToBVec)
      case ("vecf16", _) => asDense(child).map(ToF16)
      case _ => None
    }
    out.toRight(s"cannot cast ${child.dataType.catalogString} to $target")
  }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = s"graft_cast_$target"
}

/** `v[lo:hi]` subscript slice ([[OpDispatch.slice]]); the parser emits
  * a missing lo as literal 0 and a missing hi via [[SliceToEnd]]. */
case class SliceDispatch(child: Expression, lo: Expression, hi: Expression)
    extends Expression with RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child, lo, hi)
  private lazy val dispatched: Either[String, Expression] =
    OpDispatch.slice(child, lo, hi)
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), lo = c(1), hi = c(2))
  override def prettyName: String = "graft_slice"
}

/** `v[lo:]` — hi defaults to the vector's dims (the subscript-slt law:
  * a lo at/past dims still NULLs via lo >= hi). */
case class SliceToEnd(child: Expression, lo: Expression)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression] {
  override def left: Expression = child
  override def right: Expression = lo
  private lazy val dispatched: Either[String, Expression] = {
    // strings parse ONCE so dims sees the parsed vector too
    val base = if (child.dataType == StringType) ParseVector(child) else child
    OpDispatch.slice(base, lo, VectorDims(base))
  }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(child = newLeft, lo = newRight)
  override def prettyName: String = "graft_slice"
}

/** `v <<op>> sphere(center, radius)` — strict within-sphere predicate
  * (reference src/datatype/operators_vecf32.rs:91-150: every sphere
  * member is `dist(lhs, center) < radius`). The right operand is any
  * struct with `center`/`radius` fields — the registered `sphere()`
  * builds one as a named_struct, so after constant folding the
  * replacement is the plain `dist(v, lit) < lit` shape the range
  * pushdown arms match. */
case class SphereIn(left: Expression, right: Expression, metric: String)
    extends Expression with RuntimeReplaceable with BinaryLike[Expression] {
  private lazy val dispatched: Either[String, Expression] =
    right.dataType match {
      case s: StructType =>
        val ci = s.fieldNames.indexOf("center")
        val ri = s.fieldNames.indexOf("radius")
        if (ci < 0 || ri < 0)
          scala.Left(s"sphere operand must be sphere(center, radius), got " +
            s"${right.dataType.catalogString}")
        else OpDispatch.dist(left,
            GetStructField(right, ci, Some("center")), metric)
          .map(d => LessThan(d,
            Cast(GetStructField(right, ri, Some("radius")), DoubleType)))
      case other =>
        scala.Left(s"sphere operand must be sphere(center, radius), got " +
          s"${other.catalogString}")
    }
  override def checkInputDataTypes(): TypeCheckResult = dispatched match {
    case scala.Right(_) => TypeCheckResult.TypeCheckSuccess
    case scala.Left(msg) => TypeCheckResult.TypeCheckFailure(msg)
  }
  override lazy val replacement: Expression = dispatched match {
    case scala.Right(e) => e
    case scala.Left(msg) => throw new IllegalStateException(msg)
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
  override def prettyName: String = s"graft_sphere_$metric"
}
