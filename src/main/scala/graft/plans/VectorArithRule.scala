package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CastDispatch, F16BitsToVector, OpDispatch,
  ParseBVector, ParseSVector, ParseVector, ToF16Bits}

/**
 * Vector-operand arithmetic operators in SQL text — the reference's
 * `+ - *` overload sets for vector/vecf16/svector and `& | ^` for
 * bvector (src/sql/finalize.sql:90-170) — as an injected ANALYZER
 * resolution rule: Spark's own Add/Subtract/Multiply (and the bitwise
 * trio) reject array/struct operands, so these expressions are
 * unresolved when the rule sees them and NOTHING ELSE ever claims the
 * shapes. Once both children resolve to a vector family, the operator
 * rewrites onto the native kernel ([[OpDispatch.arith]]/
 * [[OpDispatch.bitop]] — DenseArith / SVecArith / BVecOp), with string
 * literals coerced through the family's parser. Non-vector operands
 * are never touched: Spark's numeric arithmetic, interval arithmetic,
 * and its own type errors all behave exactly as before.
 *
 * Installed via [[GraftExtensions]] (injectResolutionRule), so every
 * parser-installed session accepts e.g.
 * `SELECT embedding + embedding, binarize(a) & binarize(b)` verbatim.
 */
case class VectorArithRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private def bothResolved(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved

  /** Does the operand stem from an explicit vector literal/cast (a
    * `::vector`-family spelling or parse call)? Gates the claim on
    * RESOLVED equality: `'[1,2]'::vector = '[1,2,3]'::vector` takes the
    * reference's dims-checked operator (errors on mismatch), while a
    * bare-column `ON a.emb = b.emb` keeps Spark's native array equality
    * — rewriting it to `cmp = 0` would also destroy the equi-join shape
    * (hash join → nested loop), a scale hazard no semantics gain
    * justifies (equal-dims results are identical either way). */
  private def graftOperand(e: Expression): Boolean = e.exists {
    case _: ParseVector | _: ParseSVector | _: ParseBVector |
        _: ToF16Bits | _: F16BitsToVector | _: CastDispatch => true
    case _ => false
  }

  /** Wrap the three-way compare in the comparison shape. */
  private def cmp(orig: Expression, l: Expression, r: Expression,
      mk: Expression => Expression): Expression =
    OpDispatch.comparison(l, r).map(mk).getOrElse(orig)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          case a @ Add(l, r, _) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.arith(l, r, 0).getOrElse(a)
          case a @ Subtract(l, r, _) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.arith(l, r, 1).getOrElse(a)
          case a @ Multiply(l, r, _) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.arith(l, r, 2).getOrElse(a)
          case a @ BitwiseAnd(l, r) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.bitop(l, r, 0).getOrElse(a)
          case a @ BitwiseOr(l, r) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.bitop(l, r, 1).getOrElse(a)
          case a @ BitwiseXor(l, r) if bothResolved(l, r) && !a.resolved =>
            OpDispatch.bitop(l, r, 2).getOrElse(a)

          // --- the reference's dims-checked comparison operators
          //     (operator.slt: `'[1,2]'::vector < '[1,2,3]'` must error
          //     "differs in dimensions"; bare-string right operands
          //     coerce through the family parser). Two claim tiers:
          //     UNRESOLVED comparisons (a string mixed with a vector
          //     operand — nothing else claims the shape, exactly like
          //     arith), and RESOLVED orderings over vector operands
          //     (Spark's native array/struct ordering prefix-compares /
          //     field-compares where the reference dims-checks).
          //     RESOLVED equality is claimed only for explicit
          //     literal/cast operands — see graftOperand. EqualNullSafe
          //     is never touched: `<=>` on vectors is cosine distance.
          case c @ LessThan(l, r) if bothResolved(l, r) &&
              (!c.resolved || OpDispatch.family(l.dataType).isDefined) =>
            cmp(c, l, r, LessThan(_, Literal(0)))
          case c @ LessThanOrEqual(l, r) if bothResolved(l, r) &&
              (!c.resolved || OpDispatch.family(l.dataType).isDefined) =>
            cmp(c, l, r, LessThanOrEqual(_, Literal(0)))
          case c @ GreaterThan(l, r) if bothResolved(l, r) &&
              (!c.resolved || OpDispatch.family(l.dataType).isDefined) =>
            cmp(c, l, r, GreaterThan(_, Literal(0)))
          case c @ GreaterThanOrEqual(l, r) if bothResolved(l, r) &&
              (!c.resolved || OpDispatch.family(l.dataType).isDefined) =>
            cmp(c, l, r, GreaterThanOrEqual(_, Literal(0)))
          case c @ EqualTo(l, r) if bothResolved(l, r) &&
              (!c.resolved ||
                (OpDispatch.family(l.dataType).isDefined &&
                  (graftOperand(l) || graftOperand(r)))) =>
            cmp(c, l, r, EqualTo(_, Literal(0)))
        }
    }
}
