package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.OpDispatch

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
        }
    }
}
