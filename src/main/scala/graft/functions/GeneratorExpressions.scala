package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Array explode/posexplode that is deliberately NOT an [[ExplodeBase]]
  * subclass (round 18, guide §4 — the r17 residual's "surgical fix").
  *
  * Why: `InferFiltersFromGenerate` only fires on `ExplodeBase`/`Inline`
  * generators. When the generator child is an Attribute aliased in the
  * Project directly below (`select(expensive_expr.as("chunks"))` then
  * `posexplode(col("chunks"))`), the rule infers
  * `size(chunks) > 0 AND isnotnull(chunks)` — cheap on the attribute —
  * but `PushDownPredicates` then rewrites the filter through the Project,
  * cloning the expensive aliased expression into the condition TWICE
  * (plus the Project's own evaluation = 3 evaluations per source row;
  * HOF children like `transform` run interpreted, so nothing dedupes).
  * Round-18 census: q_dedup_chunks, q_vec_slice, q_bvec_slice_cmp,
  * q_vec_norm carried the clone.
  *
  * Semantics are identical to explode/posexplode for array children: a
  * non-outer Generate drops null/empty arrays whether or not the inferred
  * pre-filter exists, so skipping the inference never changes results.
  * Behavior (elementSchema names, eval, codegen delegation to the child —
  * GenerateExec's codeGenCollection consumes the generator by calling
  * `genCode` on it and expects the CHILD's code, exactly what
  * ExplodeBase.doGenCode produces) mirrors Spark's ExplodeBase minus the
  * map branch, which no call site needs.
  */
case class GraftExplode(child: Expression, position: Boolean)
    extends UnaryExpression with CollectionGenerator with Serializable {
  override val inline: Boolean = false
  override def collectionType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array column, got ${other.simpleString}")
  }

  override def elementSchema: StructType = child.dataType match {
    case ArrayType(et, containsNull) =>
      if (position) {
        new StructType()
          .add("pos", IntegerType, nullable = false)
          .add("col", et, containsNull)
      } else new StructType().add("col", et, containsNull)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val inputArray = child.eval(input).asInstanceOf[ArrayData]
    if (inputArray == null) Nil
    else {
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val rows = new Array[InternalRow](inputArray.numElements())
      inputArray.foreach(et, (i, e) => {
        rows(i) = if (position) InternalRow(i, e) else InternalRow(e)
      })
      rows
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): GraftExplode =
    copy(child = newChild)

  override def prettyName: String =
    if (position) "graft_posexplode" else "graft_explode"
}

object GraftExplode {
  import org.apache.spark.sql.graftshim.Shims

  /** Drop-in for `functions.explode` on array columns whose input is an
    * expensive aliased expression (see class doc). */
  def explodeOnce(c: Column): Column =
    Shims.column(GraftExplode(Shims.expression(c), position = false))

  /** Drop-in for `functions.posexplode` (output names pos/col). */
  def posexplodeOnce(c: Column): Column =
    Shims.column(GraftExplode(Shims.expression(c), position = true))
}
