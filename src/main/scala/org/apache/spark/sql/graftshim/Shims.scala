package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Minimal bridge into `private[sql]` Spark internals that third-party
 * Catalyst extensions need: the Expression <-> Column conversion (moved
 * behind ColumnNode in Spark 4) and the AbstractDataType used by
 * `ExpectsInputTypes.inputTypes`.
 */
object Shims {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Build the optimizer rules an injected SparkSessionExtensions would
    * contribute — lets specs assert spark.sql.extensions wiring without
    * tearing down the shared test session. */
  def optimizerRulesOf(ext: org.apache.spark.sql.SparkSessionExtensions,
      spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  /** Wrap an already-built logical plan as a DataFrame (freezes a plan
    * produced under temporary session confs). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
