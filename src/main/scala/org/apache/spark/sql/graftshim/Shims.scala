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
    * produced under temporary session confs). DynamicPruningSubquery
    * placeholders are stripped first: they only resolve at PHYSICAL
    * planning, so re-analyzing an OPTIMIZED plan that carries one (the
    * gate convention of returning ofRows(optimizedPlan); since the
    * rewrite rule is also extension-injected into the operator batch,
    * PartitionPruning can decorate a rewritten join within the same
    * optimization) throws INTERNAL_ERROR. Stripping is always sound —
    * DPP is a runtime prune hint, and Spark re-plants it when the
    * returned frame is re-planned (the round-9 stripDpp convention,
    * applied at the one chokepoint every ofRows goes through). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame = {
    val stripped = plan.transformAllExpressions {
      case _: org.apache.spark.sql.catalyst.expressions.DynamicPruningSubquery =>
        org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], stripped)
  }

  /** The resolved file relation (HadoopFsRelation) behind a plain
    * `spark.read.parquet` frame — the expensive-to-build piece
    * (DataSource resolution + file listing + schema) that
    * [[graft.ParquetCache]] memoizes. */
  def fileRelationOf(df: org.apache.spark.sql.DataFrame): Option[AnyRef] =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation
    }

  /** Wrap a previously-resolved file relation as a NEW DataFrame: the
    * LogicalRelation constructor mints fresh output attribute ids, so
    * two reads of the same cached relation still self-join exactly like
    * two independent reads (failAmbiguousSelfJoin stays quiet). */
  def ofFileRelation(spark: org.apache.spark.sql.SparkSession,
      rel: AnyRef): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        rel.asInstanceOf[org.apache.spark.sql.sources.BaseRelation],
        isStreaming = false))
}
