package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.Shims

/**
 * Column-level API over the engine's Catalyst expressions — the Spark
 * analog of the reference's SQL operator surface (finalize.sql).
 */
package object functions {
  private[graft] def toCol(e: Expression): Column = Shims.column(e)
  private[graft] def expr(c: Column): Expression = Shims.expression(c)

  // --- dense distances (reference operators <->, <#>, <=>) ---
  def l2sq(a: Column, b: Column): Column = toCol(L2sqDistance(expr(a), expr(b)))
  def negdot(a: Column, b: Column): Column = toCol(NegDotDistance(expr(a), expr(b)))
  def cosdist(a: Column, b: Column): Column = toCol(CosDistance(expr(a), expr(b)))

  // --- dense arithmetic (+ - *) ---
  def vecAdd(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '+'))
  def vecSub(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '-'))
  def vecMul(a: Column, b: Column): Column = toCol(DenseArith(expr(a), expr(b), '*'))

  // --- scalar functions ---
  def vectorNorm(v: Column): Column = toCol(VectorNorm(expr(v)))
  def vectorNormalize(v: Column): Column = toCol(VectorNormalize(expr(v)))
  def toVecf16(v: Column): Column = toCol(ToF16(expr(v)))
  def parseVector(s: Column): Column = toCol(ParseVector(expr(s)))
  def formatVector(v: Column): Column = toCol(FormatVector(expr(v)))

  /** Register all functions for SQL usage (the analog of finalize.sql's
    * CREATE FUNCTION statements). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def reg1(name: String, f: Expression => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => f(es.head), "scala_udf")
    def reg2(name: String, f: (Expression, Expression) => Expression): Unit =
      reg.createOrReplaceTempFunction(name, es => f(es(0), es(1)), "scala_udf")

    reg2("l2sq_distance", L2sqDistance(_, _))
    reg2("negdot_distance", NegDotDistance(_, _))
    reg2("cos_distance", CosDistance(_, _))
    reg2("vec_add", DenseArith(_, _, '+'))
    reg2("vec_sub", DenseArith(_, _, '-'))
    reg2("vec_mul", DenseArith(_, _, '*'))
    reg1("vector_norm", VectorNorm(_))
    reg1("vector_normalize", VectorNormalize(_))
    reg1("to_vecf16", ToF16(_))
    reg1("parse_vector", ParseVector(_))
    reg1("format_vector", FormatVector(_))
  }
}
