package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * conventional shim for Catalyst extension libraries (Spark 4 moved
  * `new Column(expr)` behind `classic.ExpressionUtils`).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The standard WRONG_NUM_ARGS analysis error for SQL function builders —
    * `QueryCompilationErrors` is `private[sql]`, hence raised via this
    * bridge. */
  def wrongNumArgs(name: String, valid: Seq[Int], actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors.wrongNumArgsError(
      name, valid, actual)

  /** Register a function on an ALREADY-RUNNING session (the
    * `withExtensions` path only applies at session construction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      fid: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(fid, info, builder)
}
