package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ↔ Expression conversions (the
  * Spark 4 replacement for the removed `new Column(expr)` constructor).
  * Lives under org.apache.spark.sql so the private[sql] API is visible —
  * the standard pattern for Catalyst-extending libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply an extension's injected functions to a registry (test hook for
    * verifying SparkSessionExtensions wiring without building a session). */
  def applyFunctionInjections(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
