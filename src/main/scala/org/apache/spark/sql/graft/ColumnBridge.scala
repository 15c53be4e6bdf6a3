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

  /** Re-plan a streaming micro-batch frame as a BATCH frame over the same
    * physical rows (`internalCreateDataFrame(queryExecution.toRdd, …,
    * isStreaming = false)` — the device every `Sink.addBatch`
    * implementation uses, e.g. Delta Lake's `DeltaSink`). The micro-batch
    * plan executes when the returned frame is consumed — exactly once in
    * the lake append's `localCheckpoint` materialization. */
  def asBatch(data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : org.apache.spark.sql.DataFrame = {
    val ds = data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }

  /** Drop the session's cached DSv2 catalog instances so
    * `spark.sql.catalog.<name>.*` conf changes made AFTER a catalog was
    * first used take effect (Spark caches catalog plugins per session on
    * first load; test hook + documented escape hatch for
    * reconfiguration). */
  def resetCatalogManager(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.reset()

  /** The running streaming query's id, from the execution-thread local
    * property Spark sets around every `Sink.addBatch` call — the stable
    * identity (constant across restarts from the same checkpoint) that
    * keys the lake's idempotent-commit watermark. */
  def streamingQueryId(data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]): Option[String] =
    Option(data.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .sparkSession.sparkContext.getLocalProperty(
        org.apache.spark.sql.execution.streaming.runtime.StreamExecution.QUERY_ID_KEY))
}
