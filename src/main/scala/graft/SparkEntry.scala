package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Dedup, Extended, Graph, Multimodal, Pipeline, Relational, Similarity, Statistics, Temporal, TextOps, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query; SQL-expressible ones carry an equivalent DuckDB oracle
  * (column names and types aligned on both sides; results fully ordered
  * so the driver's hash compare is deterministic).
  */
object SparkEntry {

  /** All engine queries, in stable registration order. */
  val registry: Seq[GraftQuery] =
    Relational.all ++ Statistics.all ++ Extended.all ++ TpchShapes.all ++ Temporal.all ++
      TextOps.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++ Graph.all ++ Pipeline.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap(registry.map(q => q.name -> q.fn): _*)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ListMap(registry.collect { case GraftQuery(n, _, Some(sql)) => n -> sql }: _*)
}
