package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc plan inspector: runMain graft.tools.PlanDump <query> [sfDir]. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = GraftSession.builder(4).config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
  }
}
