package graft.sources

import java.nio.file.Files

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Source/sink format breadth: the engine reads/writes csv and json with
  * explicit schemas, round-tripping values exactly (parquet is the primary
  * format and is exercised everywhere else). */
class FormatsSpec extends SparkTestBase {

  private lazy val sample = Tables(spark, sf, "nation")

  test("csv round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("fmt").toString + "/csv"
    sample.write.option("header", "true").mode("overwrite").csv(dir)
    val back = spark.read.option("header", "true").schema(sample.schema).csv(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip with explicit schema") {
    val dir = Files.createTempDirectory("fmt").toString + "/json"
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("fmt").toString + "/part"
    Tables(spark, sf, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.partitionBy("o_orderstatus").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString()
    assert(plan.contains("o_orderstatus=F") || !plan.contains("o_orderstatus=O"),
      "partition pruning should restrict scanned directories")
  }

  test("orc round-trip is lossless and its scan takes pushed filters") {
    val dir = Files.createTempDirectory("fmt").toString + "/orc"
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      sample.orderBy("n_nationkey").collect().toSeq)
    val filtered = back.filter(col("n_nationkey") > 10).select("n_name")
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [") && plan.contains("n_nationkey"),
      "ORC scan must receive the pushed predicate, like parquet:\n" + plan.take(800))
  }
}
