package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key
  * removes the per-query shuffle entirely — the core trick for repeated
  * big×big joins at warehouse scale (SURVEY.md §2.2 join row). */
class BucketingSpec extends SparkTestBase {

  test("co-bucketed tables join with zero Exchange operators") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")

    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey").agg(sum(col("l_quantity")).as("q"))
    val n = joined.count()
    assert(n > 0)

    val plan = joined.queryExecution.executedPlan.toString()
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length
    assert(exchanges == 0, s"expected shuffle-free bucketed join, got:\n${plan.take(1500)}")
  }
}
