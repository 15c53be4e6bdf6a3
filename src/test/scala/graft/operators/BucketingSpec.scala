package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Co-located (bucketed) joins: pre-bucketing both sides on the join key
  * removes the per-query shuffle entirely — the core trick for repeated
  * big×big joins at warehouse scale (SURVEY.md §2.2 join row). */
class BucketingSpec extends SparkTestBase {

  test("co-bucketed tables join with zero Exchange operators") {
    // The catalog is in-memory but table locations persist on disk across
    // JVMs — drop both layers so overwrite can't hit LOCATION_ALREADY_EXISTS.
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(): Unit
        }
        rm(loc)
      }
    }
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
