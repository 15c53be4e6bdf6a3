package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Runtime (bloom-filter) join pruning: GraftSession enables
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`, which at cluster
  * scale injects a bloom filter built from a selective join side into the
  * other side's scan — rows that cannot match are dropped BEFORE the
  * shuffle. The size thresholds that gate injection (creation side ≤ 10 MB
  * etc.) are tuned for real data, so test-scale inputs never trigger it;
  * this spec lowers them to prove the wiring is live in our sessions.
  */
class RuntimeFilterSpec extends SparkTestBase {

  test("selective dim filter injects a bloom might_contain on the fact scan side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
      val dim = Tables(spark, sf, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select("o_orderkey")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
        "runtime bloom filter did not inject into the fact side:\n" + plan.take(2000))
      // and the result is unaffected by the filter (it only prunes non-matches)
      val n = joined.collect()(0).getLong(0)
      val expected = fact.join(dim.hint("broadcast"), col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected, s"bloom pruning changed the result: $n != $expected")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
