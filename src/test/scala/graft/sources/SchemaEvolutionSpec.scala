package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** File-source behaviors that matter on a long-lived 100 TB lake:
  * schema evolution across write batches, nested-struct column pruning,
  * and AQE's runtime shuffle coalescing.
  */
class SchemaEvolutionSpec extends SparkTestBase {

  test("parquet schema evolution: a column added later is null for old batches under mergeSchema") {
    val dir = Files.createTempDirectory("evo").toString + "/docs"
    val v1 = Tables(spark, sf, "documents").select("doc_id", "lang")
    v1.filter(col("doc_id") % 2 === 0).write.mode("overwrite").parquet(dir)
    // batch 2 gains a column — the usual "pipeline v2 adds a field" event
    Tables(spark, sf, "documents").select("doc_id", "lang", "n_chars")
      .filter(col("doc_id") % 2 === 1).write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("doc_id", "lang", "n_chars"))
    val olds = merged.filter(col("doc_id") % 2 === 0)
    assert(olds.filter(col("n_chars").isNotNull).count() == 0,
      "v1 rows must surface the new column as null, not fail or misalign")
    assert(merged.count() == Tables(spark, sf, "documents").count())
  }

  test("nested struct: selecting one subfield prunes the others from the parquet read") {
    val dir = Files.createTempDirectory("evo").toString + "/nested"
    Tables(spark, sf, "documents")
      .select(col("doc_id"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"),
        col("text"))
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).select(col("doc_id"), col("meta.lang"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString()
    // nested schema pruning: ReadSchema must mention lang but not the
    // sibling subfields or the wide text column
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse(plan)
    assert(read.contains("lang"), read)
    assert(!read.contains("text") && !read.contains("n_chars"),
      "unneeded (and expensive) columns survive into the scan: " + read)
  }

  test("AQE coalesces the 32 shuffle partitions of a small aggregate at runtime") {
    val df = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").agg(count(lit(1)).as("n"))
    df.collect() // finalize adaptive plan
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      "tiny shuffle output should be read as coalesced partitions, " +
        "not 32 near-empty tasks:\n" + plan.take(1200))
  }

  test("AQE splits the straggler partition of a skewed shuffle join (skew=true in the plan)") {
    // The runtime complement to the MANUAL salted join (q60): when one key
    // dominates a shuffle join, OptimizeSkewedJoin must carve its partition
    // into advisory-sized splits instead of leaving one task with the
    // whole hot key. Thresholds are lowered so the test fixture's ~MB-scale
    // skew triggers the same code path a 100 TB straggler would.
    import spark.implicits._
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // one hot key with 200k rows beside 50 cold keys with ~40 rows each
      val left = ((1 to 200000).map(i => (0L, i.toLong)) ++
        (1 to 2000).map(i => ((i % 50).toLong + 1, i.toLong))).toDF("k", "payload")
      val right = (0L to 50L).map(k => (k, s"dim$k")).toDF("k", "attr")
      val joined = left.join(right, "k")
      val n = joined.count()
      assert(n == 202000L, s"join result wrong: $n")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        "the hot key's partition must be split by OptimizeSkewedJoin " +
          "(skew=true marker on the join):\n" + plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
