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
}
