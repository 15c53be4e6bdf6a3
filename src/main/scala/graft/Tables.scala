package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * The reference engine's only source is a single local text file split into
  * fixed 1024-byte chunks (reference: src/utils.rs:9-45, src/constants.rs:5).
  * Here the source layer is Spark's columnar parquet scan: split planning,
  * predicate pushdown and column pruning are handled by `FileSourceScanExec`,
  * and partition sizing by `spark.sql.files.maxPartitionBytes` — lossless
  * (the reference silently drops the final partial chunk) and scalable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-(session, path) DataFrame cache: repeated Tables() calls across the
  // query registry would otherwise re-read parquet footers and re-plan the
  // relation each time (~50 ms × hundreds of loads per Verify/Bench run).
  // The plan object is immutable, so sharing it across queries is safe.
  // Tradeoffs, acceptable for this harness's process shapes (one or few
  // sessions per JVM, read-only testdata): entries are never evicted, so a
  // stopped session stays referenced for the JVM's lifetime, and a parquet
  // directory rewritten in place mid-session would be served from the
  // first-load file listing.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, dir, name), _ => load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    // for. With spark.sql.legacy.parquet.nanosAsLong=true (set by
    // Verify/Bench/test sessions) it surfaces as LongType nanos; convert to
    // TimestampType by flooring to micros — the same ns→µs truncation
    // DuckDB applies, so oracle comparisons stay exact.
    // The result is TIMESTAMP_NTZ to match how Spark reads the other tables'
    // naive parquet timestamps (and how the DuckDB oracle sees them).
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")).cast("timestamp_ntz"))
    else df
  }
}

/** Build-scratch root for the interchange sink queries (q94/q95/q96/q98,
  * px100). Resolution order: `spark.graft.scratchDir` session conf →
  * `graft.scratch.dir` JVM system property → `<user.dir>/target/interchange`
  * (the sbt build-scratch convention, relative to wherever the JVM runs).
  * Never a hard-coded absolute checkout path — the same jar must write to
  * the right place on any machine/checkout.
  */
object Scratch {
  def dir(spark: SparkSession, leaf: String): String = {
    val root = spark.conf.getOption("spark.graft.scratchDir")
      .orElse(sys.props.get("graft.scratch.dir"))
      .getOrElse(s"${sys.props("user.dir")}/target/interchange")
    s"$root/$leaf"
  }
}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the equivalent ANSI SQL the DuckDB oracle runs over the same parquet.
  * Queries without an oracle get the driver's weaker rows-only check.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
