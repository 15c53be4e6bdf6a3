package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration — the one
  * entry point a user migrating off the reference needs (the reference's
  * equivalent knobs: worker pool size, src/master.rs:27; input split size,
  * src/constants.rs:5 — both replaced by Spark parallelism/partitioning
  * settings here).
  *
  * Everything set here is a default, applied before `getOrCreate`, so
  * callers can override any of it through their own builder calls or
  * spark-submit --conf.
  */
object GraftSession {

  /** `parallelism` sizes both the local master and the shuffle partition
    * count. */
  def builder(parallelism: Int): SparkSession.Builder =
    builder(parallelism, Some(s"local[$parallelism]"))

  def builder(): SparkSession.Builder =
    builder(Runtime.getRuntime.availableProcessors())

  /** `master = None` leaves the master to spark-submit (cluster use);
    * keep shuffle partitions ≈ 2-3× total executor cores there (AQE
    * coalesces the excess at runtime). */
  def builder(parallelism: Int, master: Option[String]): SparkSession.Builder = {
    val b = SparkSession.builder()
      // the engine's SQL surface: native expressions (graft_dot, …) and
      // the graft-lake MERGE INTO routing rule
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", parallelism)
      // deterministic cross-engine timestamps (TESTDATA is UTC-naive)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS): surface as long, Tables converts
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // runtime bloom-filter join pruning (no-op small, wins at scale)
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // write µs timestamps so downstream engines (and the oracle) agree
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    master.fold(b)(b.master)
  }
}
