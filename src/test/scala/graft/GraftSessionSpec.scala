package graft

import org.apache.spark.sql.SparkSession

/** The migration entry point builds a working session with the engine's
  * defaults, and caller overrides win. Runs against a FRESH session (the
  * suite-shared one is stopped first): master is a static conf, so
  * getOrCreate-reuse would silently skip it and void the assertion. */
class GraftSessionSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("builder produces a session with engine defaults; parallelism sizes the master") {
    SparkSession.getActiveSession.foreach(_.stop())
    val s = GraftSession.builder(3)
      .config("spark.ui.enabled", "false")
      .appName("graft-session-spec")
      .getOrCreate()
    try {
      assert(s.sparkContext.master == "local[3]")
      assert(s.conf.get("spark.sql.shuffle.partitions") == "3")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
      // the session actually runs queries against the testdata
      assert(Tables(s, "/root/testdata/sf0.001", "nation").count() == 25)
    } finally s.stop() // later suites' getOrCreate builds a fresh session
  }
}
