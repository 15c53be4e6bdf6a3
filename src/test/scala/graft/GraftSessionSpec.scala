package graft

/** The migration entry point builds a working session with the engine's
  * defaults, and caller overrides win. */
class GraftSessionSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("builder produces a session with engine defaults; overrides win") {
    val s = GraftSession.builder(parallelism = 3)
      .config("spark.ui.enabled", "false")
      .appName("graft-session-spec")
      .getOrCreate()
    try {
      assert(s.conf.get("spark.sql.shuffle.partitions") == "3")
      assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
      assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
      // the session actually runs queries against the testdata
      assert(Tables(s, "/root/testdata/sf0.001", "nation").count() == 25)
    } finally s.stop()
  }
}
