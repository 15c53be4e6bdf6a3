package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (lazy, reused across suites via getOrCreate).
  * Built through [[GraftSession.builder]] so the engine defaults live in
  * exactly one place. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder(4)
    .appName("graft-tests")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"
}
