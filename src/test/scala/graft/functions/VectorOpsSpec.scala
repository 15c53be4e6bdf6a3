package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native codegen'd vector expressions must reproduce the
  * higher-order-function formulation bit-for-bit (that formulation is what
  * the DuckDB oracles mirror). */
class VectorOpsSpec extends SparkTestBase {

  private lazy val df = {
    import spark.implicits._
    Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (2L, Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
      (3L, Seq(1e-7f, 2e7f, -3.5f), Seq(7.0f, -1e-6f, 2.5f))).toDF("id", "a", "b")
  }

  test("dot: native == HOF == hand-computed") {
    val rows = df.select(
      VectorOps.dot(col("a"), col("b")).as("native"),
      VectorOps.dotHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    val first = df.filter(col("id") === 1).select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0)
    assert(first == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
  }

  test("norm2/norm: native == HOF, and norm is sqrt of sum of squares") {
    val rows = df.select(
      VectorOps.norm2(col("a")).as("native"),
      VectorOps.norm2Hof(col("a")).as("hof"),
      VectorOps.norm(col("a")).as("nrm")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(r.getDouble(2) == math.sqrt(r.getDouble(0)))
    }
  }

  test("cosine of a vector with itself is ~1") {
    val c = df.select(VectorOps.cosine(col("a"), col("a"))).collect().map(_.getDouble(0))
    c.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("null array yields null, not a crash") {
    import spark.implicits._
    val withNull = Seq((1L, Option(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("id", "a", "b")
    val r = withNull.select(VectorOps.dot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}
