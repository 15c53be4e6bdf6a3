package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkTestBase {

  test("registered SQL functions match the DataFrame API bitwise") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, Seq(1.5f, -2.5f, 3.0f)), (2L, Seq(0.0f, 0.1f, 0.2f)))
      .toDF("id", "v").createOrReplaceTempView("vtest")
    val viaSql = spark.sql(
      "SELECT id, graft_dot(v, v) AS d, graft_normsq(v) AS n, graft_cosine(v, v) AS c FROM vtest ORDER BY id")
      .collect()
    val viaApi = spark.table("vtest")
      .select(col("id"),
        graft.functions.VectorOps.dot(col("v"), col("v")).as("d"),
        graft.functions.VectorOps.norm2(col("v")).as("n"),
        graft.functions.VectorOps.cosine(col("v"), col("v")).as("c"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toSeq).toSeq == viaApi.map(_.toSeq).toSeq)
  }

  test("graft_intersect_card over sorted long arrays") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_intersect_card(array(1L,3L,5L,7L), array(3L,4L,5L,6L,7L)) AS c")
      .head().getInt(0)
    assert(r == 3)
  }

  test("graft_l1_dist: histogram L1, short side zero-padded") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_l1_dist(array(3,0,2), array(1,1,2)) AS a, " +
      "graft_l1_dist(array(3,2), array(3,2,4,1)) AS b, " +
      "graft_l1_dist(array(), array(5)) AS c").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (3, 5, 5))
  }

  test("GraftExtensions injects every builder (without relying on register())") {
    // getOrCreate would reuse the shared test session and bypass
    // withExtensions, so drive the extension object directly and verify the
    // injected builders resolve and evaluate.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val injected = org.apache.spark.sql.graft.ColumnBridge.applyFunctionInjections(
      ext, org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin.clone())
    GraftFunctions.builders.foreach { case (name, _) =>
      assert(injected.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name not injected")
    }
    val arr = Literal.create(Seq(2.0f, 3.0f), ArrayType(FloatType))
    val dotExpr = injected.lookupFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"), Seq(arr, arr))
    assert(dotExpr.eval(null) == (4.0 + 9.0))
  }
}
