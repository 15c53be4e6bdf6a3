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

  test("session built withExtensions resolves graft functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // getOrCreate may reuse the shared session; either way the function must resolve
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT)))").head().getDouble(0) == 8.0)
  }
}
