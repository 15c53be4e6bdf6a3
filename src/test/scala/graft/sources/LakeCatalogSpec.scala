package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Lake, Pipeline}

/** The named-catalog surface: `graft_lake.<table>` resolves lakes by
  * name through [[graft.sources.lake.LakeCatalog]], with standard
  * `VERSION AS OF` / `TIMESTAMP AS OF` syntax and the full DML surface
  * (INSERT / DELETE / MERGE) — all through the same commit protocol and
  * scan machinery as the path-based format string. */
class LakeCatalogSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture(ids: Range) =
    ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") < 100, "train").otherwise("test").as("split"),
        (col("doc_id") % 2).cast("int").as("shard_id"))

  private lazy val wh = {
    val d = java.nio.file.Files.createTempDirectory("graft-lake-wh").toString
    spark.conf.set("spark.sql.catalog.graft_lake", "graft.sources.lake.LakeCatalog")
    spark.conf.set("spark.sql.catalog.graft_lake.warehouse", d)
    d
  }

  test("named reads: SELECT FROM graft_lake.t, VERSION AS OF and TIMESTAMP AS OF match the option() forms") {
    val out = s"$wh/corpus"
    Lake.init(spark, fixture(0 until 40), out, Seq("split", "shard_id"))   // v1
    Pipeline.appendToLake(spark, out, fixture(40 until 50))                // v2
    assert(spark.sql("SELECT count(*) FROM graft_lake.corpus").head.getLong(0) == 50L)
    // VERSION AS OF == option("version")
    val v1Sql = spark.sql("SELECT doc_id FROM graft_lake.corpus VERSION AS OF 1")
      .collect().map(_.getLong(0)).toSet
    val v1Opt = spark.read.format("graft-lake").option("version", 1L).load(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(v1Sql == v1Opt && v1Sql == (0L until 40L).toSet,
      s"VERSION AS OF 1 must equal the option-pinned read, got ${v1Sql.size}")
    // TIMESTAMP AS OF now == latest (micros-to-millis conversion exact)
    val nowMs = System.currentTimeMillis() + 60000L
    val ts = new java.sql.Timestamp(nowMs).toString.takeWhile(_ != '.')
    assert(spark.sql(
      s"SELECT count(*) FROM graft_lake.corpus TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 50L)
    // a missing table names itself
    val e = intercept[Exception] { spark.sql("SELECT * FROM graft_lake.nope").collect() }
    assert(e.getMessage.toLowerCase.contains("nope"))
  }

  test("named DML: INSERT, DELETE and MERGE against graft_lake.t land as protocol commits") {
    val out = s"$wh/dml"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"))   // v1
    fixture(20 until 25).createOrReplaceTempView("cat_batch")
    spark.sql("INSERT INTO graft_lake.dml BY NAME SELECT * FROM cat_batch") // v2
    assert(Lake.read(spark, out).count() == 25)
    spark.sql("DELETE FROM graft_lake.dml WHERE doc_id >= 20")              // v3: sparse
    assert(Lake.read(spark, out).count() == 20)
    val h3 = Lake.describeHistory(spark, out).collect().find(_.getLong(0) == 3L).get
    assert(h3.getString(2) == "delete" && h3.getInt(5) == 0, "named DELETE lands sparse")
    spark.sql("""MERGE INTO graft_lake.dml t USING cat_batch s ON t.doc_id = s.doc_id
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")     // v4
    assert(Lake.read(spark, out).count() == 25, "the merge re-inserts the deleted ids")
  }

  test("CREATE TABLE commits an empty unpartitioned lake that INSERT bootstraps; DROP deletes; partitioned create refuses") {
    spark.sql("CREATE TABLE graft_lake.scratch (doc_id BIGINT, text STRING)")
    assert(spark.sql("SELECT count(*) FROM graft_lake.scratch").head.getLong(0) == 0L)
    spark.sql("INSERT INTO graft_lake.scratch VALUES (1, 'a'), (2, 'b')")
    assert(spark.sql("SELECT count(*) FROM graft_lake.scratch").head.getLong(0) == 2L)
    // the insert went through the protocol: an audited append commit
    val hist = Lake.describeHistory(spark, s"$wh/scratch").collect()
    assert(hist.exists(r => r.getString(2) == "append"))
    spark.sql("DROP TABLE graft_lake.scratch")
    intercept[Exception] { spark.sql("SELECT * FROM graft_lake.scratch").collect() }
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_lake.p2 (a BIGINT, b STRING) PARTITIONED BY (b)")
    }
    assert(e.getMessage.contains("partition"),
      s"partitioned create must refuse naming the reason, got: ${e.getMessage}")
  }

  test("ALTER TABLE routes rename/drop as metadata commits; other changes refuse") {
    val out = s"$wh/evolve"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))        // v1
    spark.sql("ALTER TABLE graft_lake.evolve RENAME COLUMN text TO body")       // v2
    val renamed = spark.sql("SELECT doc_id, body FROM graft_lake.evolve").collect()
    assert(renamed.length == 10 && renamed.forall(_.getString(1) != null),
      "the renamed column must read its old values by name")
    spark.sql("ALTER TABLE graft_lake.evolve DROP COLUMN body")                 // v3
    assert(!spark.table("graft_lake.evolve").schema.fieldNames.contains("body"))
    // both landed as metadata commits: zero files added or removed
    val hist = Lake.describeHistory(spark, out).collect()
    assert(hist.filter(r => Set("rename", "drop")(r.getString(2)))
      .forall(r => r.getInt(3) == 0 && r.getInt(5) == 0))
    // a retype refuses loudly — Spark's capability check rejects it
    // before our catalog (narrowing BIGINT->INT), and our alterTable
    // names the rewrite for anything that slips through
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_lake.evolve ALTER COLUMN doc_id TYPE INT")
    }
    assert(e.getMessage.contains("rewrite") ||
      e.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"),
      s"a retype must refuse, got: ${e.getMessage}")
  }

  test("path-addressed tables: graft_lake.`/abs/path` reads a lake outside the warehouse") {
    val dir = java.nio.file.Files.createTempDirectory("lake-bypath").toString + "/lake"
    Lake.init(spark, fixture(0 until 7), dir, Seq("split", "shard_id"))
    assert(spark.sql(s"SELECT count(*) FROM graft_lake.`$dir`").head.getLong(0) == 7L)
  }
}
