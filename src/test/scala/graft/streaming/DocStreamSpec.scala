package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class DocStreamSpec extends SparkTestBase {

  test("cleanDocs streams: repetition-dropped and normalized-dup docs never reach the sink") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val q = DocStream.cleanDocs(df)
      .writeStream.format("memory").queryName("clean_out").outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        (2L, "a b a b a b")) // degenerate repetition: dropped
      q.processAllAvailable()
      mem.addData(
        (3L, "Alpha, beta GAMMA delta epsilon zeta eta theta iota kappa lambda mu!"), // dup of 1 after normalization
        (4L, "one two three four five six seven eight nine ten eleven twelve"))
      q.processAllAvailable()
      val ids = spark.table("clean_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(ids == Set(1L, 4L),
        s"expected repetition-filtered + cross-batch normalized dedup, got $ids")
    } finally q.stop()
  }

  test("cleanDocs gives identical survivors in batch mode") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "a b a b a b"),
      (3L, "Alpha, beta GAMMA delta epsilon zeta eta theta iota kappa lambda mu!"),
      (4L, "one two three four five six seven eight nine ten eleven twelve")).toDF("doc_id", "text")
    val ids = DocStream.cleanDocs(docs).collect().map(_.getAs[Long]("doc_id")).toSet
    // batch dropDuplicates keeps an arbitrary row per key — both 1 and 3
    // are valid representatives of the shared normalized key
    assert(ids.size == 2 && ids.contains(4L) && !ids.contains(2L) &&
      (ids.contains(1L) || ids.contains(3L)))
  }
}
