package graft.sources.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkTestBase
import graft.operators.{Lake, Pipeline}

/** Planning-shape guarantees of the lake stream: catch-up batches
  * BIN-PACK small files into few tasks, and the byte-based admission
  * control bounds a trigger without ever stalling the stream. */
class LakeStreamPlanSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture(ids: Range) =
    ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("train").as("split"),
        lit(0).cast("int").as("shard_id"))

  private def stream(out: String, opts: Map[String, String] = Map.empty) = {
    val options = new CaseInsensitiveStringMap((opts + ("path" -> out)).asJava)
    val (schema, partCols) = LakeStreamSource.tableSchema(spark, out, options)
    new LakeMicroBatchStream(out, schema, partCols, options)
  }

  test("a version that added many small files plans into FEW bin-packed partitions, not one task per file") {
    val out = java.nio.file.Files.createTempDirectory("lakepack").toString + "/lake"
    // one commit, deliberately fragmented: 30 tiny files in one partition
    Lake.init(spark, fixture(0 until 30).repartition(30), out, Seq("split", "shard_id"))
    val nFiles = Lake.latestManifest(spark, out).get.files.size
    assert(nFiles >= 20, s"fixture must fragment, got $nFiles files")
    val parts = stream(out).planInputPartitions(LakeVersionOffset(0), LakeVersionOffset(1))
    assert(parts.length < nFiles / 4,
      s"$nFiles small files must bin-pack into few FilePartitions, got ${parts.length}")
    val plannedFiles = parts.map(_.asInstanceOf[FilePartition].files.length).sum
    assert(plannedFiles == nFiles, "bin-packing must not drop or duplicate a file")
  }

  test("maxBytesPerTrigger bounds catch-up by bytes and always admits at least one version") {
    val out = java.nio.file.Files.createTempDirectory("lakebytes").toString + "/lake"
    Lake.init(spark, fixture(0 until 50), out, Seq("split", "shard_id"))   // v1
    Pipeline.appendToLake(spark, out, fixture(50 until 100))               // v2
    Pipeline.appendToLake(spark, out, fixture(100 until 150))              // v3
    // 1 byte can never fit a version — the stream must still progress
    // one version per trigger rather than stall
    val s = stream(out, Map("maxBytesPerTrigger" -> "1"))
    val o1 = s.latestOffset(LakeVersionOffset(0),
      s.getDefaultReadLimit).asInstanceOf[LakeVersionOffset]
    assert(o1.version == 1L, s"a starved byte budget must still admit ONE version, got $o1")
    // a generous budget admits the whole backlog at once
    val s2 = stream(out, Map("maxBytesPerTrigger" -> (64L * 1024 * 1024).toString))
    val o2 = s2.latestOffset(LakeVersionOffset(0),
      s2.getDefaultReadLimit).asInstanceOf[LakeVersionOffset]
    assert(o2.version == 3L, s"a generous byte budget must admit the whole backlog, got $o2")
  }
}
