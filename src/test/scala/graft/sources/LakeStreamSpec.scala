package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.{Lake, Pipeline}

/** The lake→stream half of the loop: `readStream.format("graft-lake-cdc")`
  * tails the manifest's data-adds exactly-once. The invariant everywhere:
  * the sink accumulates exactly the rows that appends/upserts landed —
  * never a rewritten survivor, never a doc twice. */
class LakeStreamSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture(ids: Range, tag: String = "doc") =
    ids.map(i => (i.toLong, s"$tag $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") < 100, "train").otherwise("test").as("split"),
        (col("doc_id") % 2).cast("int").as("shard_id"))

  test("lake CDC stream: appends/upserts land exactly-once; compaction, delete and survivor rewrites contribute nothing") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcstream").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id")) // v1

    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_tail")
      .option("checkpointLocation", s"$base/ck")
      .start()
    def sink() = spark.table("lake_tail").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    try {
      q.processAllAvailable()
      assert(sink().map(_._1).toSet == (0L until 20L).toSet,
        "startingVersion=earliest must replay the seed commit")
      val row = spark.table("lake_tail").filter(col("doc_id") === 3L).collect()(0)
      assert(row.getAs[String]("split") == "train" && row.getAs[Int]("shard_id") == 1,
        "partition-directory values must come back typed on streamed rows")

      Pipeline.appendToLake(spark, out, fixture(10 until 30))            // v2: 20-29 new
      q.processAllAvailable()
      assert(sink().map(_._1).sorted.toSeq == (0L until 30L).toSeq,
        "an append streams exactly its genuinely-new docs, once")

      Pipeline.compactLake(spark, out, maxFilesPerPartition = 1,
        targetRowsPerFile = 1000L, retainHistory = true)                  // v3: rewrite only
      q.processAllAvailable()
      assert(sink().length == 30, "a compaction must stream NOTHING")

      Pipeline.mergeIntoLake(spark, out,
        fixture(5 to 5, "patched").unionByName(fixture(200 to 200)),
        retainHistory = true)                                             // v4: 1 update + 1 insert
      q.processAllAvailable()
      val rows = sink()
      assert(rows.length == 32, "a merge streams its upserts and nothing else")
      assert(rows.count(_._1 == 5L) == 2 && rows.exists(_ == (5L -> "patched 5")),
        "an updated doc re-surfaces as a change")
      assert(rows.count(_._1 == 200L) == 1)
      assert(rows.count(_._1 == 6L) == 1, "rewritten survivors must never re-stream")

      Pipeline.deleteFromLake(spark, out, Seq(7L).toDF("doc_id"), "doc_id",
        retainHistory = true)                                             // v5: removal only
      q.processAllAvailable()
      assert(sink().length == 32, "a delete must stream NOTHING to adds-CDC")
    } finally q.stop()

    // kill + restart from the same checkpoint (durable parquet sink — the
    // memory sink cannot recover): a commit that landed while the stream
    // was down arrives exactly once, nothing replays
    def startDurable() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("parquet")
      .option("path", s"$base/sink").option("checkpointLocation", s"$base/ck2")
      .start()
    val q2 = startDurable()
    try q2.processAllAvailable() finally q2.stop()
    Pipeline.appendToLake(spark, out, fixture(300 until 305))             // v6, while down
    val q3 = startDurable()
    try q3.processAllAvailable() finally q3.stop()
    val durable = spark.read.parquet(s"$base/sink")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    // the full change history, each change exactly once: the seed (v1),
    // the append (v2), the merge's upserts (v4 — doc 5 again, legitimately:
    // its update IS a change; plus the insert 200), and the while-down
    // append (v6). The compaction/delete rewrites contribute nothing.
    val expected = ((0L until 30L) ++ Seq(5L, 200L) ++ (300L until 305L))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(durable.groupBy(identity).view.mapValues(_.size).toMap == expected,
      s"restart must replay each committed change exactly once, got ${durable.sorted}")
  }

  test("lake CDC stream: column pruning reaches the parquet decode; maxVersionsPerTrigger bounds catch-up batches") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcprune").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id")) // v1
    Pipeline.appendToLake(spark, out, fixture(10 until 20))              // v2
    Pipeline.appendToLake(spark, out, fixture(20 until 30))              // v3

    // a projected tail: only (doc_id, split) survive — pruning must reach
    // the scan (the plan's ReadSchema) and partition values still type
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1") // 3 pending versions -> 3 batches
      .option("columns", "doc_id,split")    // decode-level projection
      .load(out)
      .writeStream.format("memory").queryName("lake_pruned")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("lake_pruned").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == (0L until 30L).toSet)
      assert(rows.forall(_.getAs[String]("split") == "train"))
      // the scan itself was pruned: its read schema names only the
      // selected columns, so text/shard_id are never decoded
      val progress = q.recentProgress
      assert(progress.nonEmpty)
      assert(progress.map(_.numInputRows).sum == 30)
      // one committed version per micro-batch (3 non-empty batches)
      assert(progress.count(_.numInputRows > 0) == 3,
        s"maxVersionsPerTrigger=1 must split the 3-version backlog into 3 batches: " +
          progress.map(_.numInputRows).mkString(","))
      val scanDesc = q.lastProgress.sources.head.description
      assert(scanDesc.contains("columns=doc_id,split"),
        s"pruning must reach the stream's scan, not a post-scan project: $scanDesc")
    } finally q.stop()
    // maxFilesPerTrigger bounds catch-up batches by PLANNED FILE COUNT
    // (each version stages >1 file, so a 1-file bound still admits one
    // version per batch — the at-least-one progress rule)
    val qf = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("maxFilesPerTrigger", "1")
      .load(out)
      .writeStream.format("memory").queryName("lake_files_trigger")
      .option("checkpointLocation", s"$base/ckf")
      .start()
    try {
      qf.processAllAvailable()
      assert(spark.table("lake_files_trigger").count() == 30)
      assert(qf.recentProgress.count(_.numInputRows > 0) == 3,
        "maxFilesPerTrigger must split the 3-version backlog into 3 batches")
    } finally qf.stop()
  }

  test("row-level change feed stream: append → delete → append arrives as insert/delete/insert exactly-once across a restart") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcfeed").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))        // v1: inserts
    Pipeline.deleteFromLakeSparse(spark, out, Seq(3L, 4L).toDF("doc_id"), "doc_id") // v2: deletes
    def start() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("parquet")
      .option("path", s"$base/sink").option("checkpointLocation", s"$base/ck")
      .start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    Pipeline.appendToLake(spark, out, fixture(100 until 105))                   // v3, while down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(s"$base/sink")
      .select("doc_id", "split", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val expected =
      (0L until 10L).map(i => (i, if (i < 100) "train" else "test", "insert", 1L)) ++
        Seq((3L, "train", "delete", 2L), (4L, "train", "delete", 2L)) ++
        (100L until 105L).map(i => (i, "test", "insert", 3L))
    assert(rows.groupBy(identity).view.mapValues(_.size).toMap ==
      expected.groupBy(identity).view.mapValues(_.size).toMap,
      s"the feed must replay each change exactly once across the restart, got " +
        rows.sortBy(r => (r._4, r._3, r._1)).mkString(", "))
  }

  test("batch changeFeed: rewrite deletes, merges and restores emit exact row-level events that NET to the lake") {
    val base = java.nio.file.Files.createTempDirectory("lakefeedbatch").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))         // v1
    Pipeline.deleteFromLake(spark, out, Seq(2L).toDF("doc_id"), "doc_id",
      retainHistory = true)                                                      // v2: rewrite delete
    Pipeline.mergeIntoLake(spark, out,
      fixture(5 to 5, "patched").unionByName(fixture(50 to 50)),
      retainHistory = true)                                                      // v3: rewrite merge
    val feed13 = Lake.changeFeed(spark, out, 1L, 3L)
    val ev = feed13.select("doc_id", "text", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(ev == Set(
      (2L, "doc 2", "delete", 2L),                      // the rewrite-delete's pre-image
      (5L, "doc 5", "update_preimage", 3L),             // the upsert's pre-image...
      (5L, "patched 5", "update_postimage", 3L),        // ...and its post-image
      (50L, "doc 50", "insert", 3L)),                   // the genuinely-new row
      s"row-level events must be exact, got $ev")
    Lake.restore(spark, out, 1L)                                                 // v4: undo everything
    // THE net-convergence property: a mirror replaying the full feed
    // (row-adding events exceptAll row-removing events, multiset
    // semantics — update_postimage adds, update_preimage removes)
    // equals the lake
    val feed = Lake.changeFeed(spark, out, 0L, 4L)
    val dataCols = Lake.read(spark, out).columns.map(col).toSeq
    val mirror = feed.filter(col("_change_type").isin("insert", "update_postimage"))
      .select(dataCols: _*)
      .exceptAll(feed.filter(col("_change_type").isin("delete", "update_preimage"))
        .select(dataCols: _*))
    assert(mirror.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap ==
      Lake.read(spark, out).collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap,
      "replaying the change feed from scratch must reconstruct the lake exactly")
    assert(mirror.count() == 10)
  }

  test("the lazy default serves the change feed: CDC stream and batch changeFeed over a columnar-checkpoint lake force ZERO eager stats loads") {
    spark.conf.set(Lake.CheckpointParquetMinEntriesKey, "8")
    try {
      val base = java.nio.file.Files.createTempDirectory("lakecdclazy").toString
      val out = s"$base/lake"
      Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"))  // v1
      (1 to 9).foreach(i => Pipeline.appendToLake(spark, out,
        fixture(20 + 5 * (i - 1) until 20 + 5 * i)))                        // v2..v10: columnar cp
      Pipeline.deleteFromLake(spark, out, Seq(3L).toDF("doc_id"), "doc_id",
        retainHistory = true)                                               // v11: rewrite delete
      Lake.restore(spark, out, 10L)                                         // v12: restore (eager-forcing, by design)
      Lake.invalidateStateCache()
      assert(Lake.latestManifest(spark, out).get.cpLazy.isDefined,
        "the fixture must resolve lazily by default")
      val eager0 = Lake.eagerV3Loads.get()
      // batch change feed over the RESTORE-BEARING range: plans O(delta)
      // from the log's own lines — the corpus stats map is never needed
      val feed = Lake.changeFeed(spark, out, 0L, 12L)
      val dataCols = Lake.read(spark, out).columns.map(col).toSeq
      val mirror = feed.filter(col("_change_type").isin("insert", "update_postimage"))
        .select(dataCols: _*)
        .exceptAll(feed.filter(col("_change_type").isin("delete", "update_preimage"))
          .select(dataCols: _*))
      assert(mirror.count() == 65 &&
        Lake.read(spark, out).count() == 65,
        "the feed must net to the restored lake under lazy resolution")
      assert(Lake.eagerV3Loads.get() == eager0,
        "batch changeFeed must not materialize checkpoint stats eagerly")
      // the CDC STREAM tails the same lake — every micro-batch resolves
      // states lazily too (incl. the restore-bearing version)
      val q = spark.readStream.format("graft-lake-cdc")
        .option("startingVersion", "earliest")
        .load(out)
        .writeStream.format("memory").queryName("lazy_cdc_tail")
        .option("checkpointLocation", s"$base/ck")
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("lazy_cdc_tail").select("doc_id").collect()
          .map(_.getLong(0))
        // the seed + appends (0..64), plus the restore's re-added rows
        assert(got.toSet.intersect((0L until 65L).toSet) == (0L until 65L).toSet,
          s"the stream must deliver every added doc under lazy resolution, got ${got.length}")
        assert(Lake.eagerV3Loads.get() == eager0,
          "the CDC stream must not materialize checkpoint stats eagerly")
      } finally q.stop()
    } finally spark.conf.unset(Lake.CheckpointParquetMinEntriesKey)
  }

  test("batch changeFeed over sparse mutations: tombstoned pre-images surface as deletes with their partitions") {
    val base = java.nio.file.Files.createTempDirectory("lakefeedsparse").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))         // v1
    Pipeline.mergeIntoLakeSparse(spark, out,
      fixture(5 to 5, "patched").unionByName(fixture(60 to 60)))                 // v2
    val ev = Lake.changeFeed(spark, out, 1L, 2L)
      .select("doc_id", "text", "split", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(ev == Set(
      (5L, "doc 5", "train", "update_preimage"),
      (5L, "patched 5", "train", "update_postimage"),
      (60L, "doc 60", "train", "insert")),
      s"sparse upserts must feed update pre/post-image pairs plus inserts, got $ev")
  }

  test("mid-stream additive evolution: a running stream continues through a nullable ADD; a restart widens") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcevolve").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 5), out, Seq("split", "shard_id"))          // v1
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_evolve")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_evolve").count() == 5)
      // a PURE NULLABLE ADD lands under the running stream: the batch
      // CONTINUES — the new column simply isn't in this stream's
      // declared schema until a restart (Delta's schema-tracking shape)
      Pipeline.appendToLake(spark, out,
        fixture(10 until 12).withColumn("lang", lit("en")), mergeSchema = true)  // v2
      q.processAllAvailable()
      val live = spark.table("lake_evolve")
      assert(live.count() == 7, "the running stream must admit the post-add version")
      assert(!live.columns.contains("lang"),
        "the running stream keeps its start-time schema until restart")
    } finally q.stop()
    // a FRESH stream (start-time schema now includes the new column)
    // catches up across the historical evolution: v1's narrower files
    // decode with the new column null
    val q2 = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_evolve2")
      .option("checkpointLocation", s"$base/ck2")
      .start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("lake_evolve2").collect()
      assert(rows.length == 7)
      assert(rows.filter(_.getAs[Long]("doc_id") < 5).forall(_.getAs[String]("lang") == null),
        "pre-evolution files must decode the new column as null")
      assert(rows.filter(_.getAs[Long]("doc_id") >= 10).forall(_.getAs[String]("lang") == "en"))
      // an in-range nullable ADD keeps a running stream going too
      Pipeline.appendToLake(spark, out,
        fixture(20 until 21).withColumn("lang", lit("en"))
          .withColumn("score", lit(1).cast("int")), mergeSchema = true)          // v3
      q2.processAllAvailable()
      assert(spark.table("lake_evolve2").count() == 8)
    } finally q2.stop()
    // a RETYPE of a column the stream DECLARES still refuses loudly:
    // this stream's start schema includes score:int; the widen to long
    // lands in range and the batch fails naming the retype
    val q3 = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_evolve3")
      .option("checkpointLocation", s"$base/ck3")
      .start()
    try {
      q3.processAllAvailable()
      assert(spark.table("lake_evolve3").count() == 8)
      Lake.widenColumn(spark, out, "score", org.apache.spark.sql.types.LongType) // v4
      Pipeline.appendToLake(spark, out, fixture(30 until 31)
        .withColumn("lang", lit("en")).withColumn("score", lit(2L)))             // v5
      val eW = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q3.processAllAvailable()
      }
      assert(eW.getMessage.contains("retyped") ||
        Option(eW.getCause).exists(_.getMessage.contains("retyped")),
        s"a widen in range must refuse naming the retype, got: ${eW.getMessage}")
    } finally q3.stop()
  }

  test("schemaTrackingLocation: a mid-stream widen kills the batch recording the evolved schema; a tracked restart resumes the checkpoint and replays the pre-widen tail under the widened declaration") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("lakecdctrack").toString
    def docs(ids: Seq[(Long, Long)]) = ids.toDF("doc_id", "score")
      .select(col("doc_id"), concat(lit("doc "), col("doc_id")).as("text"),
        col("score").cast("int"), lit("train").as("split"))
    val wideRead = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("score", LongType),
      StructField("split", StringType)))

    // ── lake A: the RUNNING stream is killed AT the widen; the refusal
    // records the evolved schema and the tracked restart RESUMES the
    // checkpointed offset (no replay of the committed prefix)
    val outA = s"$base/lakeA"
    Lake.init(spark, docs((0L until 5L).map(i => i -> i)), outA, Seq("split"))   // v1
    def startA() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("schemaTrackingLocation", s"$base/trackA")
      .load(outA)
      .writeStream.format("parquet")
      .option("path", s"$base/sinkA").option("checkpointLocation", s"$base/ckA")
      .start()
    val qa = startA()
    try {
      qa.processAllAvailable()                                                   // v1 committed
      Lake.widenColumn(spark, outA, "score", LongType)                           // v2
      Pipeline.appendToLake(spark, outA,
        Seq((100L, "doc 100", 5000000000L, "train"))
          .toDF("doc_id", "text", "score", "split"))                             // v3
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        qa.processAllAvailable()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).mkString
      assert(msg.contains("retyped") && msg.contains("schemaTrackingLocation"),
        s"the tracked refusal must name the retype and the recorded schema, got: $msg")
    } finally qa.stop()
    val trackA = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/trackA/graft-cdc-schema")), "UTF-8")
    assert(trackA.startsWith("2\n") && trackA.contains("\"long\""),
      s"the kill must record the widen version's evolved schema, got: ${trackA.take(80)}")
    val qa2 = startA()
    try qa2.processAllAvailable() finally qa2.stop()
    val sunkA = spark.read.schema(wideRead).parquet(s"$base/sinkA")
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sunkA.groupBy(identity).view.mapValues(_.size).toMap ==
      ((0L until 5L).map(i => (i, i)) :+ (100L -> 5000000000L))
        .map(_ -> 1).toMap,
      s"the restart must resume the offset — committed rows once, the wide row once: ${sunkA.sorted.toSeq}")

    // ── lake B: the widen lands while the stream is DOWN with a narrow
    // append still unprocessed — an untracked restart refuses with the
    // unchanged text; the tracked restart replays the narrow tail under
    // the widened declaration (native parquet widening), exactly once
    val outB = s"$base/lakeB"
    Lake.init(spark, docs((0L until 3L).map(i => i -> i)), outB, Seq("split"))   // v1
    def startB(track: Boolean) = {
      val r = spark.readStream.format("graft-lake-cdc")
        .option("startingVersion", "earliest")
      (if (track) r.option("schemaTrackingLocation", s"$base/trackB") else r)
        .load(outB)
        .writeStream.format("parquet")
        .option("path", s"$base/sinkB").option("checkpointLocation", s"$base/ckB")
        .start()
    }
    val qb = startB(track = true)
    try qb.processAllAvailable() finally qb.stop()                               // v1 committed
    Pipeline.appendToLake(spark, outB, docs(Seq(10L -> 10L, 11L -> 11L)))        // v2: narrow, unprocessed
    Lake.widenColumn(spark, outB, "score", LongType)                             // v3
    Pipeline.appendToLake(spark, outB,
      Seq((20L, "doc 20", 6000000000L, "train"))
        .toDF("doc_id", "text", "score", "split"))                               // v4: wide
    val qb2 = startB(track = false)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try qb2.processAllAvailable() finally qb2.stop()
    }
    val msg2 = e2.getMessage + Option(e2.getCause).map(_.getMessage).mkString
    assert(msg2.contains("retyped") && !msg2.contains("schemaTrackingLocation"),
      s"without the option the conservative refusal text is unchanged, got: $msg2")
    val qb3 = startB(track = true)
    try qb3.processAllAvailable() finally qb3.stop()
    val sunkB = spark.read.schema(wideRead).parquet(s"$base/sinkB")
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectB = ((0L until 3L).map(i => (i, i)) ++
      Seq(10L -> 10L, 11L -> 11L, 20L -> 6000000000L)).map(_ -> 1).toMap
    assert(sunkB.groupBy(identity).view.mapValues(_.size).toMap == expectB,
      s"the tracked restart must replay the narrow tail exactly once, widened: ${sunkB.sorted.toSeq}")
    // net convergence: the sink mirrors the lake
    val lakeB = Lake.read(spark, outB).select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(sunkB.sorted.toSeq == lakeB.sorted.toSeq,
      "the tracked stream's full replay must equal the batch read")
  }

  test("schema tracking through renames: a restart across a rename resumes the checkpoint and replays the pre-rename tail under the new name; rename+widen chains follow too") {
    import org.apache.spark.sql.types._
    val base = java.nio.file.Files.createTempDirectory("lakecdcrentrack").toString

    // ── lake A: PURE RENAME lands while the stream is DOWN with a
    // pre-rename append unprocessed. Physical names are time-invariant
    // (the column-mapping identity), so the tracked restart resumes the
    // checkpointed offset and decodes the pre-rename tail under the NEW
    // logical declaration — no fresh stream, no replayed prefix.
    val outA = s"$base/lakeA"
    def docsA(ids: Range) = ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("train").as("split"))
    Lake.init(spark, docsA(0 until 3), outA, Seq("split"))                       // v1
    def startA() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("schemaTrackingLocation", s"$base/trackA")
      .load(outA)
      .writeStream.format("parquet")
      .option("path", s"$base/sinkA").option("checkpointLocation", s"$base/ckA")
      .start()
    val qa = startA()
    try qa.processAllAvailable() finally qa.stop()                               // v1 committed
    Pipeline.appendToLake(spark, outA, docsA(10 until 12))                       // v2: pre-rename, unprocessed
    Lake.renameColumn(spark, outA, "text", "body")                               // v3: metadata-only
    Pipeline.appendToLake(spark, outA,
      Seq((20L, "doc 20", "train")).toDF("doc_id", "body", "split"))             // v4: post-rename
    val qa2 = startA()
    try qa2.processAllAvailable() finally qa2.stop()
    val sinkASchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("body", StringType),
      StructField("split", StringType)))
    val sunkA = spark.read.schema(sinkASchema).parquet(s"$base/sinkA")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)).getOrElse(r.getString(2))))
    assert(sunkA.groupBy(_._1).view.mapValues(_.size).forall(_._2 == 1),
      s"the rename restart must replay exactly once, got ${sunkA.sorted.toSeq}")
    assert(sunkA.map(_._1).toSet == Set(0L, 1L, 2L, 10L, 11L, 20L) &&
      sunkA.toMap.apply(10L) == "doc 10" && sunkA.toMap.apply(20L) == "doc 20",
      s"pre-rename tail must decode under the restarted declaration, got ${sunkA.sorted.toSeq}")
    // the restarted run wrote the NEW logical name (merge the sink's two
    // schema generations — inference alone picks an arbitrary footer)
    val restartFiles = spark.read.option("mergeSchema", "true").parquet(s"$base/sinkA")
    assert(restartFiles.columns.contains("body"),
      s"the restarted stream must declare the renamed column, got ${restartFiles.columns.toSeq}")

    // ── lake B: RENAME + WIDEN land in the same down-window — the full
    // additive chain (Delta schema-tracking parity): the tracked restart
    // follows both, replaying the narrow pre-rename tail widened AND
    // renamed, exactly once
    val outB = s"$base/lakeB"
    def docsB(ids: Range) = ids.map(i => (i.toLong, i)).toDF("doc_id", "score")
      .select(col("doc_id"), col("score").cast("int"), lit("train").as("split"))
    Lake.init(spark, docsB(0 until 3), outB, Seq("split"))                       // v1
    def startB() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("schemaTrackingLocation", s"$base/trackB")
      .load(outB)
      .writeStream.format("parquet")
      .option("path", s"$base/sinkB").option("checkpointLocation", s"$base/ckB")
      .start()
    val qb = startB()
    try qb.processAllAvailable() finally qb.stop()                               // v1 committed
    Pipeline.appendToLake(spark, outB, docsB(10 until 12))                       // v2: narrow, unprocessed
    Lake.widenColumn(spark, outB, "score", LongType)                             // v3
    Lake.renameColumn(spark, outB, "score", "points")                            // v4
    Pipeline.appendToLake(spark, outB,
      Seq((20L, 7000000000L, "train")).toDF("doc_id", "points", "split"))        // v5: wide+renamed
    val qb2 = startB()
    try qb2.processAllAvailable() finally qb2.stop()
    val sinkBSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("score", LongType), StructField("points", LongType),
      StructField("split", StringType)))
    val sunkB = spark.read.schema(sinkBSchema).parquet(s"$base/sinkB")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) r.getLong(2) else r.getLong(1)))
    val expectB = Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 10L -> 10L, 11L -> 11L,
      20L -> 7000000000L)
    assert(sunkB.groupBy(_._1).view.mapValues(_.size).forall(_._2 == 1) &&
      sunkB.toMap == expectB,
      s"the rename+widen restart must follow the chain exactly once, got ${sunkB.sorted.toSeq}")
    // net convergence with the batch read
    val lakeB = Lake.read(spark, outB).select("doc_id", "points").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sunkB.toMap == lakeB, "the tracked stream's full replay must equal the batch read")
  }

  test("schema tracking refuses a restart across a COLUMN DROP: a column the stream served cannot silently vanish") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcdrop").toString
    val out = s"$base/lake"
    def docs(ids: Range) = ids.map(i => (i.toLong, s"doc $i", s"note $i"))
      .toDF("doc_id", "text", "note")
      .select(col("doc_id"), col("text"), col("note"), lit("train").as("split"))
    Lake.init(spark, docs(0 until 3), out, Seq("split"))                         // v1
    def start() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("schemaTrackingLocation", s"$base/track")
      .load(out)
      .writeStream.format("parquet")
      .option("path", s"$base/sink").option("checkpointLocation", s"$base/ck")
      .start()
    val q = start()
    try q.processAllAvailable() finally q.stop()                                 // v1 committed
    Pipeline.appendToLake(spark, out, docs(10 until 12))                         // v2: unprocessed
    Lake.dropColumn(spark, out, "note")                                          // v3: tombstone
    // the tracked schema served `note`; the restarted declaration would
    // silently lose it — the chain validation must refuse BY NAME (a
    // consumer decides: fresh stream without the column, or restore)
    val e = intercept[Throwable] {
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    }
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(msg.contains("note") && msg.contains("cannot follow"),
      s"the refusal must name the dropped column, got: $msg")
  }

  test("startingTimestamp: the stream replays every commit at or after the asked-for wall-clock") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcts").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))   // v1
    Thread.sleep(15)
    val betweenTs = System.currentTimeMillis()
    Thread.sleep(15)
    Pipeline.appendToLake(spark, out, fixture(10 until 15))                // v2
    Pipeline.appendToLake(spark, out, fixture(15 until 20))                // v3
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingTimestamp", betweenTs.toString)
      .load(out)
      .writeStream.format("memory").queryName("lake_ts_start")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_ts_start").collect().map(_.getAs[Long]("doc_id")).toSet ==
        (10L until 20L).toSet,
        "only the commits at or after the timestamp may replay")
    } finally q.stop()
    // a future timestamp tails: nothing pre-existing replays
    val q2 = spark.readStream.format("graft-lake-cdc")
      .option("startingTimestamp", (System.currentTimeMillis() + 60000L).toString)
      .load(out)
      .writeStream.format("memory").queryName("lake_ts_tail")
      .option("checkpointLocation", s"$base/ck2")
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("lake_ts_tail").count() == 0)
    } finally q2.stop()
    intercept[Exception] {
      spark.readStream.format("graft-lake-cdc")
        .option("startingTimestamp", betweenTs.toString)
        .option("startingVersion", "earliest")
        .load(out)
        .writeStream.format("memory").queryName("lake_ts_both")
        .option("checkpointLocation", s"$base/ck3")
        .start().processAllAvailable()
    }
  }

  test("lake CDC stream default start is the tail: only commits after stream start surface") {
    val base = java.nio.file.Files.createTempDirectory("lakecdctail").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id")) // v1 — before the stream
    val q = spark.readStream.format("graft-lake-cdc").load(out)
      .writeStream.format("memory").queryName("lake_tail3")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_tail3").count() == 0,
        "without startingVersion the stream tails: pre-existing corpus not replayed")
      Pipeline.appendToLake(spark, out, fixture(20 until 25))
      q.processAllAvailable()
      assert(spark.table("lake_tail3").collect().map(_.getAs[Long]("doc_id")).toSet ==
        (20L until 25L).toSet)
    } finally q.stop()
  }

  test("column rename mid-stream: the running tail is undisturbed (physical decode); a fresh stream surfaces the new name") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcrename").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"))         // v1
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_rename_tail")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("lake_rename_tail").count() == 20)
      // a pure rename is INVISIBLE to the running stream: the decode is
      // by physical name (time-invariant), the declared logical schema
      // refreshes on restart — no refusal, no rows
      Lake.renameColumn(spark, out, "text", "body")                              // v2
      q.processAllAvailable()
      assert(spark.table("lake_rename_tail").count() == 20,
        "a metadata-only rename must stream nothing")
      // post-rename appends stream through under the START-TIME logical
      // name, values intact (the new files spell the physical name)
      Pipeline.appendToLake(spark, out, fixture(20 until 25)
        .withColumnRenamed("text", "body"))                                      // v3
      q.processAllAvailable()
      val rows = spark.table("lake_rename_tail").collect()
      assert(rows.length == 25)
      assert(rows.forall(_.getAs[String]("text") != null),
        "post-rename files must decode under the stream's start-time column")
    } finally q.stop()
    // a FRESH stream declares the renamed schema and replays EVERYTHING —
    // pre-rename history decodes by the same physical name
    val q2 = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .load(out)
      .writeStream.format("memory").queryName("lake_rename_tail2")
      .option("checkpointLocation", s"$base/ck2")
      .start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("lake_rename_tail2").collect()
      assert(rows.length == 25)
      assert(rows.forall(_.getAs[String]("body") != null),
        "pre-rename history must decode under the new logical name")
    } finally q2.stop()
  }

  test("change-feed stream across a restore back OFF a DV-bearing version: vectors applied, rows resurrect") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcrestoredv0").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"),
      statsCols = Seq("doc_id"))                                                 // v1: clean
    Pipeline.deleteFromLakeSparse(spark, out, Seq(3L, 7L).toDF("doc_id"), "doc_id") // v2: DVs attach
    Lake.restore(spark, out, 1L)                                                 // v3: back OFF the DVs
    // v3's delta removes-and-re-adds the DV'd files (the dvDiff device):
    // the stream must decode the REMOVED side minus the tombstoned
    // positions (3 and 7 already emitted as deletes at v2) and the
    // re-added side in full — net effect: the two rows RESURRECT
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("memory").queryName("lake_restore_dv0")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("lake_restore_dv0").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version")))
    assert(rows.filter(t => t._3 == 2L && t._2 == "delete").map(_._1).toSet == Set(3L, 7L))
    val v3del = rows.filter(t => t._3 == 3L && t._2 == "delete").map(_._1).toSet
    val v3ins = rows.filter(t => t._3 == 3L && t._2 == "insert").map(_._1).toSet
    assert(!v3del.contains(3L) && !v3del.contains(7L),
      s"already-tombstoned rows must not re-emit as deletes, got $v3del")
    assert(v3ins.contains(3L) && v3ins.contains(7L),
      "the restore's re-added files resurrect the undeleted rows as inserts")
    assert(v3del.subsetOf(v3ins),
      "a detach-restore's deletes re-add identically (remove+re-add of the same files)")
    // net replay converges to the fully-restored lake
    val net = rows.foldLeft(Map.empty[Long, Int]) { case (m, (id, tpe, _)) =>
      m.updated(id, m.getOrElse(id, 0) + (if (tpe == "insert") 1 else -1)) }
      .filter(_._2 > 0).keySet
    assert(net == (0L until 20L).toSet,
      s"net replay must equal the restored lake, got ${net.toSeq.sorted.mkString(",")}")
    // and the batch feed agrees over the same range
    val feed = Lake.changeFeed(spark, out, 0L, 3L)
    val mirror = feed.filter(col("_change_type") === "insert").select("doc_id", "text")
      .exceptAll(feed.filter(col("_change_type") === "delete").select("doc_id", "text"))
      .collect().map(_.getLong(0)).sorted
    assert(mirror.toSeq == (0L until 20L).toSeq)
  }

  test("readChangeFeed across restores involving deletion vectors applies them — no phantom events") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcrestoredv").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"))          // v1
    Pipeline.appendToLake(spark, out, fixture(20 until 30))                       // v2
    Pipeline.deleteFromLakeSparse(spark, out, Seq(25L).toDF("doc_id"), "doc_id")  // v3: DV on a v2 file
    Lake.restore(spark, out, 1L)                                                  // v4: removes v2 files (one DV'd)
    Lake.restore(spark, out, 3L)                                                  // v5: re-adds them, vector re-attached

    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("memory").queryName("restore_dv_tail")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("restore_dv_tail").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("_change_type"),
        r.getAs[Long]("_commit_version")))

    // v4 removed the ten 20..29 docs, but 25 was ALREADY tombstoned at
    // v3 — exactly 9 delete events, and none for 25
    assert(rows.count(t => t._3 == 4L && t._2 == "delete") == 9,
      s"v4 must delete the 9 live rows only, got ${rows.filter(_._3 == 4L).toSeq}")
    assert(!rows.exists(t => t._3 == 4L && t._1 == 25L),
      "the already-tombstoned row must not re-emit at the restore")
    // v5 re-added the files with the vector re-attached — 9 inserts, not 10
    assert(rows.count(t => t._3 == 5L && t._2 == "insert") == 9)
    assert(!rows.exists(t => t._3 == 5L && t._1 == 25L))

    // net replay converges to the final lake exactly
    val net = rows.foldLeft(Map.empty[Long, Int]) { case (m, (id, tpe, _)) =>
      m.updated(id, m.getOrElse(id, 0) + (if (tpe == "insert") 1 else -1)) }
      .filter(_._2 > 0).keySet
    val lake = Lake.read(spark, out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(net == lake,
      s"net replay must equal the lake: extra=${net -- lake}, missing=${lake -- net}")
    assert(lake == ((0L until 25L) ++ (26L until 30L)).toSet)
  }

  test("readChangeFeed under raced same-row tombstones streams the delete exactly once") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcrace").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 20), out, Seq("split", "shard_id"))      // v1
    // two sparse deletes staged from the SAME base, both claiming doc 3
    // (production sidecar shape: lineage columns ride along)
    def stageSparse(idSet: Set[Long]) = {
      val b = Lake.adopt(spark, out)
      val lineage = Lake.readFilesWithLineage(spark, out, b.schemaJson, b.files, b.dvs)
      val matched = lineage.filter(col("doc_id").isInCollection(idSet.toSeq))
      val cdcPath = Lake.stageCdc(spark, out, matched, Seq("split", "shard_id"))
      val (sidecar, n, files) = Lake.stageDv(spark, out,
        matched.select(col("_gf_file").as("file"), col("_gf_pos").as("pos")))
      (b, n, files.map(f => f -> Seq(sidecar)).toMap, Seq((cdcPath, "delete")))
    }
    val (bA, nA, dvA, cdcA) = stageSparse(Set(3L))
    val (bB, nB, dvB, cdcB) = stageSparse(Set(3L, 6L))
    Lake.publish(spark, Lake.StagedCommit(out, bA, "delete", bA.schemaJson,
      Seq.empty, Seq.empty, nA, nA, dvAdds = dvA, cdcFiles = cdcA))           // v2
    Lake.publish(spark, Lake.StagedCommit(out, bB, "delete", bB.schemaJson,
      Seq.empty, Seq.empty, nB, nB, dvAdds = dvB, cdcFiles = cdcB))           // v3

    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("memory").queryName("race_dedup_tail")
      .option("checkpointLocation", s"$base/ck")
      .start()
    try q.processAllAvailable() finally q.stop()
    val dels = spark.table("race_dedup_tail")
      .filter(col("_change_type") === "delete")
      .select("doc_id", "_commit_version").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("_commit_version"))).toSeq.sorted
    assert(dels == Seq((3L, 2L), (6L, 3L)),
      s"the stream must emit each raced tombstone exactly once, got $dels")
    // net replay still converges
    val rows = spark.table("race_dedup_tail").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("_change_type")))
    val net = rows.foldLeft(Map.empty[Long, Int]) { case (m, (id, tpe)) =>
      m.updated(id, m.getOrElse(id, 0) + (if (tpe == "insert") 1 else -1)) }
      .filter(_._2 > 0).keySet
    assert(net == (0L until 20L).toSet -- Set(3L, 6L))
  }

  test("schema tracking on a lake with a PRE-EXISTING dropped column: a zero-change restart resumes instead of refusing forever") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcpredrop").toString
    val out = s"$base/lake"
    def docs(ids: Range) = ids.map(i => (i.toLong, s"doc $i", s"note $i"))
      .toDF("doc_id", "text", "note")
      .select(col("doc_id"), col("text"), col("note"), lit("train").as("split"))
    Lake.init(spark, docs(0 until 3), out, Seq("split"))    // v1
    Lake.dropColumn(spark, out, "note")                     // v2: tombstone in the manifest
    def start() = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("schemaTrackingLocation", s"$base/track")
      .load(out)
      .writeStream.format("parquet")
      .option("path", s"$base/sink").option("checkpointLocation", s"$base/ck")
      .start()
    val q = start()
    try q.processAllAvailable() finally q.stop()
    // the tombstone is manifest bookkeeping, not a served column: a
    // restart with ZERO lake changes must follow its own tracked schema
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    Pipeline.appendToLake(spark, out,
      Seq((10L, "doc 10")).toDF("doc_id", "text")
        .select(col("doc_id"), col("text"), lit("train").as("split")))
    val q3 = start()
    try q3.processAllAvailable() finally q3.stop()
    val sunk = spark.read.parquet(s"$base/sink").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sunk == Seq(0L, 1L, 2L, 10L),
      s"tracked restarts across a pre-existing drop must stream on, got $sunk")
  }

  test("readChangeFeed refuses a removing commit with no sidecar (pre-change-feed build) instead of silently dropping its deletes") {
    val base = java.nio.file.Files.createTempDirectory("lakecdcprecdf").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 6), out, Seq("split", "shard_id"))  // v1
    val st = Lake.latestManifest(spark, out).get
    // the delta a pre-change-feed build would have committed: removes a
    // live file, carries no C lines
    val victim = st.files.head
    val enc = (x: String) => java.net.URLEncoder.encode(x, "UTF-8")
    val legacy = s"graft-delta-v1\tdelete\t${System.currentTimeMillis()}\t0\t0\t1\t0\t0\n" +
      s"S\t${enc(st.schemaJson)}\n" +
      s"R\t${enc(victim)}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(out, Lake.LogDirName, f"v${2L}%020d.manifest"),
      legacy.getBytes("UTF-8"))
    Lake.invalidateStateCache()
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("memory").queryName("precdf_tail")
      .start()
    val e = intercept[Throwable] {
      try q.processAllAvailable() finally q.stop()
    }
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(msg.contains("pre-change-feed") && msg.contains("not reconstructible"),
      s"the batch feed's refusal must hold for the stream too, got: $msg")
  }

  test("startingTimestamp literal reads in the SESSION time zone, not the JVM default") {
    val base = java.nio.file.Files.createTempDirectory("lakecdctz").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 4), out, Seq("split", "shard_id"))
    // a literal spelling an-hour-ago in a zone 10h ahead of UTC:
    // session-tz parsing puts the boundary 1h BEFORE the commit
    // (streams it); a JVM-default (UTC) parse would put it ~9h AFTER
    // (tails, silently dropping the commit)
    val zone = java.time.ZoneId.of("Australia/Brisbane") // +10, no DST
    val nowThere = java.time.LocalDateTime.now(zone).minusHours(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    spark.conf.set("spark.sql.session.timeZone", "Australia/Brisbane")
    try {
      val q = spark.readStream.format("graft-lake-cdc")
        .option("startingTimestamp", nowThere)
        .load(out)
        .writeStream.format("memory").queryName("tz_tail")
        .start()
      try q.processAllAvailable() finally q.stop()
      val n = spark.table("tz_tail").count()
      assert(n == 4L,
        s"a session-tz 'now' literal must include the just-committed version, got $n rows")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }
}
