package graft.sources

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.operators.Lake

/** The stream→lake half of the loop behind the format string:
  * `writeStream.format("graft-lake")` lands every micro-batch as one
  * protocol append, exactly-once under crash-replay via the manifest's
  * transaction watermark ([[Lake.LakeState.txns]]). */
class LakeSinkSpec extends SparkTestBase {

  import spark.implicits._

  private def fixture(ids: Range, tag: String = "doc") =
    ids.map(i => (i.toLong, s"$tag $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") < 1000, "train").otherwise("test").as("split"),
        (col("doc_id") % 2).cast("int").as("shard_id"))

  private def lakeIds(out: String): Seq[Long] =
    Lake.read(spark, out).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("streaming sink: micro-batches land as tagged protocol appends, exactly once through a crash-replay") {
    val base = java.nio.file.Files.createTempDirectory("lakesink").toString
    val out = s"$base/lake"; val src = s"$base/src"; val ckpt = s"$base/ck"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id")) // v1

    def run(): Unit = {
      val q = spark.readStream.schema(fixture(0 until 1).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }

    fixture(10 until 20).repartition(2).write.parquet(src)
    run()
    assert(lakeIds(out) == (0L until 20L), "both micro-batches must land")
    val appends = Lake.describeHistory(spark, out).collect()
      .filter(_.getAs[String]("action") == "append")
    assert(appends.length == 2,
      s"maxFilesPerTrigger=1 over 2 files must commit 2 appends, got ${appends.length}")
    val st1 = Lake.currentState(spark, out)
    assert(st1.txns.keys.exists(_.startsWith("streaming-sink-")) &&
      st1.txns.values.max == 1L,
      s"commits must move the sink's transaction watermark to batch 1, got ${st1.txns}")

    // catch-up run over newly-landed files: only the new batch commits
    fixture(20 until 25).coalesce(1).write.mode("append").parquet(src)
    run()
    assert(lakeIds(out) == (0L until 25L))
    val vAfter = Lake.currentState(spark, out).version

    // crash simulation: the lake commit landed but the stream died before
    // writing its checkpoint commit marker — on restart Spark re-runs the
    // batch with the same id, and the watermark must swallow the replay
    val commits = new File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    // the local-FS checksum sidecar must go with it, or the re-run's
    // commit rename trips over the stale .crc
    new File(last.getParentFile, s".${last.getName}.crc").delete()
    assert(last.delete())
    run()
    assert(lakeIds(out) == (0L until 25L),
      "a crash-replayed micro-batch must not duplicate rows")
    assert(Lake.currentState(spark, out).version == vAfter,
      "a crash-replayed micro-batch must not commit a new version")
  }

  test("streaming sink auto-compaction bounds file counts across many micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("lakesinkcompact").toString
    val out = s"$base/lake"; val src = s"$base/src"; val ckpt = s"$base/ck"
    Lake.init(spark, fixture(0 until 4), out, Seq("split", "shard_id"))
    // 6 single-row files -> 6 micro-batches; compactEvery=2 folds as it goes
    (0 until 6).foreach { i =>
      fixture((10 + i) until (11 + i)).coalesce(1).write.mode("append").parquet(src)
    }
    val q = spark.readStream.schema(fixture(0 until 1).schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", ckpt)
      .option("compactEvery", "2")
      .option("compactMaxFilesPerPartition", "1")
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    assert(lakeIds(out) == ((0L until 4L) ++ (10L until 16L)),
      "all batches land exactly once through the compacting sink")
    val st = Lake.currentState(spark, out)
    val perDir = st.files.groupBy(f => f.take(f.lastIndexOf('/'))).values.map(_.size)
    assert(perDir.max <= 2,
      s"compactEvery must bound per-partition file counts, got ${perDir.toSeq}")
    val hist = Lake.describeHistory(spark, out).collect().map(_.getString(2))
    assert(hist.contains("compact"), "the sink's maintenance pass commits compactions")
  }

  test("streaming sink refusals: non-lake target, schema drift, partitionBy") {
    val base = java.nio.file.Files.createTempDirectory("lakesinkrefuse").toString
    implicit val ctx = spark.sqlContext

    // the DSv2 streaming write is created lazily on the stream thread,
    // so refusals surface through the query's failure — collect the
    // whole cause chain's messages
    def failureOf(body: => Unit): String = {
      val e = intercept[Throwable](body)
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
    }
    def runToFailure(dfb: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row],
        feed: () => Unit): String = failureOf {
      val q = dfb.start()
      try { feed(); q.processAllAvailable() } finally q.stop()
    }

    val mem1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val m1 = runToFailure(
      mem1.toDF().toDF("doc_id", "text").writeStream.format("graft-lake")
        .option("checkpointLocation", s"$base/ck1").option("path", s"$base/nolake"),
      () => { mem1.addData((1L, "a")); () })
    assert(m1.contains("not a lake"), s"got: $m1")

    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 4), out, Seq("split", "shard_id"))

    // schema drift refuses at write creation — no mid-stream evolution
    val mem2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val m2 = runToFailure(
      mem2.toDF().toDF("doc_id", "body").writeStream.format("graft-lake")
        .option("checkpointLocation", s"$base/ck2").option("path", out),
      () => { mem2.addData((1L, "a")); () })
    assert(m2.contains("exactly the lake's"), s"got: $m2")

    // writer-side partitionBy never reaches a DSv2 streaming sink —
    // Spark drops it before the write is created (same for every v2
    // sink, Delta included) — so the pinned CONTRACT is that rows
    // still route by the lake's committed layout regardless
    val mem3 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Int)]
    val q3 = mem3.toDF().toDF("doc_id", "text", "split", "shard_id")
      .writeStream.format("graft-lake").partitionBy("text")
      .option("checkpointLocation", s"$base/ck3").option("path", out).start()
    try { mem3.addData((100L, "x", "train", 0)); q3.processAllAvailable() } finally q3.stop()
    val newFile = Lake.currentState(spark, out).files.find(_.contains("part-0-")).get
    assert(newFile.startsWith("split=train/shard_id=0/"),
      s"rows must route by the LAKE layout, not the ignored partitionBy: $newFile")
  }

  test("batch writes with txnAppId/txnVersion are idempotent under retry") {
    val base = java.nio.file.Files.createTempDirectory("laketxn").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 5), out, Seq("split", "shard_id"))
    val v0 = Lake.currentState(spark, out).version

    def writeTagged(ids: Range, v: Long): Unit =
      fixture(ids).write.format("graft-lake")
        .option("txnAppId", "loader").option("txnVersion", v.toString)
        .mode("append").save(out)

    writeTagged(100 until 105, 1L)
    assert(lakeIds(out) == ((0L until 5L) ++ (100L until 105L)))
    val v1 = Lake.currentState(spark, out).version
    assert(v1 == v0 + 1)

    // the retry loop re-sends the same (app, version): byte-identical or
    // not, it must not land again
    writeTagged(100 until 105, 1L)
    writeTagged(999 until 1000, 1L)
    assert(lakeIds(out) == ((0L until 5L) ++ (100L until 105L)),
      "a replayed transaction version must be a no-op")
    assert(Lake.currentState(spark, out).version == v1)

    // the next version lands; a LOWER one after it is also a replay
    writeTagged(105 until 110, 2L)
    assert(lakeIds(out) == ((0L until 5L) ++ (100L until 110L)))
    writeTagged(55 until 56, 1L)
    assert(lakeIds(out) == ((0L until 5L) ++ (100L until 110L)),
      "a version at or below the watermark must skip")
    assert(Lake.currentState(spark, out).txns == Map("loader" -> 2L))

    // half a tag is a misconfigured retry loop — refuse
    val e = intercept[IllegalArgumentException] {
      fixture(0 until 1).write.format("graft-lake")
        .option("txnAppId", "loader").mode("append").save(out)
    }
    assert(e.getMessage.contains("txnAppId and txnVersion"))

    // an untagged append alongside tagged ones neither checks nor moves
    // the watermark
    fixture(200 until 202).write.format("graft-lake").mode("append").save(out)
    assert(lakeIds(out) == ((0L until 5L) ++ (100L until 110L) ++ (200L until 202L)))
    assert(Lake.currentState(spark, out).txns == Map("loader" -> 2L))
  }

  test("transaction watermark survives the checkpoint grid and independent apps don't interfere") {
    val base = java.nio.file.Files.createTempDirectory("laketxncp").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 2), out, Seq("split", "shard_id")) // v1
    // push the log across the checkpoint interval (10) with tagged
    // commits from two writers, then verify the watermark resolved
    // THROUGH the checkpoint still dedupes
    (1 to 10).foreach { i =>
      val app = if (i % 2 == 0) "even" else "odd"
      fixture((1000 + i) until (1001 + i)).write.format("graft-lake")
        .option("txnAppId", app).option("txnVersion", i.toString)
        .mode("append").save(out)
    }
    val st = Lake.currentState(spark, out)
    assert(st.version == 11L)
    assert(st.txns == Map("even" -> 10L, "odd" -> 9L))
    // v10 wrote a lake checkpoint; this resolution replayed only v11 on
    // top of it, so the map above proves the T lines round-tripped
    fixture(2000 until 2001).write.format("graft-lake")
      .option("txnAppId", "odd").option("txnVersion", "3")
      .mode("append").save(out)
    assert(Lake.currentState(spark, out).version == 11L,
      "a replay below a checkpoint-carried watermark must skip")
    fixture(2000 until 2001).write.format("graft-lake")
      .option("txnAppId", "fresh").option("txnVersion", "3")
      .mode("append").save(out)
    assert(Lake.currentState(spark, out).version == 12L,
      "a NEW app's version 3 is not a replay of another app's")
  }

  test("streaming sink binds columns by the session resolver: differently-cased stream columns land aligned") {
    val base = java.nio.file.Files.createTempDirectory("lakesink-case").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 5), out, Seq("split", "shard_id")) // v1
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Int)]
    // UPPER-CASed names — the default resolver is case-insensitive,
    // exactly like the batch align-cast path
    val q = mem.toDF().toDF("DOC_ID", "TEXT", "SPLIT", "SHARD_ID")
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$base/ck")
      .start(out)
    try {
      mem.addData((100L, "100", "train", 0))
      q.processAllAvailable()
    } finally q.stop()
    val row = Lake.read(spark, out).filter(col("doc_id") === 100L).collect()
    assert(row.length == 1 && row(0).getAs[String]("text") == "100" &&
      row(0).getAs[String]("split") == "train",
      s"upper-cased stream columns must bind to their lake columns, got ${row.toSeq}")
  }

  test("streaming sink renders transform layouts: streamed rows land in exactly the directories the batch path chooses") {
    val base = java.nio.file.Files.createTempDirectory("lakesink-xform").toString
    implicit val ctx = spark.sqlContext
    def events(ids: Range) = ids.map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2026-01-${(i % 3) + 1}%02d 0${i % 9}:00:00"),
        if (i % 2 == 0) "view" else "click")
    }.toDF("event_id", "ts", "etype")
    def dirsOf(dir: String) = Lake.currentState(spark, dir).files
      .map(f => f.take(math.max(f.lastIndexOf('/'), 0))).toSet

    // mixed identity + time-transform layout, seeded identically in a
    // STREAMED lake and a BATCH twin; the same extra rows then arrive
    // via the sink vs appendToLake — directory sets must be identical
    val outS = s"$base/lakeS"; val outB = s"$base/lakeB"
    Seq(outS, outB).foreach(o =>
      Lake.init(spark, events(0 until 6), o, Seq("etype", "days(ts)")))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = mem.toDF().toDF("event_id", "ts", "etype")
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$base/ck")
      .start(outS)
    val extra = events(6 until 14)
    try {
      mem.addData(events(6 until 14).collect().map(r =>
        (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq)
      q.processAllAvailable()
    } finally q.stop()
    graft.operators.Pipeline.appendToLake(spark, outB, extra,
      idCol = "event_id", partitionCols = Seq("etype", "days(ts)"))
    assert(dirsOf(outS) == dirsOf(outB),
      s"streamed rows must land under the batch path's directories:\n" +
        s"  streamed: ${dirsOf(outS).toSeq.sorted}\n  batch: ${dirsOf(outB).toSeq.sorted}")
    assert(dirsOf(outS).forall(d => d.startsWith("etype=") && d.contains("/ts_day=2026-01-")),
      s"levels must spell etype=/ts_day=, got ${dirsOf(outS).toSeq.sorted}")
    // values round-trip exactly (ts reads from footers, not paths)
    val streamed = Lake.read(spark, outS).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[String]("etype"))).toSet
    assert(streamed == events(0 until 14).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSet,
      "streamed rows must read back exactly, transform sources from footers")
    // PER-ROW agreement (set equality could hide a mis-rendered row
    // landing in another live directory): every row's file must spell
    // the row's own day — the invariant transform path pruning rests on
    val bS = Lake.adopt(spark, outS)
    Lake.readFilesWithLineage(spark, outS, bS.schemaJson, bS.files, bS.dvs)
      .select("ts", "_gf_file").collect().foreach { r =>
        val day = r.getTimestamp(0).toString.take(10)
        assert(r.getString(1).contains(s"ts_day=$day/"),
          s"row at ${r.getTimestamp(0)} sits in ${r.getString(1)} — not its day")
      }
    // the CDC stream tails the transform lake's sink commits
    val tail = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest").load(outS)
      .writeStream.format("memory").queryName("xform_sink_tail")
      .option("checkpointLocation", s"$base/cktail").start()
    try {
      tail.processAllAvailable()
      assert(spark.table("xform_sink_tail").count() == 14)
    } finally tail.stop()

    // hash-transform parity: bucket(3, event_id) routes by Murmur3 —
    // the sink and the batch path must agree bucket-for-bucket
    val outS2 = s"$base/lakeS2"; val outB2 = s"$base/lakeB2"
    Seq(outS2, outB2).foreach(o =>
      Lake.init(spark, events(0 until 4), o, Seq("bucket(3, event_id)")))
    val mem2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val q2 = mem2.toDF().toDF("event_id", "ts", "etype")
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$base/ck2")
      .start(outS2)
    try {
      mem2.addData(events(4 until 20).collect().map(r =>
        (r.getLong(0), r.getTimestamp(1), r.getString(2))).toSeq)
      q2.processAllAvailable()
    } finally q2.stop()
    graft.operators.Pipeline.appendToLake(spark, outB2, events(4 until 20),
      idCol = "event_id", partitionCols = Seq("bucket(3, event_id)"))
    // per-bucket ROW counts must match exactly (dir sets alone could
    // hide a mis-hashed row landing in another live bucket)
    def bucketCounts(dir: String) = Lake.read(spark, dir)
      .selectExpr("pmod(hash(event_id), 3) as b").groupBy("b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(dirsOf(outS2) == dirsOf(outB2), "bucket dirs must agree")
    assert(bucketCounts(outS2) == bucketCounts(outB2),
      "Murmur3 bucket routing must agree row-for-row with the batch path")
    val perDirS = Lake.currentState(spark, outS2).files.groupBy(_.take(17))
    assert(perDirS.keySet.forall(_.startsWith("event_id_bucket3=")),
      s"bucket levels must spell event_id_bucket3=, got ${perDirS.keySet}")
  }

  test("streaming sink adopts a mid-stream relayout at the next epoch (the write rebuilds per batch)") {
    val base = java.nio.file.Files.createTempDirectory("lakesink-layout").toString
    val out = s"$base/lake"
    Lake.init(spark, fixture(0 until 10), out, Seq("split", "shard_id"))
    implicit val ctx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, Int)]
    val q = mem.toDF().toDF("doc_id", "text", "split", "shard_id")
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$base/ck")
      .start(out)
    try {
      mem.addData((10L, "ok", "train", 0))
      q.processAllAvailable() // one epoch lands under (split, shard_id)
      assert(lakeIds(out).contains(10L))
      graft.operators.Pipeline.repartitionLake(spark, out, Seq("split"))
      mem.addData((11L, "late", "train", 1))
      // Spark re-creates the DSv2 StreamingWrite per micro-batch, so the
      // next epoch re-derives the layout from the relayouted manifest —
      // the row lands under the NEW tree, never mixing layouts (the
      // intra-epoch race is guarded at commit; LakeStreamPlanSpec pins it)
      q.processAllAvailable()
      val st = Lake.currentState(spark, out)
      assert(lakeIds(out).contains(11L), "the post-relayout epoch must land")
      assert(st.files.forall(f => f.contains("split=") && !f.contains("shard_id=")),
        s"every file must sit under the new layout, got ${st.files}")
    } finally q.stop()
  }

  test("streaming sink refuses uncastable column types at stream START, not as an executor codegen failure") {
    val base = java.nio.file.Files.createTempDirectory("lakesinkcast").toString
    val out = s"$base/lake"; val src = s"$base/src"
    Lake.init(spark, fixture(0 until 4), out, Seq("split", "shard_id"))
    // same names, but doc_id arrives as an ARRAY — no cast to long
    // exists (text as an array would NOT do: Spark casts anything to
    // string, so that pair is legal)
    val bad = Seq((Seq(100L), "x", "train", 0))
      .toDF("doc_id", "text", "split", "shard_id")
    bad.write.parquet(src)
    val e = intercept[Throwable] {
      val q = spark.readStream.schema(bad.schema).parquet(src)
        .writeStream.format("graft-lake")
        .option("checkpointLocation", s"$base/ck")
        .trigger(Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).mkString(" ")
    assert(msg.contains("cannot cast") && msg.contains("doc_id"),
      s"expected the loud stream-start type refusal, got: $msg")
    assert(lakeIds(out) == (0L until 4L), "the lake must be untouched")
  }

  test("streaming sink caps open writers per task: an unclustered stream into a many-partition layout lands complete under a tiny cap") {
    val base = java.nio.file.Files.createTempDirectory("lakesinkcap").toString
    val out = s"$base/lake"; val src = s"$base/src"
    // 8 shards, rows deliberately unclustered (shard_id = id % 8 over an
    // ascending id stream interleaves all shards within every task)
    def docs(ids: Range) = ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("train").as("split"),
        (col("doc_id") % 8).cast("int").as("shard_id"))
    Lake.init(spark, docs(0 until 8), out, Seq("split", "shard_id"))
    docs(8 until 200).coalesce(1).write.parquet(src)
    val q = spark.readStream.schema(docs(0 until 1).schema).parquet(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$base/ck")
      .option("maxOpenWriters", "2") // force rolling across 8 directories
      .trigger(Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    assert(lakeIds(out) == (0L until 200L),
      "every row must land exactly once through the rolled writers")
    // rolling MUST have engaged: the single writer task (coalesce(1))
    // touches 8 directories, so a capless writer commits exactly 8
    // epoch files (16 with init's) — anything beyond 16 is a roll
    val st = Lake.latestManifest(spark, out).get
    assert(st.files.size > 16,
      s"expected the cap to roll files (one task x 8 dirs = 8 without it, " +
        s"16 with init's), got ${st.files.size}")
  }
}
