package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class EventStreamSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates a stream into 1-hour windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStream.windowedCounts(df)
      .writeStream.format("memory").queryName("wc_out").outputMode("complete").start()
    try {
      mem.addData(
        (ts("2024-01-01 00:10:00"), "click", 1.0),
        (ts("2024-01-01 00:20:00"), "click", 2.0),
        (ts("2024-01-01 01:05:00"), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc_out").collect()
        .map(r => (r.getAs[Timestamp]("hour").toString, r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 01:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedCounts over the real events parquet: streaming equals batch") {
    import org.apache.spark.sql.functions._
    // file-source stream over the driver-generated events table (ts is
    // TIMESTAMP(NANOS) in some generator versions — surfacing as nanos
    // long under nanosAsLong — and TIMESTAMP(MICROS) in others; handle
    // both, exactly as Tables does)
    val raw = spark.read.parquet(s"$sf/events.parquet")
    // watermark requires TIMESTAMP (LTZ) — keep LTZ here (session TZ is UTC)
    val toTs = (df: org.apache.spark.sql.DataFrame) =>
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // nanos long
      else df.withColumn("ts", col("ts").cast("timestamp")) // native micros
    val stream = toTs(
      spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
    val q = EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc_parquet").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("wc_parquet").collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = toTs(raw)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("window.start").as("hour"), col("event_type"), col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming (${streamed.size} rows) != batch (${batch.size} rows)")
    } finally q.stop()
  }

  test("sessionCounts: session windows merge within gap and split past it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val df = mem.toDF().toDF("user_id", "ts", "value")
    val q = EventStream.sessionCounts(df)
      .writeStream.format("memory").queryName("sw_out").outputMode("complete").start()
    try {
      mem.addData(
        (7L, ts("2024-01-01 00:00:00"), 1.0),
        (7L, ts("2024-01-01 00:04:00"), 2.0), // within gap → same session
        (7L, ts("2024-01-01 00:20:00"), 4.0), // 16 min later → new session
        (8L, ts("2024-01-01 00:00:30"), 8.0))
      q.processAllAvailable()
      val rows = spark.table("sw_out").collect()
        .map(r => (r.getLong(0), r.getAs[Timestamp]("s_start").toString,
          r.getAs[Timestamp]("s_end").toString, r.getLong(3), r.getDouble(4))).toSet
      assert(rows == Set(
        (7L, "2024-01-01 00:00:00.0", "2024-01-01 00:09:00.0", 2L, 3.0),
        (7L, "2024-01-01 00:20:00.0", "2024-01-01 00:25:00.0", 1L, 4.0),
        (8L, "2024-01-01 00:00:30.0", "2024-01-01 00:05:30.0", 1L, 8.0)))
    } finally q.stop()
  }

  test("sessionCounts over the real events parquet: streaming equals the q87 batch query") {
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val toTs = (df: org.apache.spark.sql.DataFrame) =>
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // nanos long
      else df.withColumn("ts", col("ts").cast("timestamp")) // native micros
    val stream = toTs(
      spark.readStream.schema(raw.schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf))
    val q = EventStream.sessionCounts(stream)
      .writeStream.format("memory").queryName("sw_parquet").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sw_parquet").collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3), r.getDouble(4))).toSet
      val batch = toTs(raw).select(col("user_id"), col("ts"), col("value"))
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
        .select(col("user_id"), col("w.start"), col("w.end"), col("n_events"), col("sum_value"))
        .collect()
        .map(r => (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3), r.getDouble(4))).toSet
      assert(streamed.nonEmpty && streamed == batch,
        s"streaming (${streamed.size} rows) != batch (${batch.size} rows)")
    } finally q.stop()
  }

  test("dedupEvents drops within-watermark duplicate event_ids across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = EventStream.dedupEvents(df)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 00:00:00"), "click"),
        (1L, ts("2024-01-01 00:00:05"), "click"), // dup inside batch
        (2L, ts("2024-01-01 00:01:00"), "view"))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 00:02:00"), "click")) // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted == Seq(1L, 2L), s"expected exactly one row per event_id, got $ids")
    } finally q.stop()
  }

  test("stream-stream interval join matches views to preceding clicks only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    val cdf = clicks.toDF().toDF("event_id", "ts", "user_id")
    val vdf = views.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.clickToView(cdf, vdf)
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      clicks.addData(
        (10L, ts("2024-01-01 00:00:00"), 7L),
        (11L, ts("2024-01-01 03:00:00"), 7L))
      views.addData(
        (20L, ts("2024-01-01 00:10:00"), 7L), // within 30 min of click 10 → match
        (21L, ts("2024-01-01 00:50:00"), 7L), // > 30 min after click 10 → no match
        (22L, ts("2024-01-01 02:59:00"), 7L)) // BEFORE click 11 → no match
      q.processAllAvailable()
      val pairs = spark.table("ssj_out").collect()
        .map(r => (r.getAs[Long]("click_id"), r.getAs[Long]("view_id"))).toSet
      assert(pairs == Set((10L, 20L)), s"unexpected join pairs: $pairs")
    } finally q.stop()
  }

  test("clickToViewOuter: unmatched clicks emit with null view once the watermark closes them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Long)]
    def df(m: MemoryStream[(Long, Timestamp, Long)]) =
      m.toDF().toDF("event_id", "ts", "user_id")
    val q = EventStream.clickToViewOuter(df(clicks), df(views))
      .writeStream.format("memory").queryName("ctv_outer").outputMode("append").start()
    try {
      clicks.addData((10L, ts("2024-01-01 00:00:00"), 7L))   // will match
      clicks.addData((11L, ts("2024-01-01 00:05:00"), 8L))   // never matches — no view for user 8
      views.addData((20L, ts("2024-01-01 00:10:00"), 7L))
      q.processAllAvailable()
      // advance BOTH watermarks far past click 11's close-out point
      clicks.addData((12L, ts("2024-01-01 09:00:00"), 9L))
      views.addData((21L, ts("2024-01-01 09:00:00"), 9L))
      q.processAllAvailable()
      clicks.addData((13L, ts("2024-01-01 12:00:00"), 9L))
      views.addData((22L, ts("2024-01-01 12:00:00"), 9L))
      q.processAllAvailable()
      val rows = spark.table("ctv_outer").collect()
        .map(r => (r.getAs[Long]("click_id"), Option(r.getAs[Any]("view_id")).map(_.asInstanceOf[Long])))
        .toSet
      assert(rows.contains((10L, Some(20L))), s"matched pair missing: $rows")
      assert(rows.contains((11L, None)),
        s"unmatched click must emit with null view after watermark close-out: $rows")
    } finally q.stop()
  }

  test("file source -> parquet sink with checkpoint: restart resumes exactly-once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ckpt").toString
    val (inDir, outDir, ckDir) = (s"$base/in", s"$base/out", s"$base/ck")
    new java.io.File(inDir).mkdirs()

    def addBatch(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("event_id", "event_type").write.mode("overwrite").parquet(s"$inDir/$name")

    def startQuery() = spark.readStream
      .schema("event_id LONG, event_type STRING")
      .option("recursiveFileLookup", "true").parquet(inDir)
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckDir)
      .start()

    addBatch("b1", Seq((1L, "click"), (2L, "view")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // new files land while the query is DOWN; the restarted query must pick
    // up only the unprocessed ones (the checkpoint's file log has b1)
    addBatch("b2", Seq((3L, "click")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir).collect().map(_.getAs[Long]("event_id")).sorted
    assert(out.toSeq == Seq(1L, 2L, 3L), s"expected exactly-once delivery, got ${out.toSeq}")
  }

  test("sessionCounts: restart recovers open-session + watermark state from the checkpoint") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sessck").toString
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()

    def addFile(name: String, rows: Seq[(Timestamp, Long, Double)]): Unit =
      rows.toDF("ts", "user_id", "value").repartition(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")

    def start(outDir: String, ckDir: String) = {
      val events = spark.readStream
        .schema("ts TIMESTAMP, user_id LONG, value DOUBLE")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
      EventStream.sessionCounts(events, gap = "5 minutes")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .start()
    }

    def sessions(outDir: String): Set[(Long, String, String, Long, Double)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("s_start").toString,
          r.getAs[Timestamp]("s_end").toString, r.getAs[Long]("n_events"),
          r.getAs[Double]("sum_value"))).toSet

    // batch 1 opens a session (2 events); the watermark hasn't passed its
    // end, so NOTHING is emitted before the "crash" — the session exists
    // only as checkpointed state
    addFile("b1", Seq((ts("2024-01-01 00:00:00"), 7L, 1.0), (ts("2024-01-01 00:02:00"), 7L, 2.0)))
    val q1 = start(s"$base/outA", s"$base/ckA")
    try q1.processAllAvailable() finally q1.stop()
    assert(!new java.io.File(s"$base/outA").exists() || sessions(s"$base/outA").isEmpty,
      "open session must not emit before the watermark passes it")

    // batch 2 (while down) advances the watermark past the open session's
    // end — the restarted query can only emit the correct (2-event) session
    // if batch 1's session state was recovered from the checkpoint
    addFile("b2", Seq((ts("2024-01-01 01:00:00"), 7L, 5.0)))
    val q2 = start(s"$base/outA", s"$base/ckA")
    try q2.processAllAvailable() finally q2.stop()
    val resumed = sessions(s"$base/outA")
    assert(resumed == Set((7L, "2024-01-01 00:00:00.0", "2024-01-01 00:07:00.0", 2L, 3.0)),
      s"recovered session state must finalize with BOTH pre-crash events: $resumed")

    // interrupted == uninterrupted over the same files and triggers
    val q3 = start(s"$base/outB", s"$base/ckB")
    try q3.processAllAvailable() finally q3.stop()
    assert(sessions(s"$base/outB") == resumed,
      "restart-resumed output must equal the uninterrupted run")
  }

  test("foreachBatch upsert sink: each micro-batch merges into the latest-state table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("fb").toString
    val stateDir = s"$base/state"
    // the production streaming-merge idiom: the sink is a keyed latest-state
    // table, each micro-batch upserts (new keys insert, seen keys replace)
    val mem = MemoryStream[(Long, String, Long)]
    val q = mem.toDF().toDF("user_id", "status", "ver")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val latest = batch.groupBy("user_id")
          .agg(max_by(struct(col("status"), col("ver")), col("ver")).as("s"))
          .select(col("user_id"), col("s.status").as("status"), col("s.ver").as("ver"))
        val merged =
          if (new java.io.File(stateDir).exists()) {
            val prev = batch.sparkSession.read.parquet(stateDir)
            prev.join(latest.select("user_id"), Seq("user_id"), "left_anti")
              .unionByName(latest)
          } else latest
        // persist to a temp dir then swap: reading + overwriting the same
        // parquet path in one job would clobber its own input
        val tmp = s"$base/swap"
        merged.write.mode("overwrite").parquet(tmp)
        val st = batch.sparkSession.read.parquet(tmp)
        st.write.mode("overwrite").parquet(stateDir)
      }
      .start()
    try {
      mem.addData((1L, "new", 1L), (2L, "new", 1L))
      q.processAllAvailable()
      mem.addData((1L, "active", 2L), (3L, "new", 1L))
      q.processAllAvailable()
      val state = spark.read.parquet(stateDir).collect()
        .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("status")).toMap
      assert(state == Map(1L -> "active", 2L -> "new", 3L -> "new"),
        s"merged state wrong: $state")
    } finally q.stop()
  }

  test("stateful sessionize closes a session on gap and keeps the open one in state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[EventStream.Ev]
    val q = EventStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      mem.addData(
        EventStream.Ev(1L, ts("2024-01-01 00:00:00"), 7L, "click"),
        EventStream.Ev(2L, ts("2024-01-01 00:10:00"), 7L, "click"))
      q.processAllAvailable()
      // no closed session yet
      assert(spark.table("sess_out").count() == 0)
      mem.addData(EventStream.Ev(3L, ts("2024-01-01 02:00:00"), 7L, "click"))
      q.processAllAvailable()
      val closed = spark.table("sess_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms")))
      assert(closed.toSeq == Seq((7L, 2L, 600000L)))

      // a far-future event from ANOTHER user advances the watermark past
      // user 7's last+gap: the event-time timeout closes 7's open session
      // and frees its state, even though 7 sent nothing more.
      mem.addData(EventStream.Ev(4L, ts("2024-01-01 10:00:00"), 9L, "click"))
      q.processAllAvailable()
      mem.addData(EventStream.Ev(5L, ts("2024-01-01 10:00:01"), 9L, "click"))
      q.processAllAvailable()
      val afterTimeout = spark.table("sess_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Long]("duration_ms"))).toSet
      assert(afterTimeout.contains((7L, 1L, 0L)), s"timed-out session missing: $afterTimeout")
    } finally q.stop()
  }

  test("enrichWithDim: stream-static left join enriches matched rows, passes unmatched with nulls") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("d_user", "tier")
    val q = EventStream.enrichWithDim(events, dim, "user_id", "d_user")
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      mem.addData((1L, "click"), (2L, "view"), (99L, "click"))
      q.processAllAvailable()
      val rows = spark.table("enrich_out").collect()
        .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[String]("tier")))).toSet
      assert(rows == Set((1L, Some("gold")), (2L, Some("basic")), (99L, None)),
        s"got $rows")
    } finally q.stop()
  }

  test("enrichWithDim: eventKey == dimKey joins unambiguously and keeps the event-side key") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val events = mem.toDF().toDF("user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStream.enrichWithDim(events, dim, "user_id", "user_id")
      .writeStream.format("memory").queryName("enrich_same_key").outputMode("append").start()
    try {
      mem.addData((1L, "click"), (99L, "view"))
      q.processAllAvailable()
      val out = spark.table("enrich_same_key")
      assert(out.columns.count(_ == "user_id") == 1, "event-side key must survive exactly once")
      val rows = out.collect()
        .map(r => (r.getAs[Long]("user_id"), Option(r.getAs[String]("tier")))).toSet
      assert(rows == Set((1L, Some("gold")), (99L, None)), s"got $rows")
    } finally q.stop()
  }
}
