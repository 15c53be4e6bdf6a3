package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}

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

  test("admitByTokenBudget: per-source budgets enforced across micro-batches, state is one counter") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Long)]
    val docs = mem.toDS().map { case (id, src, tok) => DocStream.DocTok(id, src, tok) }
    val q = DocStream.admitByTokenBudget(docs, budgetPerSource = 100L)
      .writeStream.format("memory").queryName("budget_out").outputMode("append").start()
    try {
      mem.addData((1L, "web", 60L), (2L, "web", 30L), (10L, "book", 90L))
      q.processAllAvailable()
      // batch 2: web is at 90/100 → doc 3 still admitted (soft cap), doc 4
      // then rejected; book is at 90/100 → doc 11 admitted crossing the line
      mem.addData((3L, "web", 50L), (4L, "web", 5L), (11L, "book", 40L))
      q.processAllAvailable()
      val rows = spark.table("budget_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("cum_tok"), r.getAs[Boolean]("admitted"))).toMap
      assert(rows(1L) == (60L, true) && rows(2L) == (90L, true), s"batch-1 web: $rows")
      assert(rows(3L) == (140L, true), "doc 3 must be admitted while budget remains (soft cap)")
      assert(rows(4L) == (140L, false), "doc 4 must be rejected once the budget is spent")
      assert(rows(10L) == (90L, true) && rows(11L) == (130L, true),
        s"book source must track its own budget independently: $rows")
    } finally {
      q.stop()
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("admitByTokenBudget: kill + restart recovers counter state from the checkpoint (exactly-once)") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val base = java.nio.file.Files.createTempDirectory("twsck").toString
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()

    def addFile(name: String, rows: Seq[(Long, String, Long)]): Unit =
      rows.toDF("doc_id", "source", "n_tok").repartition(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")

    def start(outDir: String, ckDir: String) = {
      val docs = spark.readStream
        .schema("doc_id LONG, source STRING, n_tok LONG")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1") // identical micro-batching in both runs
        .parquet(inDir)
        .as[DocStream.DocTok]
      DocStream.admitByTokenBudget(docs, budgetPerSource = 100L)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .start()
    }

    def results(outDir: String): Set[(Long, Long, Boolean)] =
      spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cum_tok"),
          r.getAs[Boolean]("admitted"))).toSet

    try {
      // batch 1 spends 90 of web's 100-token budget
      addFile("b1", Seq((1L, "web", 60L), (2L, "web", 30L)))
      val q1 = start(s"$base/outA", s"$base/ckA")
      try q1.processAllAvailable() finally q1.stop() // "crash" after batch 1 committed

      // batch 2 lands while the query is DOWN; the restart must resume with
      // web at 90/100 — doc 3 admitted across the line (soft cap), doc 4
      // rejected ONLY because the pre-crash counter was recovered
      addFile("b2", Seq((3L, "web", 50L), (4L, "web", 5L)))
      val q2 = start(s"$base/outA", s"$base/ckA")
      try q2.processAllAvailable() finally q2.stop()
      val resumed = results(s"$base/outA")

      assert(resumed == Set((1L, 60L, true), (2L, 90L, true), (3L, 140L, true), (4L, 140L, false)),
        s"post-restart admission must continue from recovered state: $resumed")

      // and the interrupted run equals one uninterrupted run over the same
      // files (fresh checkpoint; same per-file triggers)
      val q3 = start(s"$base/outB", s"$base/ckB")
      try q3.processAllAvailable() finally q3.stop()
      assert(results(s"$base/outB") == resumed,
        "restart-resumed output must equal the uninterrupted run")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
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

  test("ingestToLake: overlapping micro-batches and a kill+restart land exactly-once in the lake") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("lakeingest").toString
    val inDir = s"$base/in"
    val lakeDir = s"$base/lake"
    val ck = s"$base/ck"
    new java.io.File(inDir).mkdirs()

    def addFile(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(1).write.mode("overwrite").parquet(s"$inDir/$name")

    def start() = {
      val docs = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1") // one file = one micro-batch
        .parquet(inDir)
        .withColumn("split", lit("train"))
        .withColumn("shard_id", (col("doc_id") % 2).cast("int"))
      DocStream.ingestToLake(docs, lakeDir, ck)
    }

    // run 1: two micro-batches, the second re-shipping half of the first
    addFile("b1", 1 to 10)
    addFile("b2", 6 to 15)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // "crash" after commit

    // run 2 resumes the SAME checkpoint with another overlapping delivery
    addFile("b3", 11 to 20)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val lake = graft.operators.Lake.read(spark, lakeDir)
    val got = lake.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got.length == got.distinct.length,
      s"duplicate doc_ids in the lake after overlap+restart: ${got.sorted}")
    assert(got.toSet == (1L to 20L).toSet,
      s"every delivered doc must land exactly once, got ${got.sorted}")
    // each non-empty micro-batch commit is one manifest version
    assert(graft.operators.Lake.latestManifest(spark, lakeDir).exists(_.version >= 2),
      "per-micro-batch manifest commits expected")
  }

  test("ingestToLake auto-compaction keeps file counts bounded across many micro-batches") {
    val base = java.nio.file.Files.createTempDirectory("lakecompact").toString
    val inDir = s"$base/in"
    val lakeDir = s"$base/lake"
    new java.io.File(inDir).mkdirs()
    import spark.implicits._

    def addFile(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(2) // each batch lands >= 1 file per shard dir
        .write.mode("overwrite").parquet(s"$inDir/$name")

    // 8 disjoint micro-batches: without compaction each adds its own
    // file-set per partition forever (~8+ files per shard dir)
    (0 until 8).foreach(k => addFile(f"b$k%02d", (k * 10 + 1) to (k * 10 + 10)))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withColumn("split", lit("train"))
      .withColumn("shard_id", (col("doc_id") % 2).cast("int"))
    val q = DocStream.ingestToLake(docs, lakeDir, s"$base/ck",
      compactEvery = 2, compactMaxFilesPerPartition = 1,
      compactTargetRowsPerFile = 1000L)
    try q.processAllAvailable() finally q.stop()

    val lake = graft.operators.Lake.read(spark, lakeDir)
    assert(lake.select("doc_id").distinct().count() == 80,
      "compaction must preserve every ingested doc")
    val files = graft.operators.Lake.latestManifest(spark, lakeDir).get.files
    // 2 shard dirs; the last compaction ran at batch 8, so every dir is
    // packed to <= maxFilesPerPartition (=1) + nothing appended after
    assert(files.size <= 4,
      s"auto-compaction must bound the file count (2 shards), got ${files.size}: $files")
    val perDir = files.groupBy(f => f.take(f.lastIndexOf('/')))
    assert(perDir.values.forall(_.size <= 2),
      s"no shard dir may accumulate per-batch file-sets: ${perDir.view.mapValues(_.size).toMap}")
  }

  test("auto-compaction is CDC-safe: changesBetween across the stream's compactions yields exactly the ingested docs") {
    val base = java.nio.file.Files.createTempDirectory("lakecdc").toString
    val inDir = s"$base/in"
    val lakeDir = s"$base/lake"
    new java.io.File(inDir).mkdirs()
    import spark.implicits._

    def addFile(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
        .repartition(1) // one file = one micro-batch = one append commit
        .write.mode("overwrite").parquet(s"$inDir/$name")

    // 6 micro-batches with compactEvery = 2: the version range a nightly
    // consumer reads SPANS multiple maintenance passes. The default
    // compactRetainHistory = true keeps each rewritten pre-image on disk,
    // so the exact incremental read must succeed — and must surface
    // exactly the appended docs, never the recompacted corpus.
    (0 until 6).foreach(k => addFile(f"b$k%02d", (k * 10 + 1) to (k * 10 + 10)))
    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("recursiveFileLookup", "true")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir)
      .withColumn("split", lit("train"))
      .withColumn("shard_id", (col("doc_id") % 2).cast("int"))
    val q = DocStream.ingestToLake(docs, lakeDir, s"$base/ck",
      compactEvery = 2, compactMaxFilesPerPartition = 1,
      compactTargetRowsPerFile = 1000L)
    try q.processAllAvailable() finally q.stop()

    val latest = graft.operators.Lake.latestManifest(spark, lakeDir).get.version
    assert(latest >= 8, s"6 appends + 3 compactions expected, got version $latest")
    val changed = graft.operators.Lake.changesBetween(spark, lakeDir, 1L, latest)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(changed.length == changed.distinct.length,
      s"CDC across compactions double-processed rows: ${changed.sorted.take(30)}")
    // from v1 (the first batch's commit) onward: everything after batch 1
    assert(changed.toSet == (11L to 60L).toSet,
      s"CDC must surface exactly batches 2..6, got ${changed.sorted}")
    // the retained pre-images are reclaimable once consumers drain
    val dead = graft.operators.Lake.vacuumKeeping(spark, lakeDir, 1)
    assert(dead.nonEmpty, "retention vacuum must reclaim the drained compaction pre-images")
  }
}
