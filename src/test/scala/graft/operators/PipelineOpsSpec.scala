package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Planted-data semantics for the training-data pipeline ops added in
  * round 3: Gopher repetition metrics, n-gram decontamination, and
  * exact-substring chunk dedup. */
class PipelineOpsSpec extends SparkTestBase {

  import spark.implicits._

  test("repetitionMetrics: a degenerate repeated doc is dropped, a diverse doc kept") {
    val docs = Seq(
      (1L, "a b a b a b"),                       // top2: "a b"x3 → 2*3/6 = 1.0
      (2L, "one two three four five six seven eight nine ten eleven twelve"), // all grams unique
      (3L, "x")                                  // wc=1: no grams at all
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Double]("top2_frac") == 1.0)
    // 3-grams of doc1: "a b a","b a b","a b a","b a b" — every instance duplicated
    assert(got(0).getAs[Double]("dup3_frac") == 1.0)
    assert(got(0).getAs[Int]("keep") == 0)
    assert(got(1).getAs[Double]("top2_frac") == 2.0 / 12)
    assert(got(1).getAs[Double]("dup3_frac") == 0.0)
    assert(got(1).getAs[Int]("keep") == 1)
    assert(got(2).getAs[Double]("top2_frac") == 0.0 && got(2).getAs[Int]("keep") == 1)
  }

  test("decontaminate: only docs sharing an 8-gram with the benchmark are flagged") {
    val shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq(
      (0L, s"eval doc $shared tail"),             // benchmark (pred: id % 2 == 0 → 0 only even... use explicit)
      (1L, s"train doc with $shared inside here"), // contaminated
      (3L, "completely different content that has no overlap at all with anything")
    ).toDF("doc_id", "text")
    val got = TextOps.decontaminate(docs, "doc_id", "text",
        benchPred = col("doc_id") === 0L)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L), "benchmark docs excluded from output")
    assert(got(0).getAs[Int]("contaminated") == 1 && got(0).getAs[Long]("n_shared") >= 1L)
    assert(got(1).getAs[Int]("contaminated") == 0 && got(1).getAs[Long]("n_shared") == 0L)
  }

  test("decontaminate: short docs (< n words) flow through uncontaminated") {
    val docs = Seq((0L, "a b c d e f g h"), (1L, "tiny")).toDF("doc_id", "text")
    val got = TextOps.decontaminate(docs, "doc_id", "text", benchPred = col("doc_id") === 0L)
      .collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L && got(0).getAs[Int]("contaminated") == 0)
  }

  test("chunkDupFraction: shared boilerplate chunk is counted, unique tails are not") {
    // chunkWords=2 → doc chunks: (a b)(c d) / (a b)(e f) / (g h)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "g h")
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDupFraction(docs, "doc_id", "text", chunkWords = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_chunks") == 2 && got(0).getAs[Long]("n_dup_chunks") == 1)
    assert(got(0).getAs[Double]("dup_chunk_frac") == 0.5)
    assert(got(1).getAs[Double]("dup_chunk_frac") == 0.5)
    assert(got(2).getAs[Long]("n_dup_chunks") == 0 && got(2).getAs[Double]("dup_chunk_frac") == 0.0)
  }

  test("chunkDupFraction: within-doc repetition alone counts as duplication") {
    val docs = Seq((1L, "p q p q")).toDF("doc_id", "text") // chunks (p q)(p q)
    val got = Dedup.chunkDupFraction(docs, "doc_id", "text", chunkWords = 2).collect()
    assert(got(0).getAs[Long]("n_chunks") == 2 && got(0).getAs[Double]("dup_chunk_frac") == 1.0)
  }

  test("quantizeEmbeddings: int8 codes reconstruct within half a quantization step") {
    val docs = Seq(
      (1L, Seq(0.5f, -0.25f, 0.125f)),
      (2L, Seq(-2.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 0.0f)) // all-zero: dropped
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeEmbeddings(docs, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(got.length == 2, "all-zero vectors must be dropped")
    assert(got(0).getAs[Double]("scale") == 0.5)
    assert(got(0).getAs[scala.collection.Seq[Int]]("q").toSeq == Seq(127, -63, 32)) // floor(±x*127/0.5 + .5)
    got.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val q = r.getAs[scala.collection.Seq[Int]]("q")
      val orig = docs.filter(col("vec_id") === r.getLong(0))
        .collect()(0).getAs[scala.collection.Seq[Float]]("embedding")
      q.zip(orig).foreach { case (code, x) =>
        assert(math.abs(code * scale / 127.0 - x) <= scale / 127.0 / 2 + 1e-9,
          s"vec ${r.getLong(0)}: code $code reconstructs outside half a step of $x")
      }
    }
  }

  test("tfidfTopTerms: a corpus-rare term outranks a ubiquitous one") {
    val docs = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common third")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .filter(col("doc_id") === 1L).orderBy("rn").collect()
    // doc1: rare tf=1 df=1 → 1*3/1 = 3.0; common tf=2 df=3 → 2*3/3 = 2.0
    assert(got(0).getAs[String]("word") == "rare" && got(0).getAs[Double]("score") == 3.0)
    assert(got(1).getAs[String]("word") == "common" && got(1).getAs[Double]("score") == 2.0)
  }

  test("deleteFromLake is surgical: tombstoned docs vanish, unaffected shard files stay byte-identical") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("px101").toString + "/lake"
    val docs = graft.Tables(spark, sf, "documents")
    Pipeline.hashSplit(docs, "doc_id")
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
      .write.mode("overwrite").partitionBy("split", "shard_id").parquet(out)

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()
    val tomb = docs.filter(col("doc_id") % 131 === 0).select("doc_id")
    val tombIds = tomb.collect().map(_.getLong(0)).toSet
    assert(tombIds.nonEmpty, "fixture must tombstone at least one doc")
    // partitions the tombstones live in (the ONLY ones allowed to change)
    val affected = spark.read.parquet(out)
      .filter(col("doc_id").isin(tombIds.toSeq: _*))
      .select("split", "shard_id").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet

    val after = Pipeline.deleteFromLake(spark, out, tomb, "doc_id")
    val ids = after.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((ids intersect tombIds).isEmpty, "tombstoned docs survived the delete")
    assert(ids.size == docs.count() - tombIds.size, "non-tombstoned docs must all survive")

    val untouched = fileState().filter { case (path, st) =>
      before.get(path).contains(st) // same size AND mtime
    }
    // every file of every unaffected partition must be byte-identical
    val unaffectedBefore = before.keys.filterNot(p =>
      affected.exists { case (s, sh) => p.contains(s"split=$s/shard_id=$sh/") })
    unaffectedBefore.foreach { p =>
      assert(untouched.contains(p),
        s"unaffected shard file was rewritten (delete not surgical): $p")
    }
    assert(affected.nonEmpty, "fixture should touch at least one partition")
  }

  test("compactLake: fragmented shards collapse to one file; a second pass is a byte-identical no-op") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("px102").toString + "/lake"
    val docs = graft.Tables(spark, sf, "documents")
    Pipeline.hashSplit(docs, "doc_id")
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
      .repartition(8)
      .write.mode("overwrite").partitionBy("split", "shard_id").parquet(out)

    def filesByDir(): Map[String, Seq[(String, Long, Long)]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getParent, f.getPath, f.length(), f.lastModified()))
        .groupMap(_._1)(t => (t._2, t._3, t._4))
    }
    assert(filesByDir().values.exists(_.size > 1), "fixture must fragment at least one shard")
    val n0 = docs.count()

    val compacted = Pipeline.compactLake(spark, out)
    assert(compacted.count() == n0, "compaction must preserve every row")
    val once = filesByDir()
    once.foreach { case (d, fs) =>
      assert(fs.size == 1, s"partition $d still has ${fs.size} files after compaction")
    }

    // all partitions are now compact: the second pass must touch nothing
    Pipeline.compactLake(spark, out)
    assert(filesByDir() == once, "re-compacting a compact lake must be a no-op")
  }

  test("appendToLake: replayed docs are skipped, pre-existing files stay byte-identical, replay is idempotent") {
    import org.apache.spark.sql.functions._
    val out = java.nio.file.Files.createTempDirectory("px103").toString + "/lake"
    val docs = graft.Tables(spark, sf, "documents")
    val sharded = Pipeline.hashSplit(docs, "doc_id")
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
    sharded.filter(col("doc_id") % 3 =!= 0)
      .write.mode("overwrite").partitionBy("split", "shard_id").parquet(out)

    def fileState(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = fileState()

    val appended = Pipeline.appendToLake(spark, out, sharded)
    val ids = appended.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.length == ids.distinct.length, "replayed overlap must not double-ingest")
    assert(ids.length == docs.count(), "new docs must all land")
    val after = fileState()
    before.foreach { case (p, st) =>
      assert(after.get(p).contains(st), s"append rewrote a pre-existing file: $p")
    }

    // replaying the SAME batch again adds nothing and touches nothing
    Pipeline.appendToLake(spark, out, sharded)
    assert(fileState() == after, "idempotent replay must be a byte-identical no-op")
  }

  test("approxProfile matches the exact profile on everything but n_distinct, which lands within HLL++ error — and skips the expand") {
    val docs = graft.Tables(spark, sf, "documents")
    val cols = Seq("doc_id", "lang", "source", "n_chars")
    val exact = Pipeline.profileTable(docs, cols).orderBy("column").collect()
    val approx = Pipeline.approxProfile(docs, cols).orderBy("column").collect()
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.getAs[String]("column") == a.getAs[String]("column"))
      assert(e.getAs[Long]("n_rows") == a.getAs[Long]("n_rows"))
      assert(e.getAs[Long]("n_null") == a.getAs[Long]("n_null"))
      assert(e.getAs[String]("min_s") == a.getAs[String]("min_s"))
      assert(e.getAs[String]("max_s") == a.getAs[String]("max_s"))
      val ed = e.getAs[Long]("n_distinct").toDouble
      val ad = a.getAs[Long]("n_distinct").toDouble
      // rsd=0.05 → 5σ plus small-cardinality absolute slack
      assert(math.abs(ad - ed) <= math.max(5.0, 0.25 * ed),
        s"${e.getAs[String]("column")}: approx $ad vs exact $ed out of tolerance")
    }
    // the exact multi-distinct pays the expand (n_cols× rows through one
    // exchange); the sketch variant must push each row through ONCE
    val pe = Pipeline.profileTable(docs, cols).queryExecution.executedPlan.toString
    val pa = Pipeline.approxProfile(docs, cols).queryExecution.executedPlan.toString
    assert(pe.contains("Expand"), "exact profile is expected to plan via expand")
    assert(!pa.contains("Expand"), "approx profile must not expand:\n" + pa.take(1200))
  }

  test("px90: packed output excludes the benchmark slice and has contiguous offsets") {
    val rows = graft.SparkEntry.queries("px90_training_pipeline")(spark, sf)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 97 != 0), "benchmark docs must not be packed")
    // offsets are the exclusive prefix sum of n_tokens in doc_id order
    var expect = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("off") == expect,
        s"doc ${r.getLong(0)}: off=${r.getAs[Long]("off")} expected $expect")
      expect += r.getAs[Long]("n_tokens")
    }
  }
}
