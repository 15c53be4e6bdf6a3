package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Planted-data semantics for the round-4 operators: semantic dedup,
  * domain mixing, PII redaction, triangle counting, bucketed interval
  * join, and native session windows.
  */
class Round4OpsSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------ dd33
  test("semanticDedup: per-cluster near-dups drop, lowest id is the keeper") {
    // Two orthogonal centroid directions → two clusters, one near-dup in each.
    val embs = Seq(
      (10L, Array(1.0f, 0.0f)), // cluster A canonical → kept
      (11L, Array(0.99f, 0.01f)), // cos(10,11) ≈ 0.99995 → removed
      (20L, Array(0.0f, 1.0f)), // cluster B canonical → kept
      (21L, Array(0.02f, 0.98f)) // cos(20,21) ≈ 0.99979 → removed
    ).toDF("vec_id", "embedding")
    val cents = Seq((10L, Array(1.0f, 0.0f), 1.0), (20L, Array(0.0f, 1.0f), 1.0))
      .toDF("cid", "cv", "cnrm")
    val got = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.9)
      .orderBy("vec_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq ==
      Seq((10L, 10L, 1), (11L, 10L, 0), (20L, 20L, 1), (21L, 20L, 0)))
  }

  test("semanticDedup: removal is greedy lowest-id-wins and cluster-scoped") {
    val embs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)), // dup of 1, same cluster → removed
      (3L, Array(0.0f, 1.0f)), // other cluster: survives though identical to 4
      (4L, Array(0.0f, 1.0f)) // dup of 3 in its cluster → removed
    ).toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0f, 0.0f), 1.0), (3L, Array(0.0f, 1.0f), 1.0))
      .toDF("cid", "cv", "cnrm")
    val kept = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.99)
      .filter(col("kept") === 1).select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("semanticDedup: centroid tie breaks to the smaller cid") {
    // equidistant from both centroids → assigned to cid 1, not 2
    val embs = Seq((9L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0f, 0.0f), 1.0), (2L, Array(0.0f, 1.0f), 1.0))
      .toDF("cid", "cv", "cnrm")
    val got = Dedup.semanticDedup(embs, "vec_id", "embedding", cents, threshold = 0.9)
      .collect()
    assert(got.head.getLong(1) == 1L)
  }

  // ------------------------------------------------------------ px91
  test("mixSample: thresholds are nested — raising a rate only adds rows") {
    val docs = (0L until 2000L).map(i => (i, "en")).toDF("doc_id", "lang")
    def ids(rate: Double) =
      Pipeline.mixSample(docs, "doc_id", "lang", Map("en" -> rate))
        .select("doc_id").as[Long].collect().toSet
    val at30 = ids(0.3); val at60 = ids(0.6); val at100 = ids(1.0)
    assert(at30.subsetOf(at60) && at60.subsetOf(at100))
    assert(at100.size == 2000)
    // achieved rates concentrate around targets (md5 is uniform)
    assert(math.abs(at30.size / 2000.0 - 0.3) < 0.05)
    assert(math.abs(at60.size / 2000.0 - 0.6) < 0.05)
  }

  test("mixSample: strata absent from the rate map are dropped") {
    val docs = Seq((1L, "en"), (2L, "xx")).toDF("doc_id", "lang")
    val got = Pipeline.mixSample(docs, "doc_id", "lang", Map("en" -> 1.0))
      .select("doc_id").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  // ------------------------------------------------------------ dd34
  test("incrementalDedup: corpus hits, within-batch dups, and fresh docs classified") {
    val corpus = Seq((100L, "Seen Before!"), (101L, "old news"))
      .toDF("doc_id", "text")
    val inc = Seq(
      (1L, "seen before"), // normalized-equal to corpus 100 → dropped
      (2L, "fresh one"), // new → kept
      (3L, "fresh one "), // normalized-dup of 2 within batch → dropped
      (4L, "another fresh") // new → kept
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, inc, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, 1, 0, 0), (2L, 0, 0, 1), (3L, 0, 1, 0), (4L, 0, 0, 1)))
  }

  // ------------------------------------------------------------ px93
  test("mixUpsample: integer rates repeat exactly; fractional part is a nested subset") {
    val docs = (0L until 1000L).map(i => (i, "de")).toDF("doc_id", "lang")
    val at2 = Pipeline.mixUpsample(docs, "doc_id", "lang", Map("de" -> 2.0))
    assert(at2.count() == 2000)
    assert(at2.groupBy("doc_id").count().filter(col("count") =!= 2).count() == 0)
    // 2.5: every doc twice, about half a third time — and the extra-copy
    // docs are exactly the docs mixSample keeps at rate 0.5
    val at25 = Pipeline.mixUpsample(docs, "doc_id", "lang", Map("de" -> 2.5))
    val extra = at25.filter(col("copy") === 3).select("doc_id").as[Long].collect().toSet
    val sampled = Pipeline.mixSample(docs, "doc_id", "lang", Map("de" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(extra == sampled)
    // rate < 1 degenerates to mixSample (single copy of the sampled subset)
    val down = Pipeline.mixUpsample(docs, "doc_id", "lang", Map("de" -> 0.5))
    assert(down.select("doc_id").as[Long].collect().toSet == sampled)
    assert(down.filter(col("copy") =!= 1).count() == 0)
  }

  // ------------------------------------------------------------ q89
  test("zorderValue: interleaves bits and preserves locality rectangles") {
    val df = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (65535, 65535))
      .toDF("x", "y")
      .withColumn("z", graft.api.Ops.zorderValue(col("x"), col("y")))
    val got = df.select("x", "y", "z").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got((0, 0)) == 0L)
    assert(got((1, 0)) == 1L)
    assert(got((0, 1)) == 2L)
    assert(got((1, 1)) == 3L)
    // x=2 (bit1→bit2), y=3 (bit0→bit1, bit1→bit3) → 0b1110 = 14
    assert(got((2, 3)) == 14L)
    assert(got((65535, 65535)) == (1L << 32) - 1)
  }

  // ------------------------------------------------------------ px92
  test("qualityCut: keeps the top fraction per stratum, deterministically on ties") {
    val scored = Seq(
      (1L, "en", 0.9), (2L, "en", 0.5), (3L, "en", 0.5), (4L, "en", 0.1),
      (5L, "de", 0.7), (6L, "de", 0.3)
    ).toDF("doc_id", "lang", "quality")
    // en: ranks by (quality desc, id) → 1,2,3,4 → pr 0, 1/3, 2/3, 1;
    // keepFrac 0.7 keeps 1,2,3. de: pr 0, 1 → keeps 5.
    val kept = Pipeline.qualityCut(scored, "doc_id", "lang", "quality", 0.7)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("qualityCutApprox agrees with the exact cut on a well-spread stratum") {
    val scored = (1L to 1000L).map(i => (i, "en", i / 1000.0)).toDF("doc_id", "lang", "quality")
    val exact = Pipeline.qualityCut(scored, "doc_id", "lang", "quality", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val approx = Pipeline.qualityCutApprox(scored, "doc_id", "lang", "quality", 0.2)
      .select("doc_id").as[Long].collect().toSet
    // sketch accuracy 1/10000 ≫ 1000 rows → the cut point is exact here
    assert((exact diff approx).size + (approx diff exact).size <= 2,
      s"exact=${exact.size} approx=${approx.size}")
  }

  // ------------------------------------------------------------ tx42
  test("redactPii: emails first, then digit runs; counts match the masks") {
    val docs = Seq(
      (1L, "mail me at john.doe99@corp.example.com or acct 12345678"),
      (2L, "short digits 12345 stay, 123456 is masked"),
      (3L, "nothing to redact here")
    ).toDF("id", "text")
    val got = TextOps.redactPii(docs, "id", "text").orderBy("id").collect()
    assert(got(0).getString(1) == "mail me at <EMAIL> or acct <NUM>")
    assert(got(0).getInt(2) == 1 && got(0).getInt(3) == 1)
    assert(got(1).getString(1) == "short digits 12345 stay, <NUM> is masked")
    assert(got(1).getInt(2) == 0 && got(1).getInt(3) == 1)
    assert(got(2).getString(1) == "nothing to redact here")
    assert(got(2).getInt(2) == 0 && got(2).getInt(3) == 0)
  }

  // ------------------------------------------------------------ gr79
  test("triangleCounts: K4 has four triangles, three per node") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.triangleCounts(edges, "u", "v")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangleCounts: duplicate/reversed edges and a dangling path don't inflate") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), // one triangle, noisy encoding
      (3L, 4L), (4L, 5L) // path — no triangle
    ).toDF("u", "v")
    val got = Graph.triangleCounts(edges, "u", "v")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  // ------------------------------------------------------------ q88
  test("intervalJoin: [start, end) boundaries and bucket-spanning intervals") {
    val ts = (s: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 00:${s / 60}%02d:${s % 60}%02d")
    val points = Seq((1L, ts(0)), (2L, ts(599)), (3L, ts(600)), (4L, ts(1200)))
      .toDF("pid", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    // interval [0, 600s) with bucket 600s → start boundary in, end boundary out
    val iv = Seq((100L, ts(0), ts(600))).toDF("iid", "t0", "t1")
      .withColumn("t0", col("t0").cast("timestamp_ntz"))
      .withColumn("t1", col("t1").cast("timestamp_ntz"))
    val got = graft.api.Ops.intervalJoin(points, iv, "ts", "t0", "t1")
      .select("pid").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L))
    // a 25-minute interval spans 3+ buckets of 600 s; no duplicates emitted
    val iv2 = Seq((200L, ts(0), ts(1500))).toDF("iid", "t0", "t1")
      .withColumn("t0", col("t0").cast("timestamp_ntz"))
      .withColumn("t1", col("t1").cast("timestamp_ntz"))
    val got2 = graft.api.Ops.intervalJoin(points, iv2, "ts", "t0", "t1")
      .select("pid").as[Long].collect().sorted
    assert(got2.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("intervalJoin: empty intervals (end <= start) match nothing") {
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val points = Seq((1L, t)).toDF("pid", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val iv = Seq((100L, t, t)).toDF("iid", "t0", "t1")
      .withColumn("t0", col("t0").cast("timestamp_ntz"))
      .withColumn("t1", col("t1").cast("timestamp_ntz"))
    assert(graft.api.Ops.intervalJoin(points, iv, "ts", "t0", "t1").count() == 0)
  }

  // ------------------------------------------------------------ q87
  test("session_window gap boundary matches the oracle: only > gap starts a new session") {
    // An event exactly 5 minutes after the last one MERGES (Spark treats
    // the window end t+gap as joinable with a window starting at t+gap);
    // one microsecond past it starts a new session. The q87 oracle encodes
    // exactly this (strict > on the gap).
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:05:00") // == gap → merges
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00.000001") // > gap → new
    val ev = Seq((7L, t0, 1.0), (7L, t1, 1.0), (7L, t2, 1.0)).toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val sessions = ev.groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n")).orderBy(col("w.start"))
      .select("n").as[Long].collect()
    assert(sessions.toSeq == Seq(2L, 1L))
  }

  // ------------------------------------------------------------ dd35
  test("editDistanceDupPairs matches brute-force levenshtein on the sf0.001 corpus") {
    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text")
    val got = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 10)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val a = docs.select(col("doc_id").as("a_id"), col("text").as("ta"))
    val b = docs.select(col("doc_id").as("b_id"), col("text").as("tb"))
    val want = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), levenshtein(col("ta"), col("tb")).as("dist"))
      .filter(col("dist") <= 10).orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(want.nonEmpty, "expected planted near-dups at sf0.001")
    assert(got == want)
  }

  test("editDistanceDupPairs: pairs straddling a length-bucket boundary are found") {
    // lengths 21 and 22 fall in different floor(len/11) buckets (1 vs 2);
    // the adjacent-bucket probe must still pair them. Identical strings in
    // the same bucket and a far string exercise the other branches.
    val s21 = "a" * 21
    val s22 = "a" * 22
    val far = "z" * 200
    val docs = Seq((1L, s21), (2L, s22), (3L, s21), (4L, far)).toDF("doc_id", "text")
    val got = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 10)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 1), (1L, 3L, 0), (2L, 3L, 1)))
  }

  test("editDistanceDupPairs: count filter never prunes a true pair (d edits, d <= maxDist)") {
    // Apply exactly d random-ish edits; the pair must always survive.
    val base = "the quick brown fox jumps over the lazy dog and keeps running"
    val edited = base.updated(4, 'x').updated(10, 'y').patch(20, "", 2).patch(30, "qq", 0)
    // 2 substitutions + 2-char delete + 2-char insert = at most 6 edits
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val got = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)))
  }
}
