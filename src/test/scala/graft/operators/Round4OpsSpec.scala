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

  // ------------------------------------------------------------ tx43
  test("boilerplateFraction: corpus-frequent n-grams flag, unique ones don't") {
    // Docs 1 and 2 share the 5-gram "a b c d e" (DF=2 → boilerplate);
    // every other gram is unique. Doc 3 is too short to have any 5-gram.
    val docs = Seq(
      (1L, "a b c d e p q r s"), // 5 grams, 1 boilerplate
      (2L, "x a b c d e y z w"), // 5 grams, 1 boilerplate
      (3L, "too short here")     // 0 grams
    ).toDF("doc_id", "text")
    val got = TextOps.boilerplateFraction(docs, "doc_id", "text", n = 5, minDf = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 0.2),
      (2L, 5L, 1L, 0.2),
      (3L, 0L, 0L, 0.0)))
  }

  test("boilerplateFraction: repeated gram within ONE doc does not make it boilerplate") {
    // "m n o p q" occurs twice inside doc 1 but in no other doc: per-doc
    // distinct grams mean DF=1, so it must NOT count as boilerplate.
    val docs = Seq(
      (1L, "m n o p q m n o p q"),
      (2L, "entirely different words go right here now")
    ).toDF("doc_id", "text")
    val got = TextOps.boilerplateFraction(docs, "doc_id", "text", n = 5, minDf = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got.forall(_._2 == 0L), s"no gram crosses documents, got $got")
  }

  // ------------------------------------------------------------ tx44
  test("chunkTokenWindows: overlap, tail clipping, and full coverage") {
    val words = (1 to 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, words), (2L, "just three words")).toDF("doc_id", "text")
    val got = TextOps.chunkTokenWindows(docs, "doc_id", "text", size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    // doc 1: 50 words → ceil(50/24)=3 chunks at 0/24/48, sizes 32/26/2
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 32), (1, 24, 26), (2, 48, 2)))
    assert(d1(0)._5.startsWith("w1 w2 ") && d1(0)._5.endsWith(" w32"))
    assert(d1(1)._5.startsWith("w25 ") && d1(1)._5.endsWith(" w50"))
    assert(d1(2)._5 == "w49 w50")
    // overlap: chunk 0 and 1 share words w25..w32
    assert(d1(0)._5.split(' ').toSet.intersect(d1(1)._5.split(' ').toSet).size == 8)
    // doc 2: shorter than one window → a single whole-doc chunk
    assert(got.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, 3, "just three words")))
  }

  // ------------------------------------------------------------ tx44 (property)
  test("chunkTokenWindows: stride-aligned reconstruction returns the original tokens") {
    // taking the first `stride` tokens of every chunk (all of the last)
    // must reassemble each document exactly — no token lost or duplicated
    val docs = Seq(
      (1L, (1 to 53).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 24).map(i => s"u$i").mkString(" ")), // exactly one stride
      (3L, "a"),
      (4L, (1 to 48).map(i => s"v$i").mkString(" ")) // exact multiple of stride
    ).toDF("doc_id", "text")
    val chunks = TextOps.chunkTokenWindows(docs, "doc_id", "text", size = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    val rebuilt = chunks.groupBy(_._1).map { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      val toks = sorted.zipWithIndex.flatMap { case ((_, _, chunk), i) =>
        val ws = chunk.split(' ')
        if (i == sorted.length - 1) ws else ws.take(24)
      }
      id -> toks.mkString(" ")
    }
    val want = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rebuilt == want)
  }

  // ------------------------------------------------------------ px94
  test("withGlobalRowNumber is partition-count invariant") {
    val df = spark.range(0, 500).toDF("id")
      .withColumn("v", (col("id") * 2654435761L) % 97)
    def rn(p: Int) = graft.api.Ops
      .withGlobalRowNumber(df, Seq(col("v"), col("id")), "rn", partitions = p)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val r1 = rn(1)
    assert(rn(7) == r1 && rn(64) == r1,
      "global numbering must not depend on the physical partition count")
  }

  test("withGlobalRowNumber matches a single global window") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", (col("id") * 2654435761L) % 1000) // shuffled values, with ties
    val got = graft.api.Ops.withGlobalRowNumber(df, Seq(col("v").desc, col("id")), "rn")
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w).cast("long") - 1)
      .select("id", "rn").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("shardByTokenBudget: serpentine deal balances token totals") {
    val docs = spark.range(0, 200).toDF("doc_id")
      .withColumn("n_tokens", ((col("doc_id") * 48271L) % 90 + 10).cast("long"))
    val got = Pipeline.shardByTokenBudget(docs, "doc_id", "n_tokens", nShards = 8)
    val totals = got.groupBy("shard_id").agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(totals.length == 8 && totals.map(_._3).sum == 200)
    // serpentine on a descending sort keeps shards within a few percent
    val (mx, mn) = (totals.map(_._2).max, totals.map(_._2).min)
    assert(mx - mn <= mx / 10, s"imbalanced: $mx vs $mn")
    // rank pass 0 deals 0..7 in order, pass 1 reverses
    val byRank = got.orderBy("rnk").select("shard_id").collect().map(_.getInt(0))
    assert(byRank.take(16).toSeq == ((0 to 7) ++ (7 to 0 by -1)).toSeq)
  }

  // ------------------------------------------------------------ observe
  test("Dataset.observe: pipeline metrics ride the job, no second pass over the data") {
    // the production monitoring surface: a cleaning job reports rows-in /
    // rows-kept / token totals from the SAME pass that writes the output,
    // instead of re-scanning the corpus for a metrics query
    val obs = new org.apache.spark.sql.Observation("clean")
    val docs = graft.Tables(spark, sf, "documents")
    val kept = docs
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(org.apache.spark.sql.functions.size(TextOps.toks("text")).cast("long")).as("tokens_in"))
      .filter(length(col("text")) > 100)
    val nKept = kept.count()
    val m = obs.get
    assert(m("rows_in").asInstanceOf[Long] == docs.count())
    assert(m("tokens_in").asInstanceOf[Long] > 0)
    assert(nKept < m("rows_in").asInstanceOf[Long], "filter must drop something at sf0.001")
  }

  // ------------------------------------------------------------ gr80
  test("coOccurrenceEdges: pair weights count shared baskets, duplicates collapse") {
    val items = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"),
      (2L, "b"), // duplicate line in the same basket must not double-count
      (3L, "a"), (3L, "b"),
      (4L, "c")
    ).toDF("basket", "item")
    val got = Graph.coOccurrenceEdges(items, "basket", "item", minWeight = 1L)
      .orderBy("p1", "p2").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)))
    val thresholded = Graph.coOccurrenceEdges(items, "basket", "item", minWeight = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(thresholded == Seq(("a", "b", 3L)))
  }

  test("coOccurrenceEdges: maxItemsPerBasket bounds a mega-basket's pair fan-out deterministically") {
    // one 100-item mega-basket (the deg² skew hazard) next to a small one
    val items = ((1 to 100).map(i => (1L, f"item$i%03d")) ++
      Seq((2L, "item001"), (2L, "item002"))).toDF("basket", "item")
    val capped = Graph.coOccurrenceEdges(items, "basket", "item",
      minWeight = 1L, maxItemsPerBasket = Some(10))
    // basket 1 contributes at most C(10,2)=45 pairs instead of C(100,2)=4950;
    // basket 2 is under the cap and keeps its exact pair
    val n = capped.count()
    assert(n <= 46, s"cap leaked: $n pairs")
    assert(capped.filter(col("p1") === "item001" && col("p2") === "item002").count() == 1,
      "sub-cap basket must keep exact semantics")
    // hash top-k keys on stable item identity: the kept set is a pure
    // function of the data, not of partitioning or run order
    val again = Graph.coOccurrenceEdges(items, "basket", "item",
      minWeight = 1L, maxItemsPerBasket = Some(10))
    assert(capped.orderBy("p1", "p2").collect().toSeq ==
      again.orderBy("p1", "p2").collect().toSeq, "capped sample must be deterministic")
    // capped pairs are a subset of the exact projection
    val exact = Graph.coOccurrenceEdges(items, "basket", "item", minWeight = 1L)
      .select("p1", "p2")
    assert(capped.select("p1", "p2").join(exact, Seq("p1", "p2"), "left_anti").count() == 0)
    // a cap above the natural fan-out changes nothing
    val wide = Graph.coOccurrenceEdges(items, "basket", "item",
      minWeight = 1L, maxItemsPerBasket = Some(1000))
    assert(wide.count() == exact.count())
    intercept[IllegalArgumentException] {
      Graph.coOccurrenceEdges(items, "basket", "item", maxItemsPerBasket = Some(1))
    }
  }

  // ------------------------------------------------------------ q91
  test("UTF8_LCASE grouping merges case variants; binary re-collation keeps them apart") {
    val df = Seq("ALPHA", "alpha", "Alpha", "BETA", "beta").toDF("s")
    val ci = df.groupBy(collate(col("s"), "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n"),
        countDistinct(collate(col("s"), "UTF8_BINARY")).as("forms"))
      .select(lower(collate(col("k"), "UTF8_BINARY")).as("k"), col("n"), col("forms"))
      .orderBy("k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ci == Seq(("alpha", 3L, 3L), ("beta", 2L, 2L)))
  }

  test("editDistanceDupPairs: short x long pairs across the prefix-bound floor are found") {
    // len 30 → 28 grams (<= d·q = 30: short set); len 36 → 34 grams (long,
    // prefix path). The pair is at distance 6 and must surface via the
    // prefix join against the short doc's whole bag.
    val docs = Seq((1L, "x" * 30), (2L, "x" * 36), (3L, "y" * 30)).toDF("doc_id", "text")
    val got = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 10)
      .orderBy("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, 2L, 6)))
  }

  test("editDistanceDupPairs: blockCol restricts pairs to equal blocks") {
    val docs = Seq(
      (1L, "s1", "aaaa aaaa aaaa aaaa"),
      (2L, "s1", "aaaa aaaa aaaa aaab"),
      (3L, "s2", "aaaa aaaa aaaa aaac") // near-dup of 1/2 but other block
    ).toDF("doc_id", "source", "text")
    val blocked = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text",
        maxDist = 5, blockCol = Some("source"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(blocked == Seq((1L, 2L)))
    val open = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(open == Set((1L, 2L), (1L, 3L), (2L, 3L)))
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

  // ------------------------------------------------------------ px97
  test("apportionTokenBudget: budgets sum to B exactly and stay within 1 of the real share") {
    val docs = Seq(
      (1L, "web", "a b c d e f g"), // 7 tokens
      (2L, "web", "h i j"), // 3 → web 10
      (3L, "book", "k l m n o"), // book 5
      (4L, "code", "p q") // code 2 → total 17
    ).toDF("doc_id", "source", "text")
    val b = 1000L
    val byStratum = Pipeline.apportionTokenBudget(docs, "source", "text", b)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(byStratum.map(_._3).sum == b)
    byStratum.foreach { case (_, avail, budget) =>
      val exact = b.toDouble * avail / 17.0
      assert(math.abs(budget - exact) < 1.0, s"budget $budget vs exact share $exact")
    }
    // 10/17·1000 = 588.23…, 5/17·1000 = 294.11…, 2/17·1000 = 117.64…
    // floors 588+294+117 = 999; the 1 leftover goes to the largest
    // remainder (code, .64) → 588 / 294 / 118.
    assert(byStratum.sortBy(_._1).toSeq ==
      Seq(("book", 5L, 294L), ("code", 2L, 118L), ("web", 10L, 588L)))
  }

  test("apportionTokenBudget: zero budget yields all-zero budgets") {
    val docs = Seq((1L, "a", "x y"), (2L, "b", "z")).toDF("doc_id", "source", "text")
    val got = Pipeline.apportionTokenBudget(docs, "source", "text", 0L)
      .collect().map(_.getLong(2))
    assert(got.toSeq == Seq(0L, 0L))
  }

  // ------------------------------------------------------------ dd36
  test("softDedupWeights (dd36 shape): group weights sum to one group-count total") {
    val docs = Seq(
      (1L, "Hello, World!"), (2L, "hello world"), (3L, "HELLO  world"), // one group of 3
      (4L, "something else") // singleton
    ).toDF("doc_id", "text")
    import org.apache.spark.sql.expressions.Window
    val norm = graft.functions.TextHash.normalizeUdf(col("text"))
    val w = Window.partitionBy(col("nk"))
    val got = docs.select(col("doc_id"), md5(norm).as("nk"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .withColumn("weight", round(lit(1.0) / col("n_copies"), 9))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(3L, 3L, 3L, 1L))
    // every doc survives; total weight = number of distinct groups (±round-off)
    assert(got.length == 4)
    assert(math.abs(got.map(_._3).sum - 2.0) < 1e-6)
  }

  // ------------------------------------------------------------ tx45
  test("unigramNllScore: docs of rare tokens score higher NLL than docs of common tokens") {
    val docs = Seq(
      (1L, "common common common common"),
      (2L, "common common common common"),
      (3L, "common common common common"),
      (4L, "rare1 rare2 rare3 rare4")
    ).toDF("doc_id", "text")
    val got = TextOps.unigramNllScore(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq(4L, 4L, 4L, 4L))
    val common = got(0)._3
    val rare = got(3)._3
    assert(rare > common, s"rare-token doc NLL $rare should exceed $common")
    // hand check doc 1: p(common) = (12+1)/(16+5) = 13/21
    val expect = math.rint(-math.log(13.0 / 21.0) * 1e9) / 1e9 // per-token, rounded 9
    assert(math.abs(common - math.rint(expect * 4 / 4 * 1e6) / 1e6) < 1e-6)
  }
}
