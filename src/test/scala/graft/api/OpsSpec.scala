package graft.api

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-semantics tests of the generic operator API on literal data. */
class OpsSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before, per key, with tie rules") {
    import spark.implicits._
    val errors = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")), // after clicks 10 and 11
      (101L, 1L, ts("2024-01-01 08:59:59")), // before any click
      (102L, 2L, ts("2024-01-01 10:00:00")), // exactly at click 20's ts (<= counts)
      (103L, 3L, ts("2024-01-01 10:00:00"))  // user with no clicks
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (10L, 1L, ts("2024-01-01 09:00:00")),
      (11L, 1L, ts("2024-01-01 09:30:00")),
      (20L, 2L, ts("2024-01-01 10:00:00")),
      (21L, 2L, ts("2024-01-01 10:00:00")) // same ts: larger event_id wins
    ).toDF("event_id", "user_id", "ts")

    val got = Ops.asOfJoin(errors, clicks, Seq("user_id"), "ts", "event_id", "event_id", "click_id")
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(got == Map(100L -> 11L, 101L -> -1L, 102L -> 21L, 103L -> -1L))
  }

  test("asOfJoin: a latest right row with a NULL payload wins (no stale resurrection)") {
    import spark.implicits._
    val left = Seq((100L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(10L), 1L, ts("2024-01-01 09:00:00")),
      (Option.empty[Long], 1L, ts("2024-01-01 09:30:00"))) // latest, null payload
      .toDF("payload", "user_id", "ts")
      .withColumn("event_id", coalesce(col("payload"), lit(99L))) // tie column must be non-null
    val got = Ops.asOfJoin(left, right, Seq("user_id"), "ts", "event_id", "payload", "matched")
      .select("matched").head()
    assert(got.isNullAt(0), s"expected the latest (null-payload) row to win, got $got")
  }

  test("connectedComponents fails loudly when rounds exceed maxIter") {
    import spark.implicits._
    // driverMaxRows = 0 forces the distributed rounds the test pins
    val chain = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("a", "b")
    intercept[IllegalStateException] {
      Ops.connectedComponents(chain, "a", "b", maxIter = 1, driverMaxRows = 0).collect()
    }
    // and converges fine when allowed enough rounds
    val ok = Ops.connectedComponents(chain, "a", "b", maxIter = 15, driverMaxRows = 0)
      .collect().map(r => r.getLong(1)).distinct
    assert(ok.toSeq == Seq(1L))
  }

  test("connectedComponents: diameter-100 path converges in O(log n) rounds, not O(diameter)") {
    import spark.implicits._
    // the case min-label propagation cannot handle: a 100-hop chain would
    // need 100 label rounds; large-star/small-star contracts it in ~log n
    val path = (0L until 100L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) = Ops.ccLargeSmallStar(path, "a", "b", maxIter = 15,
      driverMaxRows = 0)
    val comps = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == 101, s"expected 101 labeled nodes, got ${comps.length}")
    assert(comps.forall(_._2 == 0L), "every node must label to the component minimum 0")
    assert(rounds < 15, s"convergence took $rounds rounds — not O(log n)")
    info(s"diameter-100 path converged in $rounds rounds")
  }

  test("CC driver fast path: identical labels to the distributed rounds, zero rounds run") {
    import spark.implicits._
    // mixed shapes: a chain, a triangle, a self-loop-only node, a star —
    // the driver union-find must agree with the iterative path label for
    // label (comp = min id of the component) on all of them
    val edges = ((0L until 30L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (102L, 100L), (200L, 200L)) ++
      (0L until 8L).map(i => (300L, 310L + i))).toDF("a", "b")
    val (fast, fastRounds) = Ops.ccLargeSmallStar(edges, "a", "b", maxIter = 15)
    val (slow, slowRounds) = Ops.ccLargeSmallStar(edges, "a", "b", maxIter = 15,
      driverMaxRows = 0)
    assert(fastRounds == 0, "a tiny edge set must resolve driver-side, no Spark rounds")
    assert(slowRounds > 0, "driverMaxRows = 0 must force the distributed rounds")
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = slow.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == s, s"fast/slow label disagreement: ${(f.toSet diff s.toSet).take(5)}")
    // int ids round-trip through the fast path with their type intact
    val intEdges = Seq((1, 2), (2, 3), (7, 7)).toDF("a", "b")
    val lab = Ops.connectedComponents(intEdges, "a", "b")
    assert(lab.schema("comp").dataType == org.apache.spark.sql.types.IntegerType)
    assert(lab.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap ==
      Map(1 -> 1, 2 -> 1, 3 -> 1, 7 -> 7))
  }

  test("sessionize: 30-min gaps split sessions; ids are 1-based and ordered") {
    import spark.implicits._
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:10:00")),
      (3L, 7L, ts("2024-01-01 01:00:00")), // 50 min gap -> new session
      (4L, 8L, ts("2024-01-01 00:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Ops.sessionize(ev, Seq("user_id"), "ts", "event_id", gapMs = 30L * 60 * 1000)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("topKPerGroup: k rows per group, deterministic tie-break") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, 10.0), ("g1", 2L, 20.0), ("g1", 3L, 20.0), ("g1", 4L, 5.0),
      ("g2", 5L, 1.0)).toDF("g", "id", "v")
    val got = Ops.topKPerGroup(df, Seq("g"), Seq(col("v").desc, col("id")), k = 2)
      .select("g", "rn", "id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    // ties on v=20.0 broken by smaller id first
    assert(got == Set(("g1", 1, 2L), ("g1", 2, 3L), ("g2", 1, 5L)))
  }

  test("minhashDupPairs finds a planted near-duplicate and skips unrelated docs") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " changed1 changed2"
    val unrelated = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Ops.minhashDupPairs(df, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dd27 banding is exact: banded+verified pairs equal the brute-force all-pairs scan") {
    import org.apache.spark.sql.functions._
    // pigeonhole claim, proven on the real corpus AND across budgets:
    // hamming <= h implies at least one of the h+1 bands is intact, so
    // the banded join must find EXACTLY what an all-pairs scan finds —
    // for the default budget 3 (4x16 layout), a tight budget, and the
    // degenerate budget 0 (one 64-bit band = exact signature equality)
    val docs = graft.Tables(spark, sf, "documents")
    val sigs = Ops.simhashSignatures(docs, "doc_id", "text").localCheckpoint()
    var anyPair = false
    for (h <- Seq(0, 1, 3)) {
      val banded = Ops.simhashDupPairs(docs, "doc_id", "text", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = sigs.alias("a").join(sigs.alias("b"), col("a._id") < col("b._id"))
        .select(col("a._id").as("a_id"), col("b._id").as("b_id"),
          bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
        .filter(col("hamming") <= h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute,
        s"maxHamming=$h: banded != brute force: missed ${brute -- banded}, extra ${banded -- brute}")
      anyPair ||= brute.nonEmpty
    }
    assert(anyPair, "corpus should contain at least one near-dup pair")
    intercept[IllegalArgumentException] {
      Ops.simhashDupPairs(docs, "doc_id", "text", maxHamming = 64)
    }
  }

  test("simhashDupPairs: identical docs collide at hamming 0") {
    import spark.implicits._
    val t = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, t), (2L, t), (3L, other)).toDF("doc_id", "text")
    val got = Ops.simhashDupPairs(df, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 2L, 0)))
    assert(!got.exists(p => p._2 == 3L || p._1 == 3L))
  }

  test("empty inputs flow through asOfJoin / sessionize / minhashDupPairs without error") {
    import spark.implicits._
    val emptyEv = Seq.empty[(Long, Long, Timestamp)].toDF("event_id", "user_id", "ts")
    assert(Ops.asOfJoin(emptyEv, emptyEv, Seq("user_id"), "ts", "event_id", "event_id", "x").count() == 0)
    assert(Ops.sessionize(emptyEv, Seq("user_id"), "ts", "event_id", 1000L).count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Ops.minhashDupPairs(emptyDocs, "doc_id", "text").count() == 0)
    // short texts (< 3 tokens) are skipped, not crashed on
    val shorts = Seq((1L, "one two"), (2L, "x")).toDF("doc_id", "text")
    assert(Ops.minhashDupPairs(shorts, "doc_id", "text").count() == 0)
  }

  test("saltedJoin equals a plain join (same multiset of rows)") {
    import spark.implicits._
    val left = Seq((1, "a"), (1, "b"), (1, "c"), (2, "d")).toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y"), (3, "Z")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Ops.saltedJoin(left, right, "k", salts = 4).select("k", "lv", "rv").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(plain == salted)
  }

  test("connectedComponents labels chains, triangles, and singleton edges") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a", "b")
    val comps = Ops.connectedComponents(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("pageRank matches the hand-computed fixpoint on a 3-node chain") {
    import spark.implicits._
    // a -> b -> c ; d=0.85, unnormalized, init 1.0. Fixpoint:
    //   r(a) = 0.15                      (no in-links)
    //   r(b) = 0.15 + 0.85·r(a)         = 0.2775
    //   r(c) = 0.15 + 0.85·r(b)         = 0.385875
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val ranks = Ops.pageRank(edges, "src", "dst", iterations = 20).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank")).toMap
    assert(math.abs(ranks(1L) - 0.15) < 1e-9)
    assert(math.abs(ranks(2L) - 0.2775) < 1e-9)
    assert(math.abs(ranks(3L) - 0.385875) < 1e-9)
  }

  test("jaccardDupPairs: higher threshold returns a subset; blockCol restricts pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "g1", "alpha beta gamma delta epsilon zeta"),
      (2L, "g1", "alpha beta gamma delta epsilon eta"),   // near-dup of 1
      (3L, "g1", "one two three four five six"),          // unrelated
      (4L, "g2", "alpha beta gamma delta epsilon zeta")   // dup of 1, other block
    ).toDF("doc_id", "grp", "text")
    def pairs(t: Double, block: Option[String]) =
      Ops.jaccardDupPairs(docs, "doc_id", "text", block, t).collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val loose = pairs(0.3, None)
    val tight = pairs(0.7, None)
    assert(tight.subsetOf(loose), "raising the threshold must only remove pairs")
    assert(loose.contains((1L, 2L)) && loose.contains((1L, 4L)))
    assert(!loose.contains((1L, 3L)), "unrelated docs must not pair")
    // blocking removes the cross-block (1,4) pair but keeps in-block (1,2)
    val blocked = pairs(0.3, Some("grp"))
    assert(blocked.contains((1L, 2L)) && !blocked.contains((1L, 4L)))
  }

  test("jaccardDupPairs releases its shingle cache: nothing left pinned in the CacheManager") {
    import spark.implicits._
    // Dataset.persist entries live in the CacheManager and stay pinned
    // until an explicit unpersist — THE accumulation hazard in a
    // long-lived session. (The returned frame's eager localCheckpoint is
    // RDD-level storage the ContextCleaner reclaims once unreferenced,
    // so it does not pin anything.)
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = Ops.jaccardDupPairs(docs, "doc_id", "text", None, 0.3)
    assert(out.count() >= 1)
    assert(spark.sharedState.cacheManager.isEmpty,
      "the shingle persist must be unpersisted before jaccardDupPairs returns")
  }

  test("cosineDupPairs is bit-identical to the brute-force all-pairs join on the real table") {
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    // reference: the plain O(n²) formulation this operator replaced
    val withNorm = e
      .withColumn("nrm", graft.functions.VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0)
    val a = withNorm.select(col("vec_id").as("a_id"), col("embedding").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("b_id"), col("embedding").as("eb"), col("nrm").as("nb"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (graft.functions.VectorOps.dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pruned = Ops.cosineDupPairs(e, "vec_id", "embedding", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned == brute, // == on doubles: bitwise is the contract
      s"pivot-blocked join diverged: only-brute=${(brute -- pruned).take(3)} " +
        s"only-pruned=${(pruned -- brute).take(3)}")
    assert(brute.nonEmpty, "degenerate check: no qualifying pairs at this sf")
  }

  test("cosineDupPairs on clustered literal data: in-cluster pairs only, at a tight threshold") {
    import spark.implicits._
    // two tight opposite-ish clusters — the production dedup regime where
    // pivot admissibility actually prunes cross-cluster blocks
    val c1 = (0 until 5).map(i => (i.toLong, Seq(1.0f, 0.01f * i, 0.0f)))
    val c2 = (10 until 15).map(i => (i.toLong, Seq(-1.0f, 0.0f, 0.01f * (i - 10))))
    val df = (c1 ++ c2).toDF("vec_id", "embedding")
    val got = Ops.cosineDupPairs(df, "vec_id", "embedding", threshold = 0.9, numPivots = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inC1 = for { x <- 0L until 5L; y <- x + 1 until 5L } yield (x, y)
    val inC2 = for { x <- 10L until 15L; y <- x + 1 until 15L } yield (x, y)
    assert(got == (inC1 ++ inC2).toSet,
      s"expected exactly the in-cluster pairs, got $got")
  }

  test("cosineDupPairs: empty input and zero vectors flow through") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Ops.cosineDupPairs(empty, "vec_id", "embedding", 0.5).count() == 0)
    val zeros = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(Ops.cosineDupPairs(zeros, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("cosineTopK ranks an exact duplicate vector first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f)),
      (1L, Seq(1.0f, 0.001f, 0.0f)), // nearly identical to 0
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Ops.cosineTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding", k = 2)
      .orderBy("rn").select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got.head == 1L)
    assert(got.size == 2)
  }

  test("cosineTopK: broadcast and shuffle-replicate grid paths take distinct plans, same results") {
    val e = graft.Tables(spark, sf, "embeddings").select("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 100 === 0)
    val bc = Ops.cosineTopK(e, q, "vec_id", "embedding", k = 5)
    val grid = Ops.cosineTopK(e, q, "vec_id", "embedding", k = 5, broadcastQueries = false)
    val bcPlan = bc.queryExecution.executedPlan.toString
    val gridPlan = grid.queryExecution.executedPlan.toString
    assert(bcPlan.contains("BroadcastNestedLoopJoin"), bcPlan.take(1500))
    assert(gridPlan.contains("CartesianProduct") && !gridPlan.contains("BroadcastNestedLoopJoin"),
      "broadcastQueries=false must become a shuffle-replicate grid join " +
        "(no single-executor residency for the query side):\n" + gridPlan.take(1500))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(key(bc) == key(grid), "join strategy must not change exact top-k results")
  }
}
