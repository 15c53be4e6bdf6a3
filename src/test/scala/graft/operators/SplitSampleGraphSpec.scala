package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkTestBase, Tables}

/** Semantics of the round-4 additions: multi-source BFS distances,
  * deterministic hash split, and the portable per-group hash sample.
  */
class SplitSampleGraphSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------ bfsDistances
  test("bfsDistances: min-hop distances on a hand graph, cap respected") {
    // 1-2-3-4-5 chain plus a 2-6 branch; edges listed in ONE direction only
    // (the op must symmetrize).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 2L)).toDF("u", "v")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val got = Graph.bfsDistances(edges, "u", "v", seeds, "id", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2), s"got $got")
  }

  test("bfsDistances: multi-source takes the min over seeds; dist 0 beats re-discovery") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val seeds = Seq(Tuple1(1L), Tuple1(5L)).toDF("id")
    val got = Graph.bfsDistances(edges, "u", "v", seeds, "id", maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // node 3 is 2 hops from both seeds; nodes 2 and 4 are 1 hop from a seed;
    // the seeds themselves must stay at 0 even though each is reachable
    // from the other within the cap.
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1, 5L -> 0), s"got $got")
  }

  test("bfsDistances: self-loops and duplicate edges don't inflate rings") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L)).toDF("u", "v")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val got = Graph.bfsDistances(edges, "u", "v", seeds, "id", maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 1), s"got $got")
  }

  // ------------------------------------------------------------ hashSplit
  test("hashSplit: partitions the corpus, fractions near targets, deterministic") {
    val docs = Tables(spark, sf, "documents")
    val a = Pipeline.hashSplit(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Pipeline.hashSplit(docs, "doc_id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "split must be a pure function of the key")
    val n = docs.count().toDouble
    assert(a.values.sum == n.toLong, "every doc lands in exactly one split")
    assert(math.abs(a("train") / n - 0.90) < 0.06, s"train frac off: $a")
    assert(math.abs(a.getOrElse("val", 0L) / n - 0.05) < 0.04, s"val frac off: $a")
  }

  test("hashSplit: assignments are stable when the corpus grows (no cross-run leakage)") {
    val docs = Tables(spark, sf, "documents")
    val half = docs.filter(col("doc_id") % 2 === 0)
    val full = Pipeline.hashSplit(docs, "doc_id").select(col("doc_id"), col("split").as("s_full"))
    val part = Pipeline.hashSplit(half, "doc_id").select(col("doc_id"), col("split").as("s_half"))
    val moved = full.join(part, "doc_id").filter(col("s_full") =!= col("s_half")).count()
    assert(moved == 0, s"$moved docs changed split when the corpus changed")
  }

  test("hashSplit: rejects degenerate fractions") {
    val docs = Tables(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      Pipeline.hashSplit(docs, "doc_id", trainFrac = 0.95, valFrac = 0.10)
    }
  }

  // ------------------------------------------------------------ temperatureMix
  test("temperatureMix: keep-rate rises as domain share falls (flattening), deterministic") {
    val docs = Tables(spark, sf, "documents")
    val kept = Pipeline.temperatureMix(docs, "doc_id", "source", "text")
    val frac = kept.groupBy("source").count().withColumnRenamed("count", "k")
      .join(docs.groupBy("source").count().withColumnRenamed("count", "n"), "source")
      .select(col("source"), (col("k") / col("n")).as("f"),
        col("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(frac.nonEmpty)
    // every domain keeps at least sqrt(share) of ITS mass in expectation;
    // the smallest domain's keep fraction must exceed the largest's
    val biggest = frac.maxBy(_._3)
    val smallest = frac.minBy(_._3)
    assert(smallest._2 >= biggest._2,
      s"flattening violated: smallest ${smallest} vs biggest ${biggest}")
    val again = Pipeline.temperatureMix(docs, "doc_id", "source", "text").count()
    assert(again == kept.count(), "kept set must be a pure function of the corpus")
  }

  test("temperatureMix: single-domain corpus (rate = 1.0) keeps every row") {
    // share = 1 → sqrt(share) = 1.0 → floor(1.0*2^32) hex-encodes to 9
    // chars; without the keep-all short-circuit lpad(...,8) truncates the
    // cut to '10000000' and silently keeps ~6.25% of the domain
    val docs = Tables(spark, sf, "documents")
    val one = docs.filter(col("source") === docs.select("source").first().getString(0))
    val n = one.count()
    assert(n > 0)
    val kept = Pipeline.temperatureMix(one, "doc_id", "source", "text").count()
    assert(kept == n, s"rate>=1 domain must keep all $n rows, kept $kept")
  }

  // ------------------------------------------------------------ q93
  test("q93 group sample: exactly k per group, ranks contiguous, re-runnable") {
    val rows = SparkEntry.queries("q93_group_sample")(spark, sf).collect()
    val byStatus = rows.groupBy(_.getString(0))
    byStatus.foreach { case (s, rs) =>
      val ranks = rs.map(_.getInt(2)).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"ranks not contiguous for $s")
      assert(ranks.size <= 20, s"group $s over-sampled")
    }
    val again = SparkEntry.queries("q93_group_sample")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "hash-ranked sample must be identical across runs")
  }

  // ------------------------------------------------------------ gr81
  test("gr81: seeds at distance 0, rings within the hop cap, one row per node") {
    val rows = SparkEntry.queries("gr81_bfs_distances")(spark, sf).collect()
    val dists = rows.map(_.getInt(1))
    assert(dists.forall(d => d >= 0 && d <= 3), "distance outside [0, maxHops]")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length, "duplicate node rows")
    val seedCount = Tables(spark, sf, "part").filter(col("p_size") === 50).count()
    assert(rows.count(_.getInt(1) == 0) == seedCount, "every seed must appear at dist 0")
  }
}
