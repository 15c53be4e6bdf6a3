package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Every registered query runs at sf0.001 and returns a sane result; plus
  * spot semantic invariants. This is the per-operator smoke layer under
  * the driver's sf0.01 DuckDB-oracle gate. */
class QueriesSpec extends SparkTestBase {

  // Queries that can legitimately return few/zero rows at the tiny sf.
  private val mayBeSmall = Set("dd26_dedup_minhash_lsh", "dd27_dedup_simhash",
    "dd28_dedup_ngram_jaccard", "ss31_ann_lsh_topk")

  SparkEntry.registry.foreach { q =>
    test(s"${q.name} runs and is non-degenerate at sf0.001") {
      val df = q.fn(spark, sf)
      val n = df.count()
      if (!mayBeSmall(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("every oracle name matches a registered query") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("q01: six (returnflag, linestatus) groups with positive sums") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q07: at most 3 rows per segment, rn in 1..3, descending price") {
    val rows = SparkEntry.queries("q07_window_topk")(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.sameElements(prices.sorted.reverse))
    }
  }

  test("q09 rollup: grand total row equals the sum of leaf rows") {
    val rows = SparkEntry.queries("q09_rollup_agg")(spark, sf).collect()
    val grand = rows.filter(r => r.getAs[String]("returnflag") == "ALL")
    assert(grand.length == 1)
    val leaves = rows.filter(r =>
      r.getAs[String]("returnflag") != "ALL" && r.getAs[String]("linestatus") != "ALL")
    assert(math.abs(leaves.map(_.getAs[Double]("sum_qty")).sum -
      grand.head.getAs[Double]("sum_qty")) < 1e-6)
    assert(leaves.map(_.getAs[Long]("n_rows")).sum == grand.head.getAs[Long]("n_rows"))
  }

  test("q22 and q23 (relational vs MapReducer wordcount) agree exactly") {
    val a = SparkEntry.queries("q22_wordcount")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = SparkEntry.queries("q23_wordcount_mapreduce")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("dd26 minhash candidates are verified near-dups (jaccard >= 0.5)") {
    val rows = SparkEntry.queries("dd26_dedup_minhash_lsh")(spark, sf).collect()
    assert(rows.nonEmpty, "expected planted near-dups at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0.5)
      assert(r.getAs[Long]("a_id") < r.getAs[Long]("b_id"))
    }
  }

  test("ss31 LSH top-1 similarity never exceeds the exact (ss30) top-1") {
    val exactTop = SparkEntry.queries("ss30_cosine_topk")(spark, sf).collect()
      .filter(_.getAs[Int]("rn") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("sim")).toMap
    val approxTop = SparkEntry.queries("ss31_ann_lsh_topk")(spark, sf).collect()
      .filter(_.getAs[Int]("rn") == 1)
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Double]("sim")).toMap
    assert(approxTop.nonEmpty)
    approxTop.foreach { case (q, annSim) =>
      assert(exactTop.contains(q), s"ANN produced unknown query id $q")
      assert(annSim <= exactTop(q) + 1e-12,
        s"ANN top-1 sim $annSim beats exact ${exactTop(q)} for q_id=$q — impossible")
    }
  }

  test("ANN recall@5 against exact top-5 stays above the quality floor") {
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .filter(_.getAs[Int]("rn") <= 5)
        .groupBy(_.getAs[Long]("q_id"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = top5("ss30_cosine_topk")
    for ((name, floor) <- Seq("ss31_ann_lsh_topk" -> 0.4, "ss32_ann_ivf_topk" -> 0.5, "ss34_ann_pq_topk" -> 0.5)) {
      val approx = top5(name)
      // recall averaged over ALL exact queries — an ANN that silently
      // answers only a few queries scores 0 on the missing ones (else a
      // degradation that drops most queries entirely would slip through)
      val recalls = exact.map { case (q, want) =>
        (approx.getOrElse(q, Set.empty[Long]) intersect want).size.toDouble / want.size.min(5)
      }
      assert(recalls.nonEmpty, s"$name returned no comparable queries")
      val mean = recalls.sum / recalls.size
      assert(mean >= floor,
        f"$name mean recall@5 $mean%.2f fell below the $floor floor — " +
          "approx quality regressed (bucketing/probing parameters?)")
    }
  }

  test("ANN query batch is fixed-size: never corpus-proportional, planned as a bounded top-k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 20k vectors → 200 ids pass the % 100 slice; the batch must cap at
    // QueryBatchMax regardless, taking the FIRST ids deterministically
    val big = (0L until 20000L).map(i => (i, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    val batch = Similarity.queryBatch(big)
    val ids = batch.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.length == Similarity.QueryBatchMax,
      s"batch must cap at ${Similarity.QueryBatchMax}, got ${ids.length}")
    assert(ids.toSeq == (0 until Similarity.QueryBatchMax).map(_ * 100L),
      "batch must be the first vec_ids of the slice, not an arbitrary subset")
    val plan = batch.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      "the batch limit must plan as a bounded top-k, not a global sort:\n" + plan.take(1000))
  }

  test("q17 approx distinct stays within HLL++ error bounds of the exact q16 counts") {
    val exact = SparkEntry.queries("q16_distinct_agg")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("nd_parts")).toMap
    val approx = SparkEntry.queries("q17_approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_nd_parts")).toMap
    assert(approx.keySet == exact.keySet, "same groups on both sides")
    // rsd = 0.01 requested; allow 5 sigma + small-count slack — a sketch
    // regression (wrong rsd wiring, wrong column) lands far outside this
    exact.foreach { case (g, nd) =>
      val a = approx(g)
      val tol = math.max(5, nd * 0.05)
      assert(math.abs(a - nd) <= tol,
        s"group $g: approx $a vs exact $nd exceeds tolerance $tol")
    }
  }

  test("ss36 kNN eval: one verdict per query, votes bounded by k, correct is 0/1") {
    val rows = SparkEntry.queries("ss36_knn_label_eval")(spark, sf).collect()
    assert(rows.nonEmpty)
    val qids = rows.map(_.getAs[Long]("q_id"))
    assert(qids.distinct.length == qids.length, "exactly one majority verdict per query")
    rows.foreach { r =>
      val v = r.getAs[Long]("votes")
      assert(v >= 1 && v <= 10, s"votes $v outside [1, k]")
      val c = r.getAs[Int]("correct")
      assert(c == 0 || c == 1)
      assert((r.getAs[Int]("pred_label") == r.getAs[Int]("true_label")) == (c == 1))
    }
  }

  test("dd31 char-pass normalization is byte-identical to the regex form on the corpus") {
    import org.apache.spark.sql.functions._
    // dd31's oracle keeps the regexp_replace form — this pins the UDF
    // swap (the r2 bench hotspot fix) to it on the real table
    val mismatch = graft.Tables(spark, sf, "documents")
      .select(
        graft.functions.TextHash.normalizeUdf(col("text")).as("u"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("r"))
      .filter(not(col("u") <=> col("r"))).count()
    assert(mismatch == 0, s"$mismatch docs normalize differently under the char-pass UDF")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
