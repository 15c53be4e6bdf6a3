package graft.operators

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-2 operator batch (the oracle gate
  * checks values; these pin the properties that make the operators
  * correct BY CONSTRUCTION, so a refactor can't silently change meaning). */
class ExtendedSpec extends SparkTestBase {

  test("q56 unpivot: 3 long rows per wide row, metrics complete per key") {
    val wide = Tables(spark, sf, "lineitem").filter(col("l_orderkey") < 100).count()
    val long = SparkEntry.queries("q56_unpivot")(spark, sf)
    assert(long.count() == wide * 3)
    val metricsPerKey = long.groupBy("l_orderkey", "l_linenumber")
      .agg(countDistinct(col("metric")).as("m")).agg(min(col("m")), max(col("m"))).head()
    assert(metricsPerKey.getLong(0) == 3 && metricsPerKey.getLong(1) == 3)
  }

  test("q60 salted join returns exactly the plain-join result") {
    val salted = SparkEntry.queries("q60_salted_join")(spark, sf).collect().toSeq
    val li = Tables(spark, sf, "lineitem").select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val sup = Tables(spark, sf, "supplier").select(col("s_suppkey").as("suppkey"), col("s_name"))
    val plain = li.join(sup, "suppkey")
      .groupBy("s_name")
      .agg(count(lit(1)).as("n_items"), Exact.dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("s_name").collect().toSeq
    assert(salted == plain, "salting must be invisible in the join result")
  }

  test("q63: group row counts cover the whole table; ns_eq true only when both sides null") {
    val rows = SparkEntry.queries("q63_null_semantics")(spark, sf).collect()
    val total = Tables(spark, sf, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    rows.foreach { r =>
      val coalesced = r.getAs[String]("rf_coalesced")
      val nsEq = r.getAs[Boolean]("ns_eq")
      val nNonnull = r.getAs[Long]("n_nonnull")
      if (coalesced == "<null>") {
        assert(nNonnull == 0, "null rf rows must not count in COUNT(col)")
      } else {
        assert(nNonnull == r.getAs[Long]("n_rows"))
        // rf non-null and ls ∈ {F, null} can never be null-safe-equal:
        // rf values are A/R, ls values are F/null.
        assert(!nsEq, s"non-null rf '$coalesced' cannot ns-equal ls")
      }
    }
  }

  test("q65 date spine: exactly 3 spine rows per order, months contiguous") {
    val spine = SparkEntry.queries("q65_date_spine")(spark, sf)
    val nOrders = Tables(spark, sf, "orders").count()
    assert(spine.agg(sum(col("n_active_orders"))).head().getLong(0) == nOrders * 3)
  }

  test("q58: trailing window sum is >= the row's own price and monotone per tie-group") {
    val rows = SparkEntry.queries("q58_window_range_interval")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("trail30d_price") >= r.getAs[Double]("o_totalprice") - 1e-9)
    }
  }

  test("q66 lateral: at most 2 customers per nation, ordered by acctbal desc") {
    val rows = SparkEntry.queries("q66_lateral_topk")(spark, sf).collect()
    val byNation = rows.groupBy(_.getAs[String]("n_name"))
    byNation.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      val bals = rs.map(_.getAs[Double]("c_acctbal"))
      assert(bals.sameElements(bals.sorted.reverse))
    }
  }

  test("tx36: at most 20 bigrams, counts non-increasing, each bigram has 2 tokens") {
    val rows = SparkEntry.queries("tx36_bigram_freq")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sorted.reverse))
    rows.foreach(r => assert(r.getAs[String]("bigram").split(" ").length == 2))
  }

  test("saltedJoin spreads a pathological hot key across all salt buckets") {
    import spark.implicits._
    // 90% of left rows share one key — the classic melted-reducer shape
    val left = (1 to 10000).map(i => (if (i % 10 != 0) 1L else i.toLong, i)).toDF("k", "v")
    val right = (1L to 1000L).map(k => (k, s"r$k")).toDF("k", "name")
    val salts = 8
    val joined = graft.api.Ops.saltedJoin(left, right, "k", salts)
    // correctness: identical multiset as the plain join
    assert(joined.count() == left.join(right, "k").count())
    // skew relief: the hot key's rows actually occupy >1 salt bucket before
    // the join (the whole point — one reducer no longer owns the hot key);
    // uses the production salt expression, not a copy
    val l = left.withColumn("_salt", graft.api.Ops.saltColumn(salts))
    val hotBuckets = l.filter($"k" === 1L).select("_salt").distinct().count()
    assert(hotBuckets > 1, s"hot key landed in only $hotBuckets salt bucket(s)")
  }

  test("tx37: token ids decode back to the most frequent words, OOV is -1") {
    val rows = SparkEntry.queries("tx37_tokenize_ids")(spark, sf).collect()
    assert(rows.nonEmpty)
    // token_ids goes out CSV-encoded for the harness (pandas can't sort
    // array columns) — decoding here doubles as the losslessness check
    def decode(r: org.apache.spark.sql.Row): Seq[Int] = {
      val s = r.getAs[String]("token_ids")
      if (s.isEmpty) Seq.empty else s.split(",").toSeq.map(_.toInt)
    }
    rows.foreach { r =>
      val ids = decode(r)
      assert(ids.length == r.getAs[Int]("n_tokens"))
      ids.foreach(id => assert(id >= -1 && id < 100))
    }
    // id 0 must be the corpus-wide most frequent token: it appears more
    // often than any other single id across all docs
    val freq = rows.flatMap(decode)
      .filter(_ >= 0).groupBy(identity).view.mapValues(_.size)
    if (freq.nonEmpty) assert(freq.maxBy(_._2)._1 == 0)
  }

  test("tx38: token offsets are contiguous — two-pass prefix sum equals a sequential scan") {
    val rows = SparkEntry.queries("tx38_pack_sequences")(spark, sf).collect()
    assert(rows.nonEmpty)
    var expectedOff = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("off") == expectedOff,
        s"doc ${r.getAs[Long]("doc_id")}: off ${r.getAs[Long]("off")} != $expectedOff")
      assert(r.getAs[Long]("seq_offset") == expectedOff % 2048)
      assert(r.getAs[Long]("seq_id") == expectedOff / 2048)
      expectedOff += r.getAs[Long]("n_tokens")
    }
  }

  test("built-in session_window agrees with Ops.sessionize on session counts per user") {
    // cross-validation: Spark's native session_window generator and the
    // lag+cumsum sessionize must carve identical session boundaries
    val ev = Tables(spark, sf, "events").select("user_id", "ts", "event_id")
    val native = ev
      .groupBy(col("user_id"), expr("session_window(ts, '30 minutes')").as("w"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    val manual = graft.api.Ops.sessionize(
        ev, keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id", gapMs = 1800000L)
      .groupBy("user_id").agg(countDistinct(col("session_id")).as("n_sessions"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    assert(native.nonEmpty && native == manual)
  }

  test("gr78 pagerank: ranks positive, bounded by theory, and top node beats the baseline") {
    val rows = SparkEntry.queries("gr78_pagerank")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ranks = rows.map(_.getAs[Double]("rank"))
    // every rank >= the teleport baseline (1-d) = 0.15; sorted descending
    ranks.foreach(r => assert(r >= 0.15 - 1e-9))
    assert(ranks.sameElements(ranks.sorted.reverse))
    // a part receiving edges must out-rank the no-inlink baseline
    assert(ranks.head > 0.15)
  }

  test("q79 bloom: zero false negatives; false-positive rate within bound") {
    val rows = SparkEntry.queries("q79_bloom_membership")(spark, sf).collect()
    val (present, absent) = rows.partition(_.getAs[Int]("should_exist") == 1)
    assert(present.nonEmpty && absent.nonEmpty)
    // a bloom filter can NEVER miss an inserted key
    present.foreach(r => assert(r.getAs[Int]("bloom_says") == 1,
      s"false negative for key ${r.getAs[Long]("probe_key")}"))
    // 800k bits / 100k capacity => fpp well under 5%; allow slack for tiny n
    val fpr = absent.count(_.getAs[Int]("bloom_says") == 1).toDouble / absent.length
    assert(fpr <= 0.10, f"false-positive rate $fpr%.3f exceeds bound")
  }

  test("q82 stratified sample: per-stratum proportions near targets, deterministic under the seed") {
    val a = SparkEntry.queries("q82_stratified_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    val b = SparkEntry.queries("q82_stratified_sample")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_sampled")).toMap
    assert(a == b, "same seed must give identical samples")
    val totals = Tables(spark, sf, "lineitem").groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
    for ((flag, target) <- Map("A" -> 0.1, "N" -> 0.5, "R" -> 0.9)) {
      val got = a.getOrElse(flag, 0L).toDouble / totals(flag)
      assert(math.abs(got - target) < 0.1,
        f"stratum $flag sampled at $got%.2f, target $target (n=${totals(flag)})")
    }
  }

  test("dd31: normalized dedup groups at least as coarsely as exact dedup") {
    val exact = SparkEntry.queries("dd25_dedup_exact")(spark, sf).count()
    val normd = SparkEntry.queries("dd31_dedup_normalized")(spark, sf).count()
    assert(normd <= exact, "a normalization key can only merge groups, never split them")
  }
}
