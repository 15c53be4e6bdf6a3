package graft.operators

import graft.{SparkEntry, SparkTestBase}

/** Physical-plan assertions: the optimizations we rely on at scale must
  * actually appear in the plan (SURVEY.md §4). A query that silently loses
  * its pushdown or broadcast would still be correct — and 100× slower at
  * 100 TB — so these are regression-guarded here.
  */
class PlanSpec extends SparkTestBase {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    df.queryExecution.executedPlan.toString()
  }

  test("q02: filters are pushed to the parquet scan and columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // pruned scan: the 11-column lineitem is read as only the 6 needed
    assert(!p.contains("l_returnflag"), "unneeded column read")
  }

  test("q01: hash aggregate runs partial then final inside codegen") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("HashAggregate"))
    assert(p.contains("*("), "no whole-stage-codegen spans in plan") // *(n) marks codegen stages
    assert(p.contains("partial_sum"), "expected partial (map-side) aggregation")
  }

  test("q03: small dimension join is a broadcast hash join") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(20).mkString("\n"))
  }

  test("q05/q06: semi and anti joins planned as such") {
    assert(plan("q05_join_semi").contains("LeftSemi"))
    assert(plan("q06_join_anti").contains("LeftAnti"))
  }

  test("q18: 4-row banding dim is broadcast (no shuffle of the fact side)") {
    val p = plan("q18_range_join")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("ss30: query side is broadcast; corpus side streams") {
    val p = plan("ss30_cosine_topk")
    assert(p.contains("Broadcast"), p)
    assert(p.contains("graft_dot_f"), "native dot expression not in plan")
  }

  test("dd28: merge-walk intersect expression is in the plan") {
    val p = plan("dd28_dedup_ngram_jaccard")
    assert(p.contains("graft_intersect_card_sorted"), p.take(2000))
  }

  test("q22 wordcount: partial count before the shuffle (map-side combine)") {
    val p = plan("q22_wordcount")
    assert(p.contains("partial_count") || p.split("HashAggregate").length >= 3, p)
  }

  test("q56 unpivot: scan reads only the 5 projected columns") {
    val p = plan("q56_unpivot")
    assert(!p.contains("l_shipdate") && !p.contains("l_extendedprice"),
      "unpivot should not widen the parquet scan beyond its inputs")
    assert(p.contains("PushedFilters"), "orderkey predicate should reach the scan")
  }

  test("q60 salted join stays an equi hash join with partial aggregation") {
    val p = plan("q60_salted_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "salting must not degrade the join to a nested loop:\n" + p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "aggregation after the salted join should still combine map-side")
  }

  test("q64 histogram: single hash aggregate pass with map-side combine") {
    val p = plan("q64_histogram")
    assert(p.contains("partial_count") || p.contains("partial_min"), p.take(1500))
    assert(!p.contains("Window"), "histogram must not be planned through a window")
  }

  test("q65 date spine: generator feeds a partial aggregate (no pre-shuffle explode blowup)") {
    val p = plan("q65_date_spine")
    assert(p.contains("Generate"), "sequence+explode should plan as a Generate node")
    assert(p.contains("partial_count"),
      "spine rows must partially aggregate before the shuffle")
  }

  test("q76 gap fill: the bounds row joins in via broadcast, never a shuffled cartesian") {
    val p = plan("q76_gap_fill")
    assert(p.contains("Broadcast"), "one-row bounds × type dim must broadcast:\n" + p.take(1500))
    assert(!p.contains("CartesianProduct"),
      "spine construction must not shuffle a cartesian product")
  }

  test("q73 NOT IN plans as a null-aware anti join, not a nested loop over the table") {
    val p = plan("q73_not_in_null_aware")
    assert(p.contains("LeftAnti"), p.take(1500))
  }

  test("q07 top-k: rank limit pushes below the window (WindowGroupLimit)") {
    val p = plan("q07_window_topk")
    assert(p.contains("WindowGroupLimit"),
      "rn <= k must prune per-group rows BEFORE the full window sort — " +
        "without WindowGroupLimit every group's rows survive to the window:\n" + p.take(1500))
  }

  test("q93 group sample: hash-rank limit prunes per group before the window sort") {
    val p = plan("q93_group_sample")
    assert(p.contains("WindowGroupLimit"),
      "rn <= k over a hash order must plan as a per-partition top-k, " +
        "not a full per-group sort:\n" + p.take(1500))
  }

  test("BFS round: broadcast frontier/visited, one candidate exchange, edge list never shuffles") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // the r5 gr81 win: without broadcast hints the static planner SMJ'd
    // every round and shuffle-WROTE the edge list each hop (LogicalRDD
    // size estimates are join-inflated; AQE's late flip can't recover the
    // map-side writes) — this pins the hinted shape so it can't regress
    val raw = (1 to 5000).map(i => (i.toLong, (i % 997).toLong)).toDF("u", "v")
    val e = raw.select(col("u").as("src"), col("v").as("dst"))
      .unionByName(raw.select(col("v").as("src"), col("u").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    val visited = (1 to 50).map(_.toLong).toDF("node")
      .withColumn("dist", lit(0)).localCheckpoint()
    val round = Graph.bfsRound(visited, visited, e, 1,
      frontierRows = 50, visitedRows = 50, broadcastMaxRows = 1000000L)
    round.collect()
    val p = round.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"),
      "round must not sort-merge (edge list would shuffle every hop):\n" + p.take(1500))
    assert("BroadcastHashJoin".r.findAllIn(p).length == 2,
      "frontier edge-join AND visited anti-join must both broadcast:\n" + p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "exactly one exchange per round (the ring dedup) is the contract:\n" + p.take(1500))
  }

  test("PageRank round: broadcast ranks/contribs, one contribution exchange, no edge shuffle") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val e = (1 to 5000).map(i => (i.toLong, (i % 997).toLong)).toDF("src", "dst")
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val outDeg = e.groupBy("src").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    val weighted = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w")).localCheckpoint()
    val ranks = nodes.withColumn("rank", lit(1.0))
    val round = graft.api.Ops.pageRankRound(weighted, nodes, ranks, 0.85, small = true)
    round.collect()
    val p = round.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"),
      "round must not sort-merge (edge list would shuffle every iteration):\n" + p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "exactly one exchange per round (the contribution agg) is the contract:\n" + p.take(1500))
  }

  test("manifest-resolved lake reads keep partition pruning and data-filter pushdown") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Lake.read pins the scan to the manifest's explicit file list — that
    // must NOT cost the two scan-avoidance levers: a partition predicate
    // still prunes to the matching directories' files at planning time,
    // and a data predicate still pushes into parquet
    val out = java.nio.file.Files.createTempDirectory("lakeprune").toString + "/lake"
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i", if (i < 20) "train" else "test", (i % 2).toInt))
      .toDF("doc_id", "text", "split", "shard_id")
    Lake.init(spark, docs, out, Seq("split", "shard_id"))
    val df = Lake.read(spark, out)
      .filter(col("split") === "train" && col("doc_id") > 5L)
    assert(df.count() == 14)
    val p = df.queryExecution.executedPlan.toString().replaceAll("\\s+", " ")
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*split[^\\]]*\\].*"),
      "the split predicate must prune manifest files at planning time:\n" + p.take(1500))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(doc_id,5\\)[^\\]]*\\].*"),
      "the doc_id predicate must push into the parquet scan:\n" + p.take(1500))
  }

  test("graft-lake DSv2 source keeps partition pruning and data-filter pushdown") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the format-string surface must cost nothing vs Lake.read: the same
    // two scan-avoidance levers must survive the TableProvider indirection
    val out = java.nio.file.Files.createTempDirectory("lakedsv2prune").toString + "/lake"
    val docs = (0L until 40L).map(i =>
      (i, s"doc $i", if (i < 20) "train" else "test", (i % 2).toInt))
      .toDF("doc_id", "text", "split", "shard_id")
    Lake.init(spark, docs, out, Seq("split", "shard_id"))
    val df = spark.read.format("graft-lake").load(out)
      .filter(col("split") === "train" && col("doc_id") > 5L)
    assert(df.count() == 14)
    val p = df.queryExecution.executedPlan.toString().replaceAll("\\s+", " ")
    assert(p.matches("(?s).*PartitionFilters: \\[[^\\]]*split[^\\]]*\\].*"),
      "the split predicate must prune at planning time through the DSv2 source:\n" + p.take(1500))
    assert(p.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(doc_id,5\\)[^\\]]*\\].*"),
      "the doc_id predicate must push into the parquet scan through the DSv2 source:\n" + p.take(1500))
  }

  test("graft-lake DSv2 source SKIPS FILES by manifest stats: a range predicate opens only overlapping files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a doc_id-clustered unpartitioned lake: 4 files with disjoint id
    // ranges and per-file stats recorded in the delta log
    val out = java.nio.file.Files.createTempDirectory("lakestatskip").toString + "/lake"
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    Lake.init(spark,
      docs.repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id"),
      out, Seq.empty, statsCols = Seq("doc_id"))
    val st = Lake.latestManifest(spark, out).get
    assert(st.files.size == 4 && st.stats.size == 4, "fixture: 4 stats'd files")
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]
            .fileIndex.inputFiles.length
      }.get
    }
    // a one-sided range hits ONE of the four disjoint files — the other
    // three are skipped from the MANIFEST stats, their footers never open
    val ranged = spark.read.format("graft-lake").load(out).filter(col("doc_id") >= 30L)
    assert(ranged.select("doc_id").collect().map(_.getLong(0)).toSet == (30L until 40L).toSet)
    assert(plannedFiles(ranged) == 1,
      "a clustered range predicate must plan only the overlapping file")
    // equality prunes the same way
    val eq = spark.read.format("graft-lake").load(out).filter(col("doc_id") === 7L)
    assert(eq.count() == 1)
    assert(plannedFiles(eq) == 1)
    // a predicate the stats cannot decide keeps every file — and stays exact
    val like = spark.read.format("graft-lake").load(out).filter(col("text").endsWith("7"))
    assert(like.count() == 4) // 7, 17, 27, 37
    assert(plannedFiles(like) == 4)
    // no filters at all: the full resolved list
    assert(plannedFiles(spark.read.format("graft-lake").load(out)) == 4)
  }

  test("append prefilter: the batch id range reaches the lake scan as a pushed filter") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // layer 1 of the px103 prefilter must prune at the parquet statistics
    // level — a UDF-only prefilter would read every row-group of a 100 TB
    // id column before dropping rows
    val out = java.nio.file.Files.createTempDirectory("bloomrange").toString + "/lake"
    spark.range(1000).select(col("id").as("doc_id"), lit("x").as("text"))
      .write.mode("overwrite").parquet(out)
    val batch = spark.range(900, 950).select(col("id").as("doc_id"))
    val probed = Pipeline.bloomProbedIds(spark, batch,
      spark.read.parquet(out).select("doc_id"), "doc_id")
    probed.collect()
    val p = probed.queryExecution.executedPlan.toString()
    assert(p.replaceAll("\\s+", " ").matches(
      "(?s).*PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(doc_id,900\\)[^\\]]*\\].*"),
      "the batch min/max range must push into the parquet id scan:\n" + p.take(1500))
    // layer 2 (the bloom probe) must stay inside whole-stage codegen: a
    // Scala UDF would split the stage right after the pushed scan
    assert(!p.contains("UDF") && !p.contains("BatchEvalPython"),
      "the bloom probe must be a native expression, not a UDF:\n" + p.take(1500))
    assert(p.contains("graft_bloom_might_contain"),
      "the native bloom probe must appear in the filter:\n" + p.take(1500))
  }

  test("CC round: broadcast min tables, min/canonicalize exchanges only, no edge shuffle") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // dd30's iterative core: in the broadcast-adaptive regime a
    // large/small-star round may aggregate (the two min tables) and
    // canonicalize (the output distinct), but the edge set itself must
    // never reach a sort-merge join or shuffle as join input
    val e = (1 to 5000).map(i => (math.max(i.toLong, (i % 997).toLong),
        math.min(i.toLong, (i % 997).toLong)))
      .filter(t => t._1 != t._2).distinct.toDF("u", "v").localCheckpoint()
    val round = graft.api.Ops.ccRound(e, small = true)
    round.collect()
    val p = round.queryExecution.executedPlan.toString().split("== Initial Plan ==")(0)
    assert(!p.contains("SortMergeJoin"),
      "round must not sort-merge (edge set would shuffle twice per round):\n" + p.take(1500))
    // the large-star intermediate fans out into several plan branches
    // (join input + both min aggregates), so BHJs appear >= 2 times; the
    // invariant is that every one of them is a broadcast, never a shuffle
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "both star joins must broadcast their min tables:\n" + p.take(1500))
    // 2 min aggregates + the output dedup; the printed tree repeats the
    // (runtime-reused) ssMin agg stage under the union, hence <= 4 in text
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 4,
      "only the min aggregates and the output dedup may exchange:\n" + p.take(1500))
  }

  test("lake delete rewrite: dynamic partition pruning keeps the read affected-partitions-only") {
    import org.apache.spark.sql.functions._
    // the px101 scale property: a takedown on a million-shard lake must
    // READ only the shards it rewrites — the semi join on the partition
    // key has to reach the scan as a dynamicpruning partition filter, or
    // the rewrite silently scans the whole lake
    val out = java.nio.file.Files.createTempDirectory("prune").toString + "/lake"
    val docs = graft.Tables(spark, sf, "documents")
    Pipeline.hashSplit(docs, "doc_id")
      .withColumn("shard_id", (col("doc_id") % 4).cast("int"))
      .write.mode("overwrite").partitionBy("split", "shard_id").parquet(out)
    val lake = spark.read.parquet(out)
    val t = broadcast(docs.filter(col("doc_id") % 131 === 0).select(col("doc_id").as("_del")))
    val affected = lake.join(t, col("doc_id") === col("_del"), "left_semi")
      .select("split", "shard_id").distinct()
    val survivors = lake
      .join(broadcast(affected), Seq("split", "shard_id"), "left_semi")
      .join(t, col("doc_id") === col("_del"), "left_anti")
    survivors.collect()
    val p = survivors.queryExecution.executedPlan.toString()
    assert(p.contains("dynamicpruning"),
      "the affected-partition semi join must prune the lake scan at the " +
        "directory level, not filter rows after a full read:\n" + p.take(1500))
  }

  test("coOccurrenceEdges cap: per-basket top-k plans as WindowGroupLimit before pairing") {
    import org.apache.spark.sql.functions.col
    val items = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val df = Graph.coOccurrenceEdges(items, "l_orderkey", "l_partkey",
      minWeight = 1L, maxItemsPerBasket = Some(5))
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("WindowGroupLimit"),
      "the fan-out cap must prune each basket to k rows BEFORE the " +
        "pair self-join, not rank-and-filter after a full window sort:\n" + p.take(1500))
  }

  test("q95: year predicate prunes partitions at the directory level") {
    val p = plan("q95_partitioned_layout")
    assert(p.contains("PartitionFilters: [") &&
      p.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\].*"),
      "the o_year filter must prune at listing time, not per-row:\n" + p.take(1500))
    assert(!p.matches("(?s).*PushedFilters: \\[[^\\]]*o_year[^\\]]*\\].*"),
      "o_year should be a partition column, not a data filter:\n" + p.take(1500))
  }

  test("q98: the dim filter prunes fact partitions at RUNTIME (dynamic pruning)") {
    val p = plan("q98_dynamic_pruning")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "the fact scan must carry a dynamicpruningexpression fed by the dim join — " +
        "without it all 30 day partitions are read for a 7-day query:\n" + p.take(2000))
  }

  test("dd29: pivot-blocked cosine join — no full×full nested loop or cartesian") {
    val p = plan("dd29_dedup_embedding_cosine")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "embedding-cosine dedup must route candidates through the pivot " +
        "equi-joins, not an all-pairs nested loop:\n" + p.take(2000))
    assert(p.contains("graft_dot_f"), "exact verification must stay on the codegen'd dot")
  }

  test("q85: SQL BROADCAST hint is honored") {
    val p = plan("q85_sql_hints")
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("q88: interval join is a bucketed equi-join, not a point×interval nested loop") {
    val p = plan("q88_interval_bucket_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval containment must ride the bucket equi-join:\n" + p.take(2000))
  }

  test("dd33: in-cluster pair join is an equi-join; only the k-centroid cross is a nested loop") {
    val p = plan("dd33_dedup_semantic")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // exactly one BroadcastNestedLoopJoin is allowed: the k-row centroid
    // cross join (k = 8 — broadcast metadata, not data). The n×n pair join
    // must be hash-partitioned on the cluster key.
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      "the in-cluster pair join regressed to a nested loop:\n" + p.take(2000))
    assert(p.contains("graft_dot_f"), "pair verification must stay on the codegen'd dot")
  }

  test("gr79: wedge and closure joins are equi-joins (no nested loop anywhere)") {
    val p = plan("gr79_triangle_count")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("dd35: edit-distance join is a bucketed equi-join with both codegen filters") {
    val p = plan("dd35_dedup_editdist")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "length banding must keep the candidate join an equi-join:\n" + p.take(2000))
    assert(p.contains("graft_l1_dist"),
      "histogram L1 prefilter must run before the merge walk")
    assert(p.contains("graft_intersect_card_sorted"),
      "exact bag count filter must stay on the codegen merge walk")
  }

  test("px94: global rank is range-partitioned — no corpus-wide single-partition sort") {
    val p = plan("px94_token_shards")
    // the documents-sized side must flow through RangePartitioning; the
    // only single-partition exchange allowed is the P-row bucket-count
    // prefix sum (its input is an aggregate, never the corpus)
    assert(p.contains("REPARTITION_BY_NUM") || p.contains("rangepartitioning") ||
      p.toLowerCase.contains("rangepartitioning"),
      "expected a range repartition of the corpus:\n" + p.take(2000))
    val idx = p.indexOf("SinglePartition")
    if (idx >= 0) {
      val tail = p.substring(idx)
      assert(tail.contains("HashAggregate") || p.substring(0, idx).contains("HashAggregate"),
        "SinglePartition exchange must only carry the aggregated bucket table:\n" + p.take(2000))
    }
  }

  test("tx43: boilerplate membership is a gram-keyed semi join (no nested loop)") {
    val p = plan("tx43_boilerplate_frac")
    assert(p.contains("LeftSemi"), "frequent-gram membership should be a semi join:\n" + p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(1500))
  }

  test("px96: per-stratum top-k rides WindowGroupLimit (map-side rank prefilter)") {
    val p = plan("px96_eval_holdout")
    assert(p.contains("WindowGroupLimit"),
      "eval holdout must pre-filter ranks before the stratum shuffle:\n" + p.take(1500))
  }

  test("px95: the composed pipeline stays free of nested-loop joins") {
    val p = plan("px95_curriculum_shards")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }

  test("gr80: basket pair generation is an equi-join on the basket id") {
    val p = plan("gr80_copurchase_graph")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
  }
}
