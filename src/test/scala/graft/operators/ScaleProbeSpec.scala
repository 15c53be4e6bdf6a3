package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Manual scale probe (skipped unless GRAFT_SCALE=1): replicates the
  * corpus with shifted ids and times the PRODUCTION prefix-filter
  * similarity join ([[graft.api.Ops.jaccardDupPairs]] — the same code
  * dd28 runs) at 1× vs 10× — evidence for the README's scaling claim
  * that cost tracks candidate mass, not corpus². The README measurement
  * (50k docs at 10×) was taken at sf0.1; run it with:
  * `GRAFT_SCALE=1 GRAFT_SCALE_SF=/root/testdata/sf0.1 sbt "testOnly graft.operators.ScaleProbeSpec"`
  */
class ScaleProbeSpec extends SparkTestBase {

  private def prefixJoinPairs(docs: org.apache.spark.sql.DataFrame): Long =
    graft.api.Ops.jaccardDupPairs(docs, idCol = "doc_id", textCol = "text",
      blockCol = Some("source"), threshold = 0.5).count()

  test("dd28 prefix-filter join: 10x replicated corpus timing") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents").select("doc_id", "source", "text")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("source"), col("text")))
      .reduce(_ unionByName _)

    for (k <- Seq(1, 10)) {
      val docs = replicate(k).localCheckpoint()
      val n = docs.count()
      val t0 = System.nanoTime()
      val pairs = prefixJoinPairs(docs)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"k=$k docs=$n pairs=$pairs time=$sec%.1fs")
    }
  }

  /** The ss31 production recipe: raise the plane count with corpus size
    * (buckets ∝ n) so candidates-per-query stay bounded. At 10× corpus
    * with 2^3=8× the buckets, scanned candidates per query should stay
    * near 1× — sublinear in corpus — where a fixed-bucket index would
    * grow them 10×. */
  test("ss31 LSH: candidates per query stay bounded at 10x corpus with buckets raised 8x") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)

    def candidatesPerQuery(corpus: org.apache.spark.sql.DataFrame, nPlanes: Int): (Double, Double) = {
      val t0 = System.nanoTime()
      val row = Similarity.lshCandidates(corpus, nPlanes)
        .agg(count(lit(1)).as("c"), countDistinct(col("q_id")).as("q")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      (row.getLong(0).toDouble / math.max(row.getLong(1), 1L), sec)
    }

    val (cpq1, sec1) = candidatesPerQuery(replicate(1).localCheckpoint(), 6)
    val (cpq10, sec10) = candidatesPerQuery(replicate(10).localCheckpoint(), 9)
    info(f"1x: planes=6 cand/query=$cpq1%.0f time=$sec1%.1fs; 10x: planes=9 cand/query=$cpq10%.0f time=$sec10%.1fs")
    // replicated vectors are identical, so buckets can't separate clones:
    // even the floor is ~10/8 × cpq1 + clone collisions. The claim under
    // test is sublinearity, not constancy.
    assert(cpq10 < cpq1 * 5.0,
      f"candidates per query grew ${cpq10 / cpq1}%.1fx at 10x corpus — index not sublinear")
  }

  /** The dd33 production recipe: grow the centroid count with corpus size
    * (k ∝ n) so mean cluster size — and with it the in-cluster pairwise
    * work per vector — stays bounded. Compared pairs per vector at 10×
    * corpus with 10× centroids should stay near 1×, where a fixed-k
    * clustering would grow them 10×. */
  test("dd33 semantic dedup: pairs per vector stay bounded at 10x corpus with k raised 10x") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "embeddings").select("vec_id", "embedding")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)

    def pairsPerVector(embs: org.apache.spark.sql.DataFrame, k: Int): (Double, Double) = {
      val withN = embs.withColumn("_nrm", graft.functions.VectorOps.norm(col("embedding")))
        .filter(col("_nrm") > 0)
      val cents = withN.orderBy("vec_id").limit(k)
        .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("_nrm").as("cnrm"))
      val n = embs.count()
      val t0 = System.nanoTime()
      // cluster-size census of the same assignment semanticDedup uses:
      // in-cluster pair work is Σ m·(m-1)/2
      val sizes = withN.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          (graft.functions.VectorOps.dot(col("embedding"), col("cv")) / (col("_nrm") * col("cnrm"))).as("_cos"))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("_cos"), (-col("cid")).as("_t"))).as("cluster"))
        .groupBy("cluster").agg(count(lit(1)).as("m"))
      val pairs = sizes.agg(sum(col("m") * (col("m") - 1))).collect()(0).getLong(0) / 2
      val sec = (System.nanoTime() - t0) / 1e9
      (pairs.toDouble / n, sec)
    }

    val (ppv1, sec1) = pairsPerVector(replicate(1).localCheckpoint(), 8)
    val (ppv10, sec10) = pairsPerVector(replicate(10).localCheckpoint(), 80)
    info(f"1x: k=8 pairs/vec=$ppv1%.0f time=$sec1%.1fs; 10x: k=80 pairs/vec=$ppv10%.0f time=$sec10%.1fs")
    // replicated vectors are identical, so clones of one direction can
    // never be separated by ANY clustering — the floor is ~1× plus clone
    // mass. The claim under test is sublinearity in corpus size.
    assert(ppv10 < ppv1 * 5.0,
      f"pairs per vector grew ${ppv10 / ppv1}%.1fx at 10x corpus — clustering not keeping pair work bounded")
  }

  /** dd35's cost model is Σ length-bucket² with a 64-op histogram kernel
    * on almost every pair — the probe measures how the constant-factor
    * layering (L1 prefilter ahead of the merge walk ahead of the banded
    * DP) holds when bucket populations grow 10×. Candidate pairs grow
    * ~100× under replication (every clone pair is a true dup), so this is
    * the worst case: wall growth well under the 100× pair growth shows
    * the cheap kernel + parallel scan absorbing the quadratic term. */
  test("dd35 edit-distance join: 10x replicated corpus timing") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)

    var secs = Map.empty[Int, Double]
    for (k <- Seq(1, 10)) {
      val docs = replicate(k).localCheckpoint()
      val n = docs.count()
      val t0 = System.nanoTime()
      val pairs = graft.api.Ops.editDistanceDupPairs(docs, "doc_id", "text", maxDist = 10).count()
      val sec = (System.nanoTime() - t0) / 1e9
      secs += k -> sec
      info(f"k=$k docs=$n pairs=$pairs time=$sec%.1fs")
    }
    assert(secs(10) < secs(1) * 100.0,
      f"wall grew ${secs(10) / secs(1)}%.0fx at 10x corpus — kernel layering not absorbing the bucket² term")
  }

  /** BFS cost per round is |frontier ⋈ edges| — per-round work tracks the
    * frontier's edge mass, never the whole graph. Replicating the graph
    * 10× as DISJOINT copies (ids shifted) with seeds in only one copy
    * must keep the reached set identical; the join cost grows only by
    * the edge-list scan side, so wall should grow far sublinearly in
    * graph size. This is the property that makes hop-capped BFS usable
    * on a 100 TB edge list where seeds touch one community. */
  test("bfsDistances: 10x disjoint graph, seeds in one copy — wall sublinear in graph size") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Graph.coOccurrenceEdges(
      Tables(spark, sfDir, "lineitem"), "l_orderkey", "l_partkey", minWeight = 2L)
      .select(col("p1"), col("p2")).localCheckpoint()
    val seeds = Tables(spark, sfDir, "part").filter(col("p_size") === 50)
      .select("p_partkey")

    def replicate(k: Int) = (0 until k)
      .map(i => base.select((col("p1") + lit(i * 10000000L)).as("p1"),
        (col("p2") + lit(i * 10000000L)).as("p2")))
      .reduce(_ unionByName _)

    var reached = Map.empty[Int, Long]
    var secs = Map.empty[Int, Double]
    for (k <- Seq(1, 10)) {
      val edges = replicate(k).localCheckpoint()
      val t0 = System.nanoTime()
      val n = Graph.bfsDistances(edges, "p1", "p2", seeds, "p_partkey", maxHops = 3).count()
      val sec = (System.nanoTime() - t0) / 1e9
      reached += k -> n; secs += k -> sec
      info(f"k=$k edges=${edges.count()} reached=$n time=$sec%.1fs")
    }
    assert(reached(1) == reached(10),
      "disjoint replicas must not change the reachable set — frontier leaked across copies")
    assert(secs(10) < secs(1) * 5.0,
      f"wall grew ${secs(10) / secs(1)}%.1fx at 10x graph — per-round cost is not frontier-bound")
  }

  /** px103's scaling claim: with the bloom prefilter, a fixed-size batch
    * appended to a 10× lake pays ~the same JOIN cost — the lake side of
    * the anti-join is cut to ~the overlap before it shuffles. The only
    * O(lake) term left is the single-column id scan feeding the bloom
    * probe, which is the floor any id-dedup ingest pays. */
  test("px103 append: fixed batch into a 10x lake — cost tracks the batch, not the lake") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), lit("train").as("split"),
        (col("doc_id") % 8).cast("int").as("shard_id"))

    def replicate(k: Int) = (0 until k)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)

    // fixed batch: half replays of lake ids, half genuinely new
    val batch = base.limit(2000).withColumn("doc_id",
        when(col("doc_id") % 2 === 0, col("doc_id"))
          .otherwise(col("doc_id") + lit(900000000L)))
      .localCheckpoint()

    var secs = Map.empty[Int, Double]
    for (k <- Seq(1, 10)) {
      val out = java.nio.file.Files.createTempDirectory(s"probe-lake$k").toString + "/lake"
      replicate(k).write.mode("overwrite").partitionBy("split", "shard_id").parquet(out)
      val t0 = System.nanoTime()
      Pipeline.appendToLake(spark, out, batch)
      val sec = (System.nanoTime() - t0) / 1e9
      secs += k -> sec
      info(f"k=$k lake=${k * base.count()} batch=2000 append=$sec%.1fs")
    }
    assert(secs(10) < secs(1) * 5.0,
      f"append grew ${secs(10) / secs(1)}%.1fx at 10x lake — batch-bound claim broken")
  }

  test("sparse delete: fixed tombstone range into a 10x clustered lake — stats pruning keeps cost near the matches") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), lit("train").as("split"),
        (col("doc_id") % 8).cast("int").as("shard_id"))

    def replicate(k: Int) = (0 until k)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)

    // the tombstones live in ONE id-range corner of the FIRST replica —
    // the delta log's per-file doc_id stats must keep the candidate scan
    // there no matter how much unrelated lake surrounds it
    val tomb = base.select("doc_id").filter(col("doc_id") < 2000L).localCheckpoint()

    var secs = Map.empty[Int, Double]
    for (k <- Seq(1, 10)) {
      val out = java.nio.file.Files.createTempDirectory(s"probe-dv$k").toString + "/lake"
      Lake.init(spark,
        replicate(k).repartitionByRange(16 * k, col("doc_id"))
          .sortWithinPartitions("doc_id"),
        out, Seq("split", "shard_id"), statsCols = Seq("doc_id"))
      val t0 = System.nanoTime()
      Pipeline.deleteFromLakeSparse(spark, out, tomb, "doc_id")
      val sec = (System.nanoTime() - t0) / 1e9
      secs += k -> sec
      info(f"k=$k files=${Lake.latestManifest(spark, out).get.files.size} " +
        f"sparse-delete=$sec%.1fs")
    }
    assert(secs(10) < secs(1) * 5.0,
      f"sparse delete grew ${secs(10) / secs(1)}%.1fx at 10x lake — " +
        "stats-pruned match-bound claim broken")
  }

  /** The vectorized merge-on-read has NO position ceiling at all: a
    * version carrying >20M deletion-vector positions (the driver-side
    * cap of the no-extensions fallback scan) reads through
    * `spark.read.format("graft-lake")` because the injected rule plans
    * the executor-side anti-join — no driver position load exists to
    * cap. The probe pins the cap conf at 1 to PROVE the read never
    * consults it. */
  test("MoR format read survives >20M deletion-vector positions via the vectorized anti-join") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val out = java.nio.file.Files.createTempDirectory("morscale").toString + "/lake"
    val n = 26000000L
    val dels = 21000000L // over the fallback scan's 20M driver cap
    val rows = spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 4).cast("int").as("shard_id"))
    Lake.init(spark, rows.repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions("doc_id"), out, Seq("shard_id"), statsCols = Seq("doc_id"))
    val t0 = System.nanoTime()
    Pipeline.deleteFromLakeSparse(spark, out,
      spark.range(dels).select(col("id").as("doc_id")), "doc_id")
    info(f"sparse-delete ${dels / 1000000}%dM rows: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    spark.conf.set(graft.sources.lake.LakeMorTable.MaxPositionsConf, "1")
    try {
      val t1 = System.nanoTime()
      val survivors = spark.read.format("graft-lake").load(out).count()
      info(f"MoR format count: ${(System.nanoTime() - t1) / 1e9}%.1fs")
      assert(survivors == n - dels,
        s"vectorized MoR read must apply all ${dels} tombstones, got $survivors")
    } finally spark.conf.unset(graft.sources.lake.LakeMorTable.MaxPositionsConf)
  }

  /** The DSv2 streaming write at volume: the 10×-replicated corpus
    * (≈500k docs at sf0.1) streams through
    * `writeStream.format("graft-lake")` in several byte-bounded
    * micro-batches. What this evidences at 100 TB: per-epoch commit
    * cost tracks the BATCH (executors write partition-routed files,
    * the driver publishes one delta naming them — no driver-side
    * re-planning of rows), and the end state hash-equals the batch
    * ingest of the same corpus. */
  test("streaming write: 10x corpus streams in micro-batches, epoch commits track the batch") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val base = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"),
        when(col("doc_id") % 10 < 8, "train").otherwise("test").as("split"),
        (col("doc_id") % 4).cast("int").as("shard_id"))
    val docs = (0 until 10)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
      .reduce(_ unionByName _)
    val root = java.nio.file.Files.createTempDirectory("scale-sink").toString
    val src = s"$root/src"
    docs.repartition(20).write.parquet(src)
    val out = s"$root/lake"
    Lake.init(spark, docs.limit(0), out, Seq.empty) // schema-only bootstrap
    // unpartitioned empty lake: first stream batch decides nothing —
    // layout is unpartitioned, the scale shape for a raw landing zone
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "5").parquet(src)
      .writeStream.format("graft-lake")
      .option("checkpointLocation", s"$root/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(out)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val n = Lake.read(spark, out).count()
    val appends = Lake.describeHistory(spark, out).collect()
      .count(_.getString(2) == "append")
    info(f"streamed $n%d rows in $appends%d epoch commits, $sec%.1fs")
    assert(n == docs.count(), "every replicated row lands exactly once")
    assert(appends >= 4, s"maxFilesPerTrigger=5 over 20 files must take >=4 epochs, got $appends")
  }

  /** Partition-spec evolution at volume: on a 26M-row lake the
    * relayout-for-new-writes is a CONSTANT-TIME metadata commit (vs the
    * full rewrite repartitionLake prices), and the mixed-generation
    * union stays exact with the new generation landing under the new
    * tree. */
  test("evolveLayout on a 26M-row lake is a constant-time metadata commit; the union read stays exact") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val out = java.nio.file.Files.createTempDirectory("evolvescale").toString + "/lake"
    val n = 26000000L
    val rows = spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 4).cast("int").as("shard_id"),
      (col("id") % 2).cast("int").as("bucket"))
    Lake.init(spark, rows.repartitionByRange(16, col("doc_id"))
      .sortWithinPartitions("doc_id"), out, Seq("shard_id"), statsCols = Seq("doc_id"))
    val t0 = System.nanoTime()
    Lake.evolveLayout(spark, out, Seq("bucket"))
    val evolveSec = (System.nanoTime() - t0) / 1e9
    info(f"evolveLayout on ${n / 1000000}%dM rows: $evolveSec%.2fs")
    assert(evolveSec < 10.0,
      f"a metadata relayout must not scale with the data, took $evolveSec%.1fs")
    Lake.append(spark, out, spark.range(n, n + 1000000L).select(
      col("id").as("doc_id"), (col("id") % 4).cast("int").as("shard_id"),
      (col("id") % 2).cast("int").as("bucket")))
    val st = Lake.currentState(spark, out)
    assert(st.files.exists(_.startsWith("bucket=")) &&
      st.files.exists(_.startsWith("shard_id=")), "both generations live")
    val t1 = System.nanoTime()
    val total = Lake.read(spark, out).count()
    info(f"mixed-generation count: ${(System.nanoTime() - t1) / 1e9}%.1fs")
    assert(total == n + 1000000L)
  }

  /** The bloom-index claim at scale: a UUID-shaped key (hash-scattered —
    * every file's [min,max] spans the whole key space, so stats pruning
    * keeps 100% of files) on a 10×-replicated corpus. A sparse merge's
    * candidate list must come back O(files actually holding the keys),
    * not O(lake): the per-file parquet blooms (fpp 1e-7) probed with the
    * source's keys decide it. */
  test("bloom skipping: a sparse merge into a UUID-keyed 10x lake reads O(matching) files") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val sfDir = sys.env.getOrElse("GRAFT_SCALE_SF", "/root/testdata/sf0.1")
    val out = java.nio.file.Files.createTempDirectory("bloomscale").toString + "/lake"
    val base = Tables(spark, sfDir, "documents").select("doc_id", "text")
    // 10x replicate, then SCATTER the key space (Fibonacci-hash spread):
    // neighbors land in different files, every file spans ~the full range
    val docs = (0 until 10)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
      .select((pmod(col("doc_id") * lit(2654435761L), lit(1000000007L))).as("doc_id"),
        col("text"))
      .dropDuplicates("doc_id")
      .withColumn("split", lit("train"))
      .repartition(64)
    Lake.init(spark, docs, out, Seq("split"), bloomCols = Seq("doc_id"))
    val st = Lake.currentState(spark, out)
    val nFiles = st.files.size
    // 100 source keys scattered ACROSS files (a plain limit would pull
    // one partition's prefix and understate the matching-file count)
    val keys = Lake.read(spark, out).select("doc_id")
      .filter(pmod(col("doc_id"), lit(5003L)) === 1L).limit(100)
      .collect().map(_.get(0))
    val t0 = System.nanoTime()
    val statKept = Lake.pruneByStats(st, "doc_id",
      org.apache.spark.sql.types.LongType, keys.map(_.asInstanceOf[Long]).min,
      keys.map(_.asInstanceOf[Long]).max)
    val bloomKept = Lake.pruneByBloom(spark, out, st, statKept, "doc_id", keys)
    val pruneSec = (System.nanoTime() - t0) / 1e9
    info(f"files=$nFiles statKept=${statKept.size} bloomKept=${bloomKept.size} " +
      f"prune=$pruneSec%.1fs")
    assert(statKept.size == nFiles, "scattered keys must defeat min/max pruning")
    // 100 keys hit at most 100 files; fpp 1e-7 adds ~0 false ones
    assert(bloomKept.size <= math.min(100, nFiles),
      s"bloom pruning must keep O(matching) files, kept ${bloomKept.size}/$nFiles")
    // NO FALSE NEGATIVES: every probe key survives in the kept set
    val keptIds = spark.read.option("basePath", out)
      .parquet(bloomKept.map(f => s"$out/$f"): _*)
      .filter(col("doc_id").isInCollection(keys.map(_.asInstanceOf[Long])))
      .select("doc_id").distinct().count()
    assert(keptIds == keys.length,
      s"bloom pruning lost keys: $keptIds/${keys.length} survive")
    // and the merge itself routes through the gate, exactly
    val updates = Lake.read(spark, out).select("doc_id", "split")
      .limit(50).withColumn("text", lit("UPDATED"))
      .select("doc_id", "text", "split")
    val before = Lake.read(spark, out).count()
    Pipeline.mergeIntoLakeSparse(spark, out, updates, idCol = "doc_id")
    val after = Lake.read(spark, out)
    assert(after.count() == before)
    assert(after.filter(col("text") === "UPDATED").count() == 50)
  }

  test("join-shaped bloom probe: a >4M-key probe into a bloomed scattered lake keeps O(matching) files, keys never collected") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val out = java.nio.file.Files.createTempDirectory("lake-bloom-join-scale").toString + "/lake"
    // 64 files of interleaved ids: min/max keeps everything. A lake
    // expecting million-key probes sizes its blooms for them — at the
    // default 1e-7, 4.2M probe keys would falsely keep ~1-(1-fpp)^keys
    // = 34% of innocent files (the compounding the write-side comment
    // documents); at 1e-9 that is 0.4%.
    spark.conf.set("spark.graft.lake.bloom.fpp", "1.0E-9")
    val docs = spark.range(64L * 20000).select(
      col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"),
      lit("train").as("split"))
      .repartition(64, pmod(col("id"), lit(64)))
    try Lake.init(spark, docs, out, Seq("split"), bloomCols = Seq("doc_id"))
    finally spark.conf.unset("spark.graft.lake.bloom.fpp")
    val st = Lake.latestManifest(spark, out).get
    // 4.2M probe keys (> BloomProbeMaxKeysDefault), only 100 of which the
    // lake holds — and those 100 all in the residue-0 and residue-1 files
    val present = spark.range(50).select((col("id") * 128).as("doc_id"))
      .unionByName(spark.range(50).select((col("id") * 128 + 65).as("doc_id")))
    val absent = spark.range(4200000L).select((col("id") + 100000000L).as("doc_id"))
    val keys = present.unionByName(absent)
    val before = Lake.bloomJoinProbes.get()
    val t0 = System.nanoTime()
    val kept = Lake.bloomPrune(spark, out, st, st.files, "doc_id", keys, 4200100L)
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"files=${st.files.size} kept=${kept.size} probe=$sec%.1fs " +
      f"joinProbes=${Lake.bloomJoinProbes.get() - before}")
    assert(Lake.bloomJoinProbes.get() > before, "above the cap the probe must go join-shaped")
    // 2 matching files + fpp-rare false keeps across 64 files × 4.2M keys:
    // per-file keep probability compounds, so allow a small tail
    assert(kept.size <= 8,
      s"a >4M-key probe must still keep O(matching) files, kept ${kept.size}/64")
    val keyVals = (0 until 50).map(_ * 128L) ++ (0 until 50).map(_ * 128L + 65L)
    val back = spark.read.option("basePath", out)
      .parquet(kept.map(f => s"$out/$f"): _*)
    assert(back.filter(col("doc_id").isInCollection(keyVals)).count() == 100,
      "the join probe must lose no matching rows")
  }

  test("columnar checkpoint: a multi-thousand-file lake resolves through an O(KB) driver stub") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val out = java.nio.file.Files.createTempDirectory("lake-pq-cp-scale").toString + "/lake"
    // ~2k files of real stats mass: 34 columns' worth would be overkill
    // here — doc_id + text bounds per file is the shape that matters
    val docs = spark.range(2000L * 500).select(
      col("id").as("doc_id"),
      concat(lit("document number "), col("id")).as("text"),
      lit("train").as("split"))
      .repartitionByRange(2000, col("doc_id")).sortWithinPartitions("doc_id")
    Lake.init(spark, docs, out, Seq("split")) // v1
    (2 to 10).foreach { i =>
      Pipeline.appendToLake(spark, out, spark.range(i * 10000000L, i * 10000000L + 10).select(
        col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"),
        lit("train").as("split")))
    }
    val log = new java.io.File(out, Lake.LogDirName)
    val stub = log.listFiles.filter(_.getName.endsWith(".checkpoint")).head
    val nFiles = Lake.currentState(spark, out).files.size
    info(f"files=$nFiles stubBytes=${stub.length}")
    assert(nFiles > 2000, s"probe needs a multi-thousand-file lake, got $nFiles")
    assert(stub.length < 4096,
      s"the driver-parsed stub must stay O(KB) at $nFiles files, got ${stub.length}")
    Lake.invalidateStateCache() // measure the uncached resolve
    // EAGER pass (opt-out conf): the full driver stats map still loads
    spark.conf.set(Lake.LazyStatsKey, "false")
    try {
      val t0 = System.nanoTime()
      val before = Lake.checkpointParquetLoads.get()
      val st = Lake.latestManifest(spark, out).get
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"eagerResolve=$sec%.2fs columnarLoads=${Lake.checkpointParquetLoads.get() - before}")
      assert(Lake.checkpointParquetLoads.get() > before, "resolution must go columnar")
      assert(st.files.size == nFiles && st.stats.size == nFiles,
        "the columnar checkpoint must carry every file and its stats")
      assert(Lake.read(spark, out).count() == 2000L * 500 + 9 * 10)
      // DEFAULT pass (conf unset): lazy above the columnar threshold —
      // the driver holds file names only; the prune runs as a job over
      // the entries and equals the eager prune exactly
      val bounds = Seq(Lake.ColBound("doc_id",
        org.apache.spark.sql.types.LongType, 300000L, 300500L))
      val eagerKept = Lake.pruneByStats(st, bounds)
      spark.conf.unset(Lake.LazyStatsKey)
      Lake.invalidateStateCache()
      val t1 = System.nanoTime()
      val lazySt = Lake.latestManifest(spark, out).get
      val lazyResolve = (System.nanoTime() - t1) / 1e9
      assert(lazySt.cpLazy.isDefined && lazySt.stats.size <= 9,
        s"the DEFAULT resolution above the columnar threshold must be lazy " +
          s"(zero driver stats), got ${lazySt.stats.size} driver entries")
      val t2 = System.nanoTime()
      val lazyKept = Lake.pruneByStats(lazySt, bounds)
      val pruneSec = (System.nanoTime() - t2) / 1e9
      info(f"lazyResolve=$lazyResolve%.2fs lazyPrune=$pruneSec%.2fs " +
        f"kept=${lazyKept.size}/$nFiles driverStats=${lazySt.stats.size}")
      assert(lazyKept == eagerKept,
        s"the job-judged prune must equal eager: ${lazyKept.size} vs ${eagerKept.size}")
      assert(eagerKept.size < nFiles / 100,
        s"the clustered range must prune hard, kept ${eagerKept.size}/$nFiles")
      // PRICING PARITY: size/row planning keeps its exact numbers under
      // the default — recorded #rows/#bytes aggregate in a job over the
      // same entries, byte-equal to the eager driver sums
      val t3 = System.nanoTime()
      val priceJobs0 = Lake.lazyPriceJobs.get()
      val lazyTotals = Lake.reservedTotals(spark, lazySt, lazySt.files)
      val priceSec = (System.nanoTime() - t3) / 1e9
      val eagerTotals = Lake.reservedTotals(spark, st, st.files)
      info(f"lazyPricing=$priceSec%.2fs totals=$lazyTotals " +
        f"jobs=${Lake.lazyPriceJobs.get() - priceJobs0}%d")
      assert(lazyTotals == eagerTotals && lazyTotals._1.isDefined &&
        lazyTotals._3.isEmpty,
        s"lazy pricing must equal eager: $lazyTotals vs $eagerTotals")
      assert(Lake.lazyPriceJobs.get() == priceJobs0,
        "whole-table pricing must answer from the directory sums — zero jobs")
      // INCREMENTAL checkpoint from the lazy state: the new entries
      // derive from the old directory in one job — the driver renders
      // only the tail, never the 2000-file stats map
      Pipeline.appendToLake(spark, out, spark.range(990000000L, 990000010L).select(
        col("id").as("doc_id"), concat(lit("doc "), col("id")).as("text"),
        lit("train").as("split")))                                       // v11
      val incBefore = Lake.checkpointIncrementalWrites.get()
      val t4 = System.nanoTime()
      val (cpV, wrote) = Lake.checkpointNow(spark, out)
      val cpSec = (System.nanoTime() - t4) / 1e9
      info(f"incrementalCheckpoint v$cpV%d wrote=$wrote time=$cpSec%.2fs")
      assert(wrote && Lake.checkpointIncrementalWrites.get() == incBefore + 1,
        "a checkpoint folded from a lazy many-file state must write incrementally")
      // ...and the state resolved THROUGH it prunes exactly like before
      Lake.invalidateStateCache()
      val st2 = Lake.latestManifest(spark, out).get
      assert(st2.cpLazy.isDefined && Lake.pruneByStats(st2, bounds) == eagerKept,
        "the incremental checkpoint must carry every stat the eager one did")
      // ...including the folded directory sums: the grown lake still
      // prices driver-side with zero jobs
      val priceJobs1 = Lake.lazyPriceJobs.get()
      val totals2 = Lake.reservedTotals(spark, st2, st2.files)
      assert(totals2._1.contains(1000090L + 10L) &&
        Lake.lazyPriceJobs.get() == priceJobs1,
        s"the folded sums must price the grown lake driver-side, got $totals2")
      // DISTRIBUTED vacuum at scale: the live count is far above the
      // default threshold, so the sweep lists and deletes in jobs —
      // driver filesystem calls stay directory-bounded on a clean lake
      val ops0 = Lake.vacuumDriverFsOps.get()
      val t5 = System.nanoTime()
      val dead = Lake.vacuum(spark, out)
      val vacSec = (System.nanoTime() - t5) / 1e9
      val vacOps = Lake.vacuumDriverFsOps.get() - ops0
      info(f"distributedVacuum dead=${dead.size}%d driverOps=$vacOps%d time=$vacSec%.2fs")
      assert(dead.isEmpty, "a clean lake has nothing to vacuum")
      assert(vacOps <= 8,
        s"the distributed sweep's driver calls must be directory-bounded, got $vacOps")
      // PATH-LAZY resolution: with the threshold lowered the state
      // defers even the file list — the driver pins O(tail) path
      // entries while pruned reads, whole-table pricing and the
      // unpruned read all keep their answers (the unpruned read costs
      // one transient, soft-cached materialization job)
      spark.conf.set(Lake.PathLazyMinFilesKey, "1")
      Lake.invalidateStateCache()
      val t6 = System.nanoTime()
      val st3 = Lake.latestManifest(spark, out).get
      val deferResolve = (System.nanoTime() - t6) / 1e9
      assert(st3.files.isInstanceOf[Lake.DeferredFiles],
        "the lowered threshold must defer the path list")
      val pinned = Lake.pinnedPathCount(st3)
      info(f"pathLazyResolve=$deferResolve%.2fs pinnedPaths=$pinned%d of ${st3.files.size}%d")
      assert(pinned == 0L,
        s"a freshly-checkpointed state must pin ZERO paths, got $pinned")
      val forces0 = Lake.pathForceJobs.get()
      val t7 = System.nanoTime()
      val deferKept = Lake.pruneByStats(st3, bounds)
      val deferPrune = (System.nanoTime() - t7) / 1e9
      assert(deferKept == eagerKept.sorted,
        s"the path-lazy prune must equal eager: ${deferKept.size} vs ${eagerKept.size}")
      assert(Lake.pathForceJobs.get() == forces0,
        "a pruned read must never materialize the corpus path list")
      val priceJobs2 = Lake.lazyPriceJobs.get()
      val totals3 = Lake.reservedTotals(spark, st3, st3.files)
      assert(totals3 == totals2 && Lake.lazyPriceJobs.get() == priceJobs2,
        s"path-lazy whole-table pricing must stay zero-job and exact, got $totals3")
      val t8 = System.nanoTime()
      val n3 = Lake.read(spark, out).count()
      val fullRead = (System.nanoTime() - t8) / 1e9
      info(f"pathLazyPrune=$deferPrune%.2fs fullRead=$fullRead%.2fs " +
        f"forces=${Lake.pathForceJobs.get() - forces0}%d")
      assert(n3 == 1000090L + 10L)
      assert(Lake.pathForceJobs.get() <= forces0 + 1,
        "the unpruned read costs at most one transient materialization")
      assert(Lake.pinnedPathCount(st3) == 0L,
        "the read must not pin the corpus list on the state")
      // HISTORY CHURN at scale: a retained delete's pre-images enter the
      // DRIVER-SIDE history tail only; the next incremental checkpoint
      // folds them into H rows with zero forces and the state re-defers
      // with a zero pin; a retention cut above the delete then reclaims
      // them with the live diff running INSIDE the listing job
      val t9 = System.nanoTime()
      Pipeline.deleteFromLake(spark, out,
        spark.range(100001L, 100003L).select(col("id").as("doc_id")),
        "doc_id", partitionCols = Seq("split"), retainHistory = true)  // v12
      val delSec = (System.nanoTime() - t9) / 1e9
      Lake.invalidateStateCache()
      val st4 = Lake.latestManifest(spark, out).get
      assert(st4.history.isInstanceOf[Lake.DeferredHistory],
        "the churned state must keep its history deferred")
      val histTailN = st4.history.asInstanceOf[Lake.DeferredHistory].histTail.size
      info(f"retainedDelete=$delSec%.2fs historyTail=$histTailN%d " +
        f"pinned=${Lake.pinnedPathCount(st4)}%d")
      assert(histTailN >= 1, "the pre-images must ride the history tail")
      val f4 = Lake.pathForceJobs.get()
      Lake.checkpointNow(spark, out)
      assert(Lake.pathForceJobs.get() == f4,
        "the history fold must never materialize either deferred list")
      Lake.invalidateStateCache()
      val st5 = Lake.latestManifest(spark, out).get
      assert(Lake.pinnedPathCount(st5) == 0L &&
        st5.history.size.toLong == st4.history.size.toLong,
        "the folded checkpoint must carry the history as H rows, pin zero")
      val f5 = Lake.pathForceJobs.get()
      val t10 = System.nanoTime()
      val dead2 = Lake.vacuumKeeping(spark, out, keepVersions = 1)
      val cutSec = (System.nanoTime() - t10) / 1e9
      info(f"retentionCut=$cutSec%.2fs reclaimed=${dead2.size}%d " +
        f"forces=${Lake.pathForceJobs.get() - f5}%d")
      assert(dead2.nonEmpty, "the cut must reclaim the delete's pre-images")
      assert(Lake.pathForceJobs.get() == f5,
        "a restore-free retention cut must never materialize a deferred list")
      Lake.invalidateStateCache()
      assert(Lake.read(spark, out).count() == 1000090L + 10L - 2L,
        "the corpus reads back exactly after the retention cut")
    } finally {
      spark.conf.unset(Lake.LazyStatsKey)
      spark.conf.unset(Lake.PathLazyMinFilesKey)
    }
  }

  /** The DV retirement probe (VERDICT r17 directive #1): a lake whose
    * EVERY file carries a deletion-vector attachment — the fully
    * sparse-deleted shape that would pin O(corpus) driver entries under
    * an eager map — resolves with the attachment map DEFERRED to the
    * checkpoint's V rows. The probe pins the driver-resident dv entries
    * to the post-checkpoint TAIL ([[Lake.pinnedDvCount]]) and the full
    * merge-on-read read to ZERO whole-map forces ([[Lake.dvForceJobs]]):
    * sidecar relevance resolves inside a job over the entries, the same
    * filesForScan shape as the path list. */
  test("dv-lazy at scale: a fully sparse-deleted 2000-file lake pins O(tail) dv entries; the MoR read never forces the map") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val out = java.nio.file.Files.createTempDirectory("lake-dv-scale").toString + "/lake"
    spark.conf.set(Lake.PathLazyMinFilesKey, "1")
    spark.conf.set(Lake.DvLazyMinPairsKey, "1")
    try {
      val docs = spark.range(2000L * 500).select(
        col("id").as("doc_id"),
        concat(lit("document number "), col("id")).as("text"),
        lit("train").as("split"))
        .repartitionByRange(2000, col("doc_id")).sortWithinPartitions("doc_id")
      Lake.init(spark, docs, out, Seq("split"))                          // v1: 2000 files
      // one sparse delete hitting EVERY file: 2000 (file, sidecar) pairs
      val t0 = System.nanoTime()
      Pipeline.deleteFromLakeSparse(spark, out,
        spark.range(2000).select((col("id") * 500L + 250L).as("doc_id")),
        "doc_id")                                                        // v2
      val delSec = (System.nanoTime() - t0) / 1e9
      Lake.checkpointNow(spark, out) // columnar: 2000 V rows + VC census
      // the post-checkpoint TAIL: 3 more rows in 3 files
      Pipeline.deleteFromLakeSparse(spark, out,
        spark.range(3).select((col("id") * 500L + 251L).as("doc_id")),
        "doc_id")                                                        // v3
      Lake.invalidateStateCache()
      val t1 = System.nanoTime()
      val st = Lake.latestManifest(spark, out).get
      val resolveSec = (System.nanoTime() - t1) / 1e9
      assert(st.dvs.isInstanceOf[Lake.DeferredDvs],
        "the sparse-deleted state must defer its attachment map")
      val pinned = Lake.pinnedDvCount(st)
      info(f"sparseDelete=$delSec%.2fs resolve=$resolveSec%.2fs " +
        f"pinnedDvEntries=$pinned%d of ~2003 pairs")
      assert(pinned == 3L,
        s"the state must pin only the 3-pair tail, got $pinned")
      // the full MoR read: exact rows, ZERO whole-map forces, the
      // sidecar list O(sparse commits)
      val f0 = Lake.dvForceJobs.get()
      val scoped0 = Lake.dvScopedJobs.get()
      val t2 = System.nanoTime()
      val n = Lake.read(spark, out).count()
      val readSec = (System.nanoTime() - t2) / 1e9
      info(f"morRead=$readSec%.2fs rows=$n%d " +
        f"forces=${Lake.dvForceJobs.get() - f0}%d " +
        f"scopedJobs=${Lake.dvScopedJobs.get() - scoped0}%d")
      assert(n == 2000L * 500 - 2000 - 3)
      assert(Lake.dvForceJobs.get() == f0,
        "the MoR read must never materialize the deferred attachment map")
      assert(Lake.pinnedDvCount(st) == 3L,
        "the read must not pin the attachment map on the state")
      assert(Lake.distinctLiveSidecars(spark, st.dvs).size == 2,
        "two sparse commits = two distinct sidecars")
      // scoped fetch stays one bounded job, O(asked) driver traffic
      val askFiles = st.files.take(5)
      val t3 = System.nanoTime()
      val asked = Lake.dvsFor(spark, st.dvs, askFiles)
      val fetchSec = (System.nanoTime() - t3) / 1e9
      info(f"scopedFetch=$fetchSec%.2fs attachments=${asked.size}%d of 5 asked")
      assert(asked.size == 5, "every file carries an attachment here")
      // the INCREMENTAL checkpoint folds the V rows forward inside the
      // entries job; the state resolved through it re-defers, pins zero
      val f1 = Lake.dvForceJobs.get()
      val t4 = System.nanoTime()
      Lake.checkpointNow(spark, out)
      val cpSec = (System.nanoTime() - t4) / 1e9
      assert(Lake.dvForceJobs.get() == f1,
        "the checkpoint fold must never materialize the attachment map")
      Lake.invalidateStateCache()
      val st2 = Lake.latestManifest(spark, out).get
      info(f"incrementalCp=$cpSec%.2fs pinnedAfter=${Lake.pinnedDvCount(st2)}%d")
      assert(st2.dvs.isInstanceOf[Lake.DeferredDvs] &&
        Lake.pinnedDvCount(st2) == 0L,
        "the folded checkpoint re-defers the map with an empty tail")
      assert(Lake.read(spark, out).count() == 2000L * 500 - 2000 - 3)
      assert(Lake.dvForceJobs.get() == f1)
    } finally {
      spark.conf.unset(Lake.DvLazyMinPairsKey)
      spark.conf.unset(Lake.PathLazyMinFilesKey)
    }
  }

  /** The round-19 streaming catch-up claim, pinned at range: a stream
    * attaching to a 200-commit delete-heavy backlog resolves the prior
    * state ONCE and folds forward in memory (one applyDelta per
    * version), instead of O(range) checkpoint+tail replays — the shape
    * that makes re-attaching to a month-old high-churn lake O(commits),
    * not O(commits x log length). */
  test("cdc catch-up over 200 delete commits resolves state once and folds forward") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val base = java.nio.file.Files.createTempDirectory("catchupscale").toString
    val out = s"$base/lake"
    import spark.implicits._
    val nDeletes = 200
    val rows = spark.range(2000).select(col("id").as("doc_id"),
      (col("id") % 4).cast("int").as("shard_id"))
    Lake.init(spark, rows, out, Seq("shard_id"), statsCols = Seq("doc_id")) // v1
    (1 to nDeletes).foreach { i =>
      graft.operators.Pipeline.deleteFromLakeSparse(spark, out,
        Seq(i.toLong).toDF("doc_id"), "doc_id") // v(1+i): one-row DV delete
    }
    Lake.invalidateStateCache()
    val resolves0 = Lake.stateResolutions.get()
    val reads0 = Lake.logReads.get()
    val q = spark.readStream.format("graft-lake-cdc")
      .option("startingVersion", "earliest")
      .option("readChangeFeed", "true")
      .load(out)
      .writeStream.format("parquet")
      .option("path", s"$base/sink").option("checkpointLocation", s"$base/ck")
      .start()
    try q.processAllAvailable() finally q.stop()
    val resolves = Lake.stateResolutions.get() - resolves0
    val reads = Lake.logReads.get() - reads0
    info(s"catch-up over $nDeletes delete commits: $resolves state resolutions, $reads log reads")
    val deletes = spark.read.parquet(s"$base/sink")
      .filter(col("_change_type") === "delete").count()
    assert(deletes == nDeletes, s"every delete streams exactly once, got $deletes")
    assert(resolves <= 6,
      s"the walk must resolve state ONCE and fold forward, paid $resolves full replays")
    assert(reads <= 4L * nDeletes + 50,
      s"log reads must be O(range), not O(range x replay): $reads for $nDeletes commits")
  }

  /** The open-writer cap at its motivating shape: an UNCLUSTERED stream
    * into a bucket(64) layout — without the cap each task holds up to
    * 64 buffering parquet writers (~row-group each); with it the peak
    * stays at `maxOpenWriters` and the cost surfaces as cap-rolled
    * (smaller, more numerous) files that compaction later folds. */
  test("unclustered stream into bucket(64): peak open writers stays at the cap; the roll trade is visible") {
    assume(sys.env.get("GRAFT_SCALE").contains("1"), "set GRAFT_SCALE=1 to run")
    val base = java.nio.file.Files.createTempDirectory("writercap").toString
    val out = s"$base/lake"
    val cap = 8
    // fully-random bucket order is the cap's worst case: with 64 live
    // directories per task and 8 writers, nearly every row rolls — the
    // probe sizes the corpus so that regime is EXERCISED (thousands of
    // rolls) without manufacturing six-figure file counts the audit
    // would then have to footer-read (that shape is what option
    // compactEvery + a clustered upstream repartition exist for)
    val rows = spark.range(8000).select(col("id").as("doc_id"),
      col("id").cast("string").as("text"))
    Lake.init(spark, rows.limit(1), out, Seq("bucket(64, doc_id)"))
    // deliberately UNCLUSTERED: round-robin partitions scatter every
    // bucket across every task, the sink's worst case
    rows.repartition(4).write.parquet(s"$base/src")
    graft.sources.lake.LakeDataWriter.reset()
    spark.conf.set("spark.graft.lake.sink.maxOpenWriters", cap.toString)
    try {
      val q = spark.readStream.schema(rows.schema).parquet(s"$base/src")
        .writeStream.format("graft-lake")
        .option("checkpointLocation", s"$base/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    } finally spark.conf.unset("spark.graft.lake.sink.maxOpenWriters")
    val peak = graft.sources.lake.LakeDataWriter.peakOpenWriters.get()
    val rolled = graft.sources.lake.LakeDataWriter.rolledFiles.get()
    val nFiles = Lake.currentState(spark, out).files.size
    info(s"peak open writers=$peak (cap $cap), cap-rolled files=$rolled, final file count=$nFiles")
    assert(Lake.read(spark, out).count() == 8001L, "every row lands exactly once")
    assert(peak <= cap, s"a task held $peak simultaneous writers past the cap $cap")
    assert(rolled > 0,
      "an unclustered bucket(64) stream through an 8-writer cap must roll files — " +
        "if it didn't, the cap was never exercised and the memory bound is untested")
  }
}
