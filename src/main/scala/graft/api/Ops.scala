package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextHash, VectorOps}

/** User-facing generic operators — the library surface a caller composes
  * with their own DataFrames (the canned SparkEntry queries are thin
  * wrappers over these). Every operator is a declarative DataFrame
  * transform: Catalyst sees the whole plan, so pushdown/pruning/AQE apply.
  */
object Ops {

  /** As-of join: for each row of `left`, attach `payloadCol` from the
    * latest `right` row with `right.tsCol <= left.tsCol` in the same
    * `keys` group. Ties on ts prefer the right row (<=), then the largest
    * `tieCol`.
    *
    * Implemented as union + running `last(_, ignoreNulls)` — one shuffle
    * by key, linear in rows; never the quadratic range-join + top-1.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      payloadCol: String,
      outCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_tag", lit(1))
      .withColumn("_payload", lit(null).cast(right.schema(payloadCol).dataType))
    val r = right
      .withColumn("_tag", lit(0))
      .withColumn("_payload", col(payloadCol))
      .select((keys :+ tsCol :+ tieCol).map(col) :+ col("_tag") :+ col("_payload"): _*)
    // union with left columns null-padded on right rows
    val padded = l.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_tag"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // The payload rides inside a struct so a right row whose payload VALUE
    // is null still counts as "the latest right row" (a bare last(...,
    // ignoreNulls) would skip it and wrongly resurrect an older payload).
    l.unionByName(padded)
      .withColumn("_m", last(when(col("_tag") === 0, struct(col("_payload"))), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .withColumn(outCol, col("_m").getField("_payload"))
      .select(leftCols.map(col) :+ col(outCol): _*)
  }

  /** Sessionization: append a `session_id` column (1-based per key) where a
    * gap > `gapMs` between consecutive `tsCol` values starts a new session. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String, gapMs: Long): DataFrame = {
    val wOrd = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol), col(tieCol))
    val ms = unix_millis(col(tsCol).cast("timestamp"))
    val gap = ms - lag(ms, 1).over(wOrd)
    df.withColumn("_ns", when(gap.isNull || gap > lit(gapMs), 1).otherwise(0))
      .withColumn("session_id", sum(col("_ns")).over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_ns")
  }

  /** Top-k rows per group with a deterministic tie-break: appends `rn`. */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** MinHash+LSH near-duplicate pairs over (id, text): candidates from
    * band-bucket self-join, verified with exact shingle Jaccard.
    * Returns (a_id, b_id, jaccard) with a_id < b_id, jaccard >= threshold. */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, rowsPerBand: Int = 4, threshold: Double = 0.5,
      persistIntermediate: Boolean = false): DataFrame = {
    val b = k / rowsPerBand
    val sigUdf = udf { text: String => TextHash.minhashSig(text, k) }
    val hsUdf = udf { text: String => TextHash.shingleHashesSorted(text) }

    // The signature/hash tables are referenced on both sides of the
    // self-join. At cluster scale pass persistIntermediate=true to
    // materialize them once (recompute of a corpus-wide UDF pass costs more
    // than the write); at small scale the checkpoint overhead dominates.
    def maybePersist(d: DataFrame): DataFrame =
      if (persistIntermediate) d.localCheckpoint() else d

    val docs = df.select(col(idCol).as("_id"), col(textCol).as("_text"))
    val sigd = maybePersist(docs.select(col("_id"), sigUdf(col("_text")).as("sig"))
      .filter(element_at(col("sig"), 1) =!= Long.MaxValue))

    val bands = transform(sequence(lit(0), lit(b - 1)),
      bi => struct(bi.as("band"), xxhash64(slice(col("sig"), bi * rowsPerBand + 1, lit(rowsPerBand))).as("bkey")))
    val banded = sigd.select(col("_id"), explode(bands).as("bk"))
      .select(col("_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))

    val ba = banded.alias("a")
    val bb = banded.alias("b")
    val candidates = ba.join(bb,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"))
      .distinct()

    val hashed = maybePersist(docs.select(col("_id"), hsUdf(col("_text")).as("hs")))
    val sa = hashed.select(col("_id").as("a_id"), col("hs").as("sha"))
    val sb = hashed.select(col("_id").as("b_id"), col("hs").as("shb"))
    val inter = graft.functions.ArrayOps.intersectCardSorted(col("sha"), col("shb"))
    candidates.join(sa, "a_id").join(sb, "b_id")
      .select(col("a_id"), col("b_id"),
        size(col("sha")).as("sza"), size(col("shb")).as("szb"), inter.as("inter"))
      .select(col("a_id"), col("b_id"),
        (col("inter") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard similarity join over (id, text) with PPJoin-style
    * prefix filtering (Chaudhuri et al., ICDE 2006; Xiao et al., WWW
    * 2008): two shingle sets with Jaccard >= t — given the size-ratio
    * constraint the join enforces — must overlap in >= ⌈t·|A|⌉ hashes, so
    * any qualifying pair shares a hash within the first |A|-⌈t·|A|⌉+1
    * elements of each SORTED hash set. Candidates come from an equi-join
    * on exploded prefix hashes (cost ∝ matching prefixes, not block²),
    * then exact merge-walk verification — so the prefix filter is
    * exactness-preserving. Optional `blockCol` restricts pairs to equal
    * block values (and tightens the candidate join).
    * Returns (a_id, b_id, jaccard) with a_id < b_id, jaccard >= t. */
  def jaccardDupPairs(df: DataFrame, idCol: String, textCol: String,
      blockCol: Option[String] = None, threshold: Double = 0.5): DataFrame = {
    require(threshold > 0 && threshold <= 1, s"threshold must be in (0,1], got $threshold")
    val hsUdf = udf { text: String => TextHash.shingleHashesSorted(text) }
    val blockExpr = blockCol.map(col).getOrElse(lit(0))
    // materialized ONCE via eager local checkpoint because FOUR plan
    // branches consume g (both sides of the prefix join, both sides of
    // the verification join) and the shingle UDF over the full corpus is
    // the dominant cost — recomputed per branch otherwise. A local
    // checkpoint (the metric-index path's device) over a Dataset.persist
    // deliberately: the ContextCleaner releases the checkpointed blocks
    // as soon as the result is unreferenced, where a persist pins a
    // CacheManager entry until an explicit unpersist — which a function
    // returning a LAZY frame has no sound place to issue, so a long
    // session interleaving many dedup calls would accumulate pinned
    // caches that evict each other.
    val g = df.select(col(idCol).as("doc_id"), blockExpr.as("_blk"), hsUdf(col(textCol)).as("hs"))
      .withColumn("sz", size(col("hs")))
      .filter(col("sz") > 0) // <3-token docs have no shingles, can't reach t
      .localCheckpoint(true)
    val prefLen = (col("sz") - ceil(col("sz") * threshold) + 1).cast("int")
    val pref = g.select(col("doc_id"), col("_blk"), col("sz"),
      explode(slice(col("hs"), lit(1), prefLen)).as("ph"))
    val pa = pref.alias("a")
    val pb = pref.alias("b")
    val candidates = pa.join(pb,
        col("a.ph") === col("b.ph") && col("a._blk") === col("b._blk") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") >= col("b.sz") * threshold && col("b.sz") >= col("a.sz") * threshold)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    val ha = g.select(col("doc_id").as("a_id"), col("hs").as("hsa"), col("sz").as("sza"))
    val hb = g.select(col("doc_id").as("b_id"), col("hs").as("hsb"), col("sz").as("szb"))
    val inter = graft.functions.ArrayOps.intersectCardSorted(col("hsa"), col("hsb"))
    candidates.join(ha, "a_id").join(hb, "b_id")
      .select(col("a_id"), col("b_id"), col("sza"), col("szb"), inter.as("inter"))
      .select(col("a_id"), col("b_id"),
        (col("inter") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance (Levenshtein) similarity join: all pairs with
    * `levenshtein(a, b) <= maxDist`, `a_id < b_id`. Candidate generation
    * is exactness-preserving two-stage filtering (Gravano et al.,
    * "Approximate String Joins in a Database (Almost) for Free",
    * VLDB 2001), never an all-pairs DP:
    *
    *  1. Length banding — ed <= d implies |len(a) - len(b)| <= d, so docs
    *     bucket by floor(len / (d+1)) and only same/adjacent buckets can
    *     qualify. The probe side explodes to {b-1, b, b+1} while the build
    *     side keeps its own bucket, so the join is a plain equi-join
    *     (shuffle-hash/broadcast eligible, no theta condition) and each
    *     qualifying pair meets exactly once (probe keys are distinct and
    *     the a_id < b_id filter kills the mirrored orientation).
    *  2. q-gram count filter — one edit changes at most q of a string's
    *     len-q+1 char q-grams (as a bag: an insert/delete only shifts the
    *     positions of grams outside its q-window, not their contents), so
    *     a qualifying pair must share >= max(len) - (q-1) - d*q grams.
    *     Bag intersection runs on sorted hash arrays via the same codegen
    *     merge walk as the Jaccard join.
    *
    * Survivors get ONE exact `levenshtein(a, b, maxDist)` — Spark's
    * threshold form, which band-limits the DP to O(d * len) cells and
    * early-exits with -1 above d, instead of the full O(len^2) table.
    * At scale the cost is O(Σ bucket_probe × bucket_build) cheap merge
    * walks + O(|candidates|) banded DPs, both shuffle-partitioned by
    * bucket key.
    *
    * Considered and measured: Ed-Join-style frequency-ordered prefix
    * filtering (Xiao, Wang & Lin, VLDB 2008) — candidates from an
    * equi-join on each string's d·q+1 RAREST gram instances instead of
    * length buckets. It is the better shape when the gram vocabulary is
    * discriminative (real text: candidates ∝ matching rare grams, not
    * bucket²), but on a small-vocabulary corpus it degenerates: this
    * synthetic table has only ~377 distinct char trigrams (31 words), so
    * even each document's rarest gram occurs in ≥250 documents and the
    * prefix join produced ~39M candidate pairs — measured 14.3 s vs
    * 3.0 s for length banding at sf0.1. When values repeat heavily,
    * multiplicities (what the bag count filter tests) are the only
    * discriminating signal, so length banding + count filter is the
    * right default; a prefix-filter variant belongs behind a strategy
    * flag if natural-text corpora need it. */
  def editDistanceDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int, q: Int = 3, blockCol: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    // optional blocking (same convention as jaccardDupPairs): pairs are
    // restricted to equal block values, and the block key rides inside
    // the bucket join key, tightening candidate generation for free
    val blockExpr = blockCol.map(col).getOrElse(lit(0))
    val qgUdf = udf { s: String => TextHash.qgramHashesSortedBag(s, q) }
    // 64-bucket count histogram of the gram bag: the count bound survives
    // the projection (L1(hist_a, hist_b) <= bag sym-diff <= 2·d·q), so a
    // 64-int codegen'd L1 prunes most same-length pairs before the full
    // O(|a|+|b|) merge walk runs — the cheap necessary condition in front
    // of the expensive exact one.
    val histUdf = udf { hs: Seq[Long] =>
      val h = new Array[Int](64)
      hs.foreach { v => h((v & 63L).toInt) += 1 }
      h
    }
    val base = df.select(col(idCol).as("_id"), blockExpr.as("_blk"), col(textCol).as("_txt"))
      .withColumn("_len", length(col("_txt")))
      .withColumn("_qg", qgUdf(col("_txt")))
      .withColumn("_hist", histUdf(col("_qg")))
      .withColumn("_bkt", floor(col("_len") / (maxDist + 1)))
    val probe = base.select(col("_id"), col("_blk"), col("_txt"), col("_len"), col("_qg"), col("_hist"),
      explode(array(col("_bkt") - 1, col("_bkt"), col("_bkt") + 1)).as("_pb"))
    val build = base.select(col("_id").as("b_id"), col("_blk").as("b_blk"), col("_txt").as("b_txt"),
      col("_len").as("b_len"), col("_qg").as("b_qg"), col("_hist").as("b_hist"),
      col("_bkt").as("_pb"))
    val histL1 = graft.functions.ArrayOps.l1DistInt(col("_hist"), col("b_hist"))
    val sharedGrams = graft.functions.ArrayOps.intersectCardSorted(col("_qg"), col("b_qg"))
    val countFilterFloor =
      greatest(col("_len"), col("b_len")) - lit((q - 1) + maxDist * q)
    probe.join(build, probe("_pb") === build("_pb") && probe("_blk") === build("b_blk"))
      .filter(col("_id") < col("b_id") &&
        abs(col("_len") - col("b_len")) <= maxDist &&
        histL1 <= lit(2 * maxDist * q) &&
        sharedGrams >= countFilterFloor)
      .select(col("_id").as("a_id"), col("b_id"),
        levenshtein(col("_txt"), col("b_txt"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Global 0-based row numbers under a TOTAL order, without one global
    * window (which would serialize the corpus through a single partition
    * — the classic zipWithIndex problem, solved the way Spark's own
    * sort does it):
    *
    *  1. `repartitionByRange` on the order keys — each partition holds a
    *     contiguous key range, partition index = range order. The ranged
    *     frame is localCheckpoint'ed so the two consumers below read the
    *     SAME materialized partitioning (range boundaries are sampled, so
    *     two independent executions could legally differ; pinning it also
    *     avoids recomputing the input twice).
    *  2. per-partition row counts — a P-row table, prefix-summed with a
    *     window over P rows (P = shuffle partitions, never data-sized).
    *  3. per-partition row_number (partition-parallel window) + broadcast
    *     partition base = the global row number.
    *
    * `order` must be a total order (break ties with a unique id) —
    * otherwise rows equal under it get an arbitrary but still unique,
    * stable-within-run numbering. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
      outCol: String = "rn", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "order must name at least one column")
    val p = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df.repartitionByRange(p, order: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val bases = ranged.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
      .withColumn("_base", coalesce(
        sum(col("_cnt")).over(
          Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("_pid", "_base")
    val win = Window.partitionBy("_pid").orderBy(order: _*)
    ranged
      .withColumn("_prn", row_number().over(win).cast("long"))
      .join(broadcast(bases), "_pid")
      .withColumn(outCol, col("_base") + col("_prn") - 1)
      .drop("_pid", "_prn", "_base")
  }

  /** The signature stage of [[simhashDupPairs]] — exposed so the
    * brute-force parity spec compares the banded join against an
    * all-pairs scan of the SAME signatures, not a re-implementation. */
  private[graft] def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val simhashUdf = udf { toksArr: Seq[String] =>
      TextHash.simhash64(toksArr.iterator.map(TextHash.fnv1a64))
    }
    df.select(col(idCol).as("_id"),
      simhashUdf(filter(split(col(textCol), " "), t => t =!= "")).as("sh"))
  }

  /** SimHash near-duplicate pairs: 64-bit signatures, banded candidates,
    * Hamming-verified with native bit_count. Exact by pigeonhole: the
    * signature is cut into `maxHamming + 1` bands, so a pair within the
    * Hamming budget differs in at most `maxHamming` bands, leaving at
    * least one band intact — the pair IS a candidate, and banding loses
    * nothing, it only prunes the pair space. Deriving the band count from
    * the budget (instead of a fixed 4) keeps that guarantee for EVERY
    * legal `maxHamming`, not just <= 3; the default 3 yields the
    * classic 4x16-bit layout. Wider budgets mean narrower bands and more
    * candidates — the recall/cost dial, paid at candidate time and
    * corrected by the exact verify. */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63] (64-bit signatures), got $maxHamming")
    val docs = simhashSignatures(df, idCol, textCol)
    val nBands = maxHamming + 1
    // band widths: 64/nBands each, first (64 mod nBands) bands one bit wider
    val widths = Array.tabulate(nBands)(i => 64 / nBands + (if (i < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val bandStructs = (0 until nBands).map { bi =>
      val mask = if (widths(bi) == 64) -1L else (1L << widths(bi)) - 1L
      struct(lit(bi).as("band"),
        shiftrightunsigned(col("sh"), offsets(bi)).bitwiseAND(lit(mask)).as("bkey"))
    }
    val banded = docs.select(col("_id"), col("sh"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("_id"), col("sh"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") && col("a._id") < col("b._id"))
      .select(col("a._id").as("a_id"), col("b._id").as("b_id"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Skew-resistant equi-join: salt the skewed (left) side's key N ways and
    * explode the right side across all salts, so one hot key spreads over N
    * reducers instead of melting one. Use when AQE's skew handling isn't
    * available/enough (e.g., a single pathological key at 100 TB).
    */
  /** The left-side salt assignment used by [[saltedJoin]] — exposed so
    * tests assert the spread property of the REAL expression, not a copy. */
  def saltColumn(salts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    val l = left.withColumn("_salt", saltColumn(salts))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Connected components over an undirected edge list (a, b) — the dedup
    * clustering step: near-dup PAIRS become duplicate CLUSTERS, and the
    * minimum member id is each cluster's canonical representative.
    *
    * Alternating large-star/small-star contraction (Kiveris, Lattanzi,
    * Mirrokni, Rastogi & Vassilvitskii, "Connected Components in MapReduce
    * and Beyond", SoCC 2014): each round rewires every node toward its
    * neighborhood minimum —
    *
    *   - large-star: per node u with neighborhood N(u), every LARGER
    *     neighbor v > u re-attaches to m = min(N(u) ∪ {u});
    *   - small-star: edges oriented larger→smaller, per node u every
    *     (smaller) neighbor and u itself attach to m = min(N(u) ∪ {u}) —
    *
    * which contracts path-shaped structure exponentially: convergence in
    * O(log n) rounds REGARDLESS of component diameter, where min-label
    * propagation needs O(diameter) rounds and is correct-but-unusable on
    * a web-scale dup graph with a long chain (a 100-hop path converges
    * here in ~8 rounds, not 100). At the fixpoint the edge set is exactly
    * the star forest (node → component minimum). Each round is four
    * hash-partitioned shuffles (two groupBy mins + two equi-joins) over a
    * monotonically star-ifying edge set; the fixpoint test is an exact
    * set comparison (two anti-join probes) on checkpointed rounds, and
    * non-convergence within maxIter fails loudly because unconverged
    * labels are silently WRONG (non-minimal components → multiple
    * "canonical" docs per true cluster).
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String, maxIter: Int = 10,
      broadcastMaxRows: Long = 1000000L, driverMaxRows: Long = 1000000L): DataFrame =
    ccLargeSmallStar(edges, aCol, bCol, maxIter, broadcastMaxRows, driverMaxRows)._1

  /** ONE large-star + small-star contraction round — exposed so the plan
    * spec pins the round's physical shape. The same broadcast-adaptive
    * device as [[pageRankRound]] / `Graph.bfsDistances`, for the same
    * measured reason (checkpointed LogicalRDDs carry join-inflated size
    * estimates, so the static planner would sort-merge — and
    * shuffle-WRITE — the full edge set twice per round): while the edge
    * set is small, the per-node min tables (node-count-bounded, far
    * smaller than the edges) are broadcast into both star joins, so a
    * round's only exchanges are the two min AGGREGATES (map-side
    * combined) and the output canonicalization — the edge set itself
    * never shuffles. In that regime the large-star intermediate also
    * skips its dedup (its duplicates cannot change a min or the final
    * distinct). Past the bound, rounds degrade to the standard
    * partitioned path with the size-reducing dedup restored. */
  private[graft] def ccRound(e: DataFrame, small: Boolean): DataFrame = {
    // ---- large-star: larger neighbors re-attach to the local min
    val both = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    val lsMin0 = both.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    val lsMin = if (small) broadcast(lsMin0) else lsMin0
    // v > u >= m, so (v, m) is already larger-first and never a loop
    val ls0 = both.filter(col("v") > col("u")).join(lsMin, "u")
      .select(col("v").as("u"), col("m").as("v"))
    val ls = if (small) ls0 else ls0.distinct()
    // ---- small-star: smaller neighbors (and u) attach to the local min
    val ssMin0 = ls.groupBy("u").agg(min(col("v")).as("m"))
    val ssMin = if (small) broadcast(ssMin0) else ssMin0
    ls.join(ssMin, "u")
      .select(col("v"), col("m"))
      .unionByName(ssMin0.select(col("u").as("v"), col("m")))
      .filter(col("v") =!= col("m"))
      .select(greatest(col("v"), col("m")).as("u"), least(col("v"), col("m")).as("v"))
      .distinct()
  }

  /** [[connectedComponents]] plus the round count — exposed for the
    * convergence-rate regression test (a diameter-100 path must converge
    * in far fewer than 100 rounds). Returns 0 rounds when the driver
    * fast path resolved the closure without distributed iteration. */
  private[graft] def ccLargeSmallStar(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int, broadcastMaxRows: Long = 1000000L,
      driverMaxRows: Long = 1000000L): (DataFrame, Int) = {
    // Node domain from the RAW symmetrized list (self-loops included) so
    // isolated/self-loop-only ids still get a label, as before.
    // Checkpointed FIRST: nodes, the working edge set, and every round
    // all hang off it — without this single materialization the upstream
    // pipeline (e.g. the Jaccard candidate+verify join feeding dd30)
    // would execute once per consumer.
    val sym0 = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .localCheckpoint()
    // Driver fast path: a dup graph whose SYMMETRIZED edge list fits the
    // driver (the same fits-in-one-place regime that lets the distributed
    // rounds broadcast their min tables) resolves in ONE in-memory
    // union-find pass instead of per-round Spark jobs — measured, the
    // iterative path's cost at this size is pure job-scheduling overhead
    // (seconds for hundreds of edges), not data. Min-root union keeps the
    // exact contract: comp = min id of the component. Only exact integral
    // id types take the fast path (labels must round-trip bit-for-bit);
    // anything else, or a larger edge list, runs the scalable rounds.
    val idType = sym0.schema("u").dataType
    val intIds = idType == org.apache.spark.sql.types.LongType ||
      idType == org.apache.spark.sql.types.IntegerType
    // gate probe is BOUNDED: scan at most driverMaxRows+1 rows to learn
    // which side of the threshold the edge list is on — a billion-edge
    // graph never pays a full count just to take the distributed path
    val cap = math.min(driverMaxRows, Int.MaxValue - 1L).toInt
    if (intIds && driverMaxRows > 0 && sym0.limit(cap + 1).count() <= driverMaxRows) {
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var x = x0
        while (parent.getOrDefault(x, x) != x) {
          val p = parent.getOrDefault(x, x)
          parent.put(x, parent.getOrDefault(p, p)) // path halving
          x = parent.getOrDefault(x, x)
        }
        x
      }
      val collected = sym0.collect().map(r =>
        (r.get(0).asInstanceOf[Number].longValue, r.get(1).asInstanceOf[Number].longValue))
      collected.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        // attach the larger root under the smaller: the final root of
        // every tree is the component minimum by induction
        if (ru < rv) parent.put(rv, ru) else if (rv < ru) parent.put(ru, rv)
      }
      val seen = new java.util.HashSet[Long]()
      val all = Seq.newBuilder[(Long, Long)]
      collected.foreach { case (u, v) =>
        if (seen.add(u)) all += ((u, find(u)))
        if (seen.add(v)) all += ((v, find(v)))
      }
      val spark = edges.sparkSession
      import spark.implicits._
      val out = all.result().toDF("id", "comp")
        .select(col("id").cast(idType).as("id"), col("comp").cast(idType).as("comp"))
      return (out, 0)
    }
    val nodes = sym0.select(col("u").as("id")).distinct()
    // Working edge set: canonical larger-first orientation, no self-loops.
    var e = sym0.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    var nE = e.count() // in-memory blocks — a cheap metadata read
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // exact edge count is free from the round checkpoint — while small,
      // the round broadcasts its min tables and never shuffles the edges
      val ss = ccRound(e, small = nE <= broadcastMaxRows).localCheckpoint()
      // exact fixpoint on canonical+distinct sets: |new| = |old| plus ONE
      // empty anti-join imply equality, and the (free) checkpoint count
      // gates the probe — rounds that are still contracting skip the
      // anti-join entirely, so the common case pays no fixpoint shuffle.
      val nSs = ss.count()
      converged = nSs == nE &&
        ss.join(e, Seq("u", "v"), "left_anti").limit(1).count() == 0
      e = ss
      nE = nSs
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations — " +
          s"pathological growth (raise maxIter; O(log n) rounds expected)")
    // fixpoint edge set IS the star forest: (member → component min);
    // roots and isolated nodes label themselves
    val labels = nodes
      .join(e.select(col("u").as("id"), col("v").as("_root")), Seq("id"), "left")
      .select(col("id"), coalesce(col("_root"), col("id")).as("comp"))
    (labels, iter)
  }

  /** PageRank over a directed edge list (src, dst) — the second iterative
    * graph operator next to [[connectedComponents]] (Page et al., "The
    * PageRank citation ranking", Stanford InfoLab 1999; the MapReduce
    * formulation is the canonical iterative-join workload of the Google
    * MapReduce lineage this engine generalizes).
    *
    * UNNORMALIZED convention: ranks start at 1.0 and re-form as
    * `(1-d) + d·Σ contributions` per node (divide by N for the
    * probability-normalized variant). Node ids are a single namespace —
    * callers joining two key domains (e.g. a bipartite graph) must make
    * the ids disjoint first. Dangling-node mass is dropped (documented
    * simplification).
    *
    * Iteration shape (same adaptive device as [[graft.operators.Graph
    * .bfsDistances]], and for the same measured reason: a checkpointed
    * DataFrame comes back as a LogicalRDD whose size estimate is
    * join-inflated, so the static planner would sort-merge — and
    * shuffle-WRITE — the pre-weighted EDGE LIST every round, with AQE's
    * late broadcast flip unable to recover the map-side writes): while
    * the exact node count — free, counted once on the checkpoint — is
    * under `broadcastMaxRows`, the rank table is broadcast into the edge
    * join and the contribution table into the rank rebuild, so a round
    * costs exactly ONE shuffle (the per-destination contribution
    * aggregate, map-side-combined) and the edge list never moves after
    * its initial checkpoint. Past the bound (web-scale node sets) the
    * hints drop off and rounds degrade to the standard partitioned SMJ
    * path. 1/out-degree is folded into the edges once, up front.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, damping: Double = 0.85,
      broadcastMaxRows: Long = 1000000L): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val small = nodes.count() <= broadcastMaxRows
    // fold 1/out-degree into the edge list ONCE — a per-iteration
    // groupBy+join over degrees would redo this work every round
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val weighted = e.join(outDeg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("deg")).as("w"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (i <- 1 to iterations) {
      ranks = pageRankRound(weighted, nodes, ranks, damping, small)
      // Rank lineage is a CHAIN (each round's output is consumed exactly
      // once by the next), so no per-round materialization is needed for
      // correctness or recompute; checkpoint sparsely just to keep the
      // analyzed-plan size bounded at high iteration counts.
      if (i % 3 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** ONE PageRank iteration — exposed so the plan spec pins the round's
    * physical shape (rank/contrib broadcasts, single contribution-agg
    * exchange, no edge-list shuffle) against the REAL dataflow. */
  private[graft] def pageRankRound(weighted: DataFrame, nodes: DataFrame,
      ranks: DataFrame, damping: Double, small: Boolean): DataFrame = {
    val r = if (small) broadcast(ranks) else ranks
    val contribs0 = weighted.join(r, col("src") === col("id"))
      .select(col("dst"), (col("rank") * col("w")).as("c"))
      .groupBy("dst").agg(sum(col("c")).as("contrib"))
    val contribs = if (small) broadcast(contribs0) else contribs0
    nodes.join(contribs, col("id") === col("dst"), "left")
      .select(col("id"),
        (lit((1.0 - damping)) + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
  }

  /** Exact cosine similarity self-join: ALL pairs with
    * `cos(a, b) >= threshold`, with pivot-blocked candidate generation
    * (ball-cover metric join; cf. Jacox & Samet, "Metric space similarity
    * joins", TODS 2008). Never a full×full nested-loop join:
    *
    *   1. every vector is assigned to its nearest of `numPivots`
    *      deterministic pivot directions (one linear pass; the angles to
    *      ALL pivots are kept for step 3);
    *   2. per-pivot angular radii are aggregated, and a pivot PAIR (i, j)
    *      is admissible iff `ang(p_i, p_j) <= r_i + r_j + acos(t)` — by
    *      the spherical triangle inequality every qualifying vector pair
    *      must live in an admissible pivot pair, so pruning is
    *      EXACTNESS-PRESERVING (this is candidate pruning, not LSH:
    *      nothing probabilistic, no recall knob);
    *   3. candidates flow through two equi-joins on the pivot ids
    *      (broadcast of the tiny admissible-pair table, then a shuffle
    *      hash join on the pivot key), each side pre-filtered by the
    *      per-vector bound `ang(v, p_other) <= acos(t) + r_other`;
    *   4. survivors are verified with the exact codegen'd dot product —
    *      the same ordered-fold math the all-pairs form used, so results
    *      (and the DuckDB oracle) are bit-identical.
    *
    * Scale shape: compute is `Σ |C_i|·|C_j|` over admissible pairs —
    * when the corpus clusters (the production dedup regime: planted
    * near-dups at t >= 0.8), most pivot pairs are inadmissible and cost
    * collapses toward `Σ cluster²`; on isotropic data at a permissive
    * threshold every pair is genuinely borderline, no exact method can
    * beat n² comparisons, and this plan degrades to an evenly-distributed
    * grid join (shuffle volume stays O(n·numPivots) rows — pairs are
    * materialized only inside the join iterator). Raise `numPivots` with
    * corpus size (buckets ∝ sqrt(n)); the approximate path for corpora
    * where n² verification is unaffordable is [[minhashDupPairs]] /
    * the LSH side of Similarity.
    */
  def cosineDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPivots: Int = 16): DataFrame = {
    require(threshold > -1 && threshold <= 1, s"threshold must be in (-1,1], got $threshold")
    val spark = df.sparkSession
    val thetaT = math.acos(threshold)
    // Bound slack: double-rounding must never EXCLUDE a true pair. acos is
    // ill-conditioned near ±1 (derivative 1/sqrt(1-x²) → ∞), so an argument
    // off by one ulp can move the angle by ~1e-8 — far more than the naive
    // 1e-9 slack. Radii and thetaT are O(1) radians, so 1e-6 of extra slack
    // admits a vanishing sliver of extra CANDIDATES (all re-verified
    // exactly) while provably covering the rounding of every acos in the
    // bound chain.
    val eps = 1e-6

    // vector dimension (schema-level probe: one row, never the data path)
    val dimRow = df.select(size(col(vecCol)).as("d")).limit(1).collect()
    val dim = if (dimRow.isEmpty) 1 else math.max(dimRow(0).getInt(0), 1)

    // Deterministic ±1 pivot directions (SplitMix64-derived, stable across
    // JVMs/runs — same derivation family as the LSH planes). Pivot quality
    // only affects PRUNING, never results.
    val pivots = Array.tabulate(numPivots, dim) { (p, j) =>
      if ((TextHash.mix64(p.toLong * 8191L + j) & 1L) == 0L) 1.0 else -1.0
    }
    val pivNorm = math.sqrt(dim.toDouble)
    val pivB = spark.sparkContext.broadcast(pivots)

    def clampAcos(x: Double): Double = math.acos(math.max(-1.0, math.min(1.0, x)))

    // nearest pivot + angles to every pivot, one pass per vector. Pivot
    // angles are metric angles only if every vector has the probed
    // dimension — a silent truncation would break the exactness-preserving
    // pruning invisibly (pruned pairs are never re-checked), so a
    // mixed-dimension corpus fails loudly here instead.
    val assignUdf = udf { emb: Seq[Float] =>
      val pv = pivB.value
      if (emb.length != pv(0).length)
        throw new IllegalArgumentException(
          s"cosineDupPairs requires uniform vector dimension: probed ${pv(0).length}, found ${emb.length}")
      var n2 = 0.0
      var j = 0
      while (j < emb.length) { n2 += emb(j).toDouble * emb(j); j += 1 }
      val en = math.sqrt(n2)
      val angles = new Array[Double](pv.length)
      var best = 0
      var p = 0
      while (p < pv.length) {
        val pp = pv(p)
        var d = 0.0
        var i = 0
        while (i < pp.length) { d += emb(i) * pp(i); i += 1 }
        angles(p) = math.acos(math.max(-1.0, math.min(1.0, d / (en * math.sqrt(pp.length.toDouble)))))
        if (angles(p) < angles(best)) best = p
        p += 1
      }
      (best, angles)
    }

    // The assigned table is the metric index: it feeds the radius agg AND
    // both join sides, so materialize it once (at scale this is the
    // standard materialize-the-index step, ~2× input size) instead of
    // re-running the scan + assignment three times. localCheckpoint, not
    // persist: the blocks are released by the ContextCleaner as soon as
    // the checkpointed plan is unreferenced, so repeated invocations from
    // a long-lived session don't accumulate pinned cache entries (a
    // CacheManager persist without a paired unpersist would). The cost is
    // lineage truncation — lost executors can't recompute these blocks —
    // the usual tradeoff for ephemeral index materialization; use a
    // reliable checkpoint dir for fault-tolerant multi-hour runs.
    val base = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_nrm", VectorOps.norm(col("_v")))
      .filter(col("_nrm") > 0) // zero vectors have no cosine (ANSI: would throw)
      .withColumn("_as", assignUdf(col("_v")))
      .select(col("_id"), col("_v"), col("_nrm"),
        col("_as._1").as("_c"), col("_as._2").as("_ang"))
      .localCheckpoint(true)

    // per-pivot radius = max member angle (numPivots rows — index metadata,
    // like collecting AQE stats, not a data-path collect)
    val radMap = base
      .select(col("_c"), element_at(col("_ang"), col("_c") + 1).as("_a"))
      .groupBy("_c").agg(max(col("_a")).as("_r"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap

    val keys = radMap.keys.toSeq.sorted
    val admRows = for {
      i <- keys; j <- keys if i <= j
      pij = {
        var d = 0.0; var x = 0
        while (x < dim) { d += pivots(i)(x) * pivots(j)(x); x += 1 }
        clampAcos(d / (pivNorm * pivNorm))
      }
      if pij <= radMap(i) + radMap(j) + thetaT + eps
    } yield (i, j, radMap(i), radMap(j))
    import spark.implicits._
    val adm = admRows.toDF("ci", "cj", "ri", "rj")

    val a = base.select(col("_id").as("a_id"), col("_v").as("_va"),
      col("_nrm").as("_na"), col("_c").as("_ca"), col("_ang").as("_anga"))
    val b = base.select(col("_id").as("b_id"), col("_v").as("_vb"),
      col("_nrm").as("_nb"), col("_c").as("_cb"), col("_ang").as("_angb"))

    a.join(broadcast(adm), col("_ca") === col("ci"))
      // per-vector refinement: a qualifying partner in C_j must be within
      // acos(t) of `a`, and is within r_j of p_j — so `a` itself must be
      // within acos(t)+r_j of p_j or the (a, C_j) block can't match
      .filter(element_at(col("_anga"), col("cj") + 1) <= lit(thetaT) + col("rj") + lit(eps))
      .join(b, col("cj") === col("_cb"))
      .filter(element_at(col("_angb"), col("ci") + 1) <= lit(thetaT) + col("ri") + lit(eps))
      .filter(col("ci") =!= col("cj") || col("a_id") < col("b_id"))
      .select(
        least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        // per-element products commute and the fold order is positional,
        // so dot(va, vb) is bit-identical regardless of id order
        (VectorOps.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb"))).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Z-order (Morton) value of two non-negative integer columns: bit i of
    * x lands at bit 2i, bit i of y at bit 2i+1. Interleaving is the
    * data-layout trick behind multi-dimensional clustering (Delta/Iceberg
    * `OPTIMIZE ZORDER BY`): sorting or range-partitioning by the z-value
    * gives every output file a small RECTANGLE of (x, y) space, so a scan
    * filtered on either dimension prunes most files — a 1-D sort can only
    * cluster one of them. Pure bit arithmetic per row (codegen'd, no UDF);
    * `bits` bounds the supported domain at [0, 2^bits). */
  def zorderValue(x: Column, y: Column, bits: Int = 16): Column =
    zorderValue(Seq(x, y), bits)

  /** N-dimensional Morton interleave (round-robin: bit i of column j
    * lands at bit `i*n + j`) — every output range of the z-value is a
    * small HYPER-RECTANGLE of the n-dimensional space, so a predicate
    * on ANY of the columns prunes. `n * bits` must fit a long's 63
    * value bits; at the lake's 8-bucket normalization that admits up
    * to 7 dimensions (Delta's practical ZORDER BY guidance caps lower
    * — locality per dimension dilutes as n grows). */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"zorderValue interleaves >= 2 columns, got ${cols.size}")
    require(cols.size * bits <= 63,
      s"zorderValue: ${cols.size} dims x $bits bits overflow a long's value bits")
    val n = cols.size
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, j)) =>
        a + shiftright(c, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (i * n + j))
      }
    }
  }

  /** Bucketed interval join: each row of `points` paired with every row of
    * `intervals` whose [start, end) window contains its timestamp — WITHOUT
    * the theta-join trap. A naive `p.ts >= i.start && p.ts < i.end` is a
    * non-equi condition, so Spark plans a BroadcastNestedLoopJoin: every
    * point × every interval, the classic temporal-join scale-killer.
    *
    * Instead both sides are mapped onto fixed time buckets (the binning
    * strategy of interval joins in stream processors — Flink's interval
    * join and the bucketed range-join optimization in Spark-ecosystem
    * engines): a point lands in exactly one bucket; an interval is
    * replicated to each bucket it overlaps (end-exclusive). The join is
    * then an EQUI-join on the bucket id plus an exact range refinement —
    * shuffle-partitionable, skew-handleable by AQE, and the replication
    * factor is `interval_length / bucketSeconds + 1` (pick bucketSeconds
    * near the typical interval length; it is a pure performance knob with
    * no effect on results).
    *
    * Intervals with `end <= start` are empty by [start, end) semantics and
    * are dropped (also keeps the bucket `sequence` ascending). */
  def intervalJoin(points: DataFrame, intervals: DataFrame, tsCol: String,
      startCol: String, endCol: String, bucketSeconds: Long = 600L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val bs = lit(bucketSeconds * 1000000L)
    def bucketOf(c: Column): Column = floor(unix_micros(c.cast("timestamp")) / bs)
    val p = points.withColumn("_bkt", bucketOf(col(tsCol)))
    val iv = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bkt2", explode(sequence(
        bucketOf(col(startCol)),
        bucketOf(col(endCol) - expr("INTERVAL '1' MICROSECOND")))))
    p.join(iv, col("_bkt") === col("_bkt2") &&
        col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("_bkt", "_bkt2")
  }

  /** Exact cosine top-k: for each row of `queries`, the k nearest rows of
    * `corpus` by cosine similarity (self-matches excluded by id). Norms
    * are precomputed per row; the per-pair work is one codegen'd dot
    * product; the per-query top-k is rank-limited BEFORE the final
    * shuffle (Spark's WindowGroupLimit — a map-side partial top-k).
    *
    * `broadcastQueries = true` (default) broadcasts the query side, so
    * the corpus streams once with zero shuffle before the top-k — right
    * whenever the query set fits in an executor (the common dedup/eval
    * regime). Set it false for a LARGE query set: the join becomes a
    * shuffle-replicate grid (every corpus partition × every query
    * partition as independent tasks) — same exact results, no
    * single-executor memory requirement on either side. For corpora
    * where exact |Q|·|C| compute itself is unaffordable, use the LSH/IVF
    * paths in [[graft.operators.Similarity]] instead. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int,
      broadcastQueries: Boolean = true): DataFrame = {
    // Zero-norm vectors have no defined cosine: exclude them up front
    // (also prevents an ANSI-mode DIVIDE_BY_ZERO on the sim projection).
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .withColumn("_nrm", VectorOps.norm(col("_v")))
      .filter(col("_nrm") > 0)
    val q0 = queries.select(col(idCol).as("q_id"), col(vecCol).as("_qv"))
      .withColumn("_qnrm", VectorOps.norm(col("_qv")))
      .filter(col("_qnrm") > 0)
    val q = if (broadcastQueries) broadcast(q0) else q0.hint("shuffle_replicate_nl")
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    c.join(q, col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dot(col("_qv"), col("_v")) / (col("_qnrm") * col("_nrm"))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
  }
}
