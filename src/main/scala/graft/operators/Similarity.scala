package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{TextHash, VectorOps}

/** Similarity search over the `embeddings` table.
  *
  * ss30: exact brute-force cosine top-k — the correctness baseline. The
  * query set is broadcast, so the big side streams once with no shuffle
  * until the per-query top-k (a tiny windowed agg).
  *
  * ss31: LSH-bucketed ANN — the scale path. Random-hyperplane signatures
  * shrink the candidate set to NPlanes+1 multi-probe buckets per query
  * (own bucket + each single sign-flip); at 1000 executors this is a
  * bucket-partitioned join instead of a full scan per query.
  */
object Similarity {

  /** Fixed-size ANN query batch, shared by ss30/ss31/ss32/ss34: the first
    * `QueryBatchMax` valid vectors (by vec_id) of the `vec_id % 100 == 0`
    * slice. The cap is the scale invariant: a `% 100` filter alone is
    * CORPUS-PROPORTIONAL (1% of 100 TB is still a terabyte of "queries"),
    * which made ss34's driver-side table build and every ssXX broadcast
    * grow with the corpus. `orderBy(vec_id).limit(n)` plans as a
    * TakeOrderedAndProject — a bounded serving batch at any corpus size,
    * never a global sort — so driver memory and broadcast size are now
    * O(batch), not O(corpus). Callers pass their norm-filtered relation so
    * the batch is exactly the first n USABLE queries (mirrors the oracle,
    * which limits over its norm-filtered CTE). */
  private[operators] val QueryBatchMax = 64
  private[operators] def queryBatch(validVecs: DataFrame): DataFrame =
    validVecs.filter(col("vec_id") % 100 === 0).orderBy("vec_id").limit(QueryBatchMax)

  /** `embedding`-bearing rows with a usable (non-zero) norm — the
    * [[queryBatch]] prelude for callers whose relation isn't already
    * norm-filtered (ss30/ss36; ss31/ss32/ss34 filter as part of their
    * signature/assignment stages). */
  private def normFiltered(e: DataFrame): DataFrame =
    e.withColumn("_nrm", VectorOps.norm(col("embedding")))
      .filter(col("_nrm") > 0).drop("_nrm")

  // ---------------------------------------------------------------- ss30
  private def ss30(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    graft.api.Ops.cosineTopK(
        corpus = e, queries = queryBatch(normFiltered(e)),
        idCol = "vec_id", vecCol = "embedding", k = 10)
      .orderBy("q_id", "rn")
  }

  private val ss30Oracle =
    """WITH n0 AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |n AS (SELECT * FROM n0 WHERE nrm > 0),
      |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 64),
      |s AS (
      |  SELECT q_id, vec_id,
      |    list_sum(list_transform(range(1, len(q_emb) + 1),
      |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / (q_nrm * nrm) AS sim
      |  FROM q JOIN n ON vec_id <> q_id)
      |SELECT q_id, CAST(rn AS INTEGER) AS rn, vec_id, sim FROM (
      |  SELECT q_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
      |  FROM s) t
      |WHERE rn <= 10 ORDER BY q_id, rn""".stripMargin

  // ---------------------------------------------------------------- ss31
  /** Deterministic ±1 random-hyperplane matrix (Charikar's SimHash-LSH for
    * cosine, STOC 2002): 6 planes × 64 dims,
    * derived from SplitMix64 — stable across JVMs and runs. 6 planes = 64
    * buckets keeps expected bucket occupancy high enough for useful recall
    * at the test scales; at production scale you'd raise planes with the
    * corpus size (buckets ∝ n / target-candidates). */
  private val NPlanes = 6

  /** LSH candidate pairs `(q_id, vec_id, sim)` for the [[queryBatch]]
    * query rows, with `nPlanes` hyperplanes (2^nPlanes
    * buckets) and multi-probe depth `probeFlips` (all buckets within that
    * Hamming distance of the query's bucket are probed — 1+n probes at
    * depth 1, +n(n-1)/2 at depth 2). Exposed package-private so the scale
    * probe can demonstrate the production recipe — raise `nPlanes` with
    * corpus size so candidates-per-query stay bounded, and `probeFlips`
    * with the recall target — against the very join ss31 runs. */
  private[graft] def lshCandidates(raw: DataFrame, nPlanes: Int,
      probeFlips: Int = 1): DataFrame = {
    val spark = raw.sparkSession
    val planes: Array[Array[Double]] =
      Array.tabulate(nPlanes, 64) { (p, j) =>
        if ((TextHash.mix64(p.toLong * 64L + j) & 1L) == 0L) 1.0 else -1.0
      }
    val planesB = spark.sparkContext.broadcast(planes)
    val bucketUdf = udf { emb: Seq[Float] =>
      val pl = planesB.value
      var bucket = 0
      var p = 0
      while (p < pl.length) {
        var s = 0.0
        var j = 0
        val dim = math.min(emb.length, 64)
        while (j < dim) { s += emb(j) * pl(p)(j); j += 1 }
        if (s > 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    }
    val e = raw.select("vec_id", "embedding")
      .withColumn("bucket", bucketUdf(col("embedding")))
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0) // zero vectors have no cosine (ANSI: would throw)
    // Multi-probe (Lv et al., "Multi-probe LSH", VLDB 2007): besides its
    // own bucket, each query probes every bucket within `probeFlips` sign
    // flips — near neighbors that landed just across one or two
    // hyperplanes are found at bounded extra probe cost instead of being
    // silently missed. Without any flips, single-probe recall@5 measured
    // ~0 at test scale (the quality floor in QueriesSpec guards it);
    // depth 2 took recall@5 at sf0.01 from 0.08 to a useful level because
    // the synthetic embeddings' true neighbors sit ~55° apart and cross
    // two of 6 hyperplanes often.
    val masks: Seq[Int] = Seq(0) ++
      (if (probeFlips >= 1) (0 until nPlanes).map(1 << _) else Seq.empty) ++
      (if (probeFlips >= 2)
        for (i <- 0 until nPlanes; j <- i + 1 until nPlanes) yield (1 << i) | (1 << j)
      else Seq.empty)
    val probes = array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)
    val q = queryBatch(e)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        explode(probes).as("bucket"))
    e.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("sim"))
  }

  private def ss31(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    lshCandidates(Tables(spark, dir, "embeddings"), NPlanes, probeFlips = 2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------- ss32
  /** IVF (inverted-file) ANN, the coarse-quantizer half of Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search" (TPAMI 2011), as
    * popularized by FAISS: k-means coarse quantizer (the index build),
    * nprobe=2 nearest centroids per query, exact cosine re-rank within the
    * probed cells. The classic FAISS-style scale path: search cost drops
    * from O(N) to O(N·nprobe/k) per query, and the posting lists are just
    * a `cluster` column — partition/bucket by it at warehouse scale.
    * Engine-only (approximate; k-means centers aren't SQL-reproducible).
    */
  private def ss32(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .withColumn("features", array_to_vector(col("embedding")))
    // Train the coarse quantizer on a seeded sample (standard FAISS
    // practice — quantizer quality needs a representative sample, not the
    // corpus): at 100 TB you cannot k-means the full table, and at bench
    // scale it halves the index-build cost.
    val model = new KMeans().setK(16).setSeed(42).setMaxIter(5)
      .fit(e.sample(withReplacement = false, 0.25, seed = 42))
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cluster"))
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0) // zero vectors have no cosine (ANSI: would throw)

    val centers = model.clusterCenters.map(_.toArray)
    val centersB = spark.sparkContext.broadcast(centers)
    val probesUdf = udf { emb: Seq[Float] =>
      val cs = centersB.value
      cs.indices.map { ci =>
        val c = cs(ci)
        var d = 0.0
        var j = 0
        while (j < c.length && j < emb.length) { val t = emb(j) - c(j); d += t * t; j += 1 }
        (d, ci)
      }.sortBy(p => (p._1, p._2)).take(2).map(_._2).toArray
    }

    val q = queryBatch(assigned)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        explode(probesUdf(col("embedding"))).as("cluster"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------- ss33
  /** Scalar int8 quantization of embeddings (the FAISS `SQ8` storage tier:
    * per-vector max-abs scale, symmetric round-to-int8) — at 100 TB the
    * vector store shrinks 4× and ANN candidate scans read int8; exact
    * re-ranking fetches the float vectors for the few survivors.
    *
    * Deterministic across engines by construction: the quantized code is
    * `floor(x · 127 / maxabs + 0.5)` — floor is exact on IEEE doubles and
    * the divide/multiply order is pinned on both sides, so no engine's
    * `round()` tie-breaking mode (HALF_UP vs banker's) is involved.
    * Per-row map work, no shuffle. Codes are emitted comma-joined (the
    * harness's pandas compare cannot sort array columns); the array form
    * is what [[quantizeEmbeddings]] returns to library callers. */
  def quantizeEmbeddings(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    embs.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .withColumn("scale", array_max(transform(col("_v"), x => abs(x.cast("double")))))
      .filter(col("scale") > 0) // all-zero vectors carry no direction to quantize
      .select(col("vec_id"), col("scale"),
        transform(col("_v"),
          x => floor(x.cast("double") * lit(127.0) / col("scale") + lit(0.5)).cast("int"))
          .as("q"))
  }

  private def ss33(spark: SparkSession, dir: String): DataFrame =
    quantizeEmbeddings(Tables(spark, dir, "embeddings"), "vec_id", "embedding")
      .select(col("vec_id"), col("scale"), array_join(col("q"), ",").as("q_csv"))
      .orderBy("vec_id")

  private val ss33Oracle =
    """WITH q AS (
      |  SELECT vec_id,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
      |    embedding
      |  FROM embeddings)
      |SELECT vec_id, scale,
      |  array_to_string(list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS INTEGER)), ',') AS q_csv
      |FROM q WHERE scale > 0 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- ss34
  /** Product-quantization ANN — the fine-quantizer half of Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search" (TPAMI 2011),
    * complementing ss32's IVF coarse half: vectors are unit-normalized
    * (so L2 order ≡ cosine order), split into M=8 subspaces of 8 dims,
    * and each sub-vector is coded as its nearest of K=16 per-subspace
    * centroids → an 8-byte code replaces a 256-byte vector. Search is
    * asymmetric distance computation (ADC): each query precomputes an
    * M×K table of sub-distances; a corpus row's approximate distance is
    * M table lookups — no float vector is read during the scan. The
    * ADC shortlist is then exactly re-ranked on the real vectors.
    *
    * Codebook training runs a deterministic seeded Lloyd's on a BOUNDED
    * sample collected to the driver — FAISS practice: the codebook needs
    * a representative sample (here ≤2048 rows, fixed vec_id order), not
    * the corpus, so training cost is independent of corpus size. The
    * scan is one broadcast of (q_id, table) against the codes column:
    * O(N·M) lookups, partition-parallel, shuffle-free until the tiny
    * per-query top-k windows. Engine-only (approximate); the recall@5
    * floor in QueriesSpec is the quality gate. */
  private[operators] def pqCodebooks(
      sample: Array[Array[Float]], m: Int, k: Int, iters: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "PQ training sample is empty")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sd = dim / m
    Array.tabulate(m) { j =>
      // init: evenly strided sample rows (deterministic, spread over the
      // vec_id-ordered sample); Lloyd's with empty clusters keeping their
      // previous center
      val pts = sample.map { v =>
        val p = new Array[Double](sd)
        var t = 0; while (t < sd) { p(t) = v(j * sd + t); t += 1 }; p
      }
      val centers = Array.tabulate(k)(c => pts((c.toLong * pts.length / k).toInt).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sd))
        val cnts = new Array[Int](k)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var t = 0
            while (t < sd) { val df = p(t) - centers(c)(t); d += df * df; t += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var t = 0; while (t < sd) { sums(best)(t) += p(t); t += 1 }
          cnts(best) += 1
        }
        var c = 0
        while (c < k) {
          if (cnts(c) > 0) {
            var t = 0; while (t < sd) { centers(c)(t) = sums(c)(t) / cnts(c); t += 1 }
          }
          c += 1
        }
        it += 1
      }
      centers
    }
  }

  private def ss34(spark: SparkSession, dir: String): DataFrame = {
    val M = 8; val K = 16; val Shortlist = 40
    val e = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0) // zero vectors have no cosine (ANSI: would throw)
    val sample: Array[Array[Float]] = e.orderBy("vec_id")
      .limit(2048).select("embedding", "nrm").collect()
      .map { r =>
        val v = r.getSeq[Float](0); val n = r.getDouble(1)
        val a = new Array[Float](v.length)
        var i = 0; while (i < a.length) { a(i) = (v(i) / n).toFloat; i += 1 }
        a
      }
    val cbB = spark.sparkContext.broadcast(pqCodebooks(sample, M, K, iters = 10))

    val encodeUdf = udf { (emb: Seq[Float], nrm: Double) =>
      val cb = cbB.value
      val sd = emb.length / cb.length
      Array.tabulate(cb.length) { j =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cb(j).length) {
          var d = 0.0; var t = 0
          while (t < sd) { val df = emb(j * sd + t) / nrm - cb(j)(c)(t); d += df * df; t += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        best
      }
    }
    // The query batch is the BOUNDED side (ss30-32 broadcast it for the
    // same reason), so its ADC tables are computed once on the driver and
    // broadcast as primitive arrays: the scan then reads only (vec_id,
    // codes) per corpus row — carrying the 128-double table through every
    // joined row measured 2× slower (250k rows × per-row array decode).
    // queryBatch caps the collect at QueryBatchMax rows, so the driver
    // memory and the broadcast here are fixed-size at any corpus scale.
    val cb = cbB.value
    val qRows = queryBatch(e)
      .select("vec_id", "embedding", "nrm").collect()
      .sortBy(_.getLong(0))
    val qIds: Array[Long] = qRows.map(_.getLong(0))
    val qTables: Array[Array[Double]] = qRows.map { r =>
      val emb = r.getSeq[Float](1); val nrm = r.getDouble(2)
      val m = cb.length; val k = cb(0).length; val sd = emb.length / m
      val tbl = new Array[Double](m * k)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          var d = 0.0; var t = 0
          while (t < sd) { val df = emb(j * sd + t) / nrm - cb(j)(c)(t); d += df * df; t += 1 }
          tbl(j * k + c) = d
          c += 1
        }
        j += 1
      }
      tbl
    }
    val qTablesB = spark.sparkContext.broadcast(qTables)
    // ONE generator call per corpus row scores ALL queries (M lookups
    // each) — 50× fewer UDF invocations than scoring per (row, query)
    // pair; posexplode's pos indexes back into the q_id literal array.
    val scoresUdf = udf { (codes: Seq[Int]) =>
      val ts = qTablesB.value
      val k = cb(0).length
      val out = new Array[Double](ts.length)
      var qi = 0
      while (qi < ts.length) {
        val tbl = ts(qi)
        var s = 0.0; var j = 0
        while (j < codes.length) { s += tbl(j * k + codes(j)); j += 1 }
        out(qi) = s
        qi += 1
      }
      out
    }
    val qIdLit = array(qIds.map(lit(_)): _*)

    val coded = e.select(col("vec_id"), encodeUdf(col("embedding"), col("nrm")).as("codes"))
    val wA = Window.partitionBy(col("q_id")).orderBy(col("adist"), col("vec_id"))
    val cands = coded
      .select(col("vec_id"), posexplode(scoresUdf(col("codes"))))
      .select(element_at(qIdLit, col("pos") + 1).as("q_id"),
        col("vec_id"), col("col").as("adist"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("arn", row_number().over(wA))
      .filter(col("arn") <= Shortlist)
      .select("q_id", "vec_id")
    val q = queryBatch(e)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    cands.join(e, "vec_id")
      .join(broadcast(q), "q_id")
      .select(col("q_id"), col("vec_id"),
        (VectorOps.dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
      .orderBy("q_id", "rn")
  }

  // ---------------------------------------------------------------- ss35
  /** Hybrid retrieval: lexical and vector rankings fused by reciprocal
    * rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * `rrf(d) = Σ_modality 1/(60 + rank_modality(d))`, missing-from-a-
    * modality contributing 0 — the standard "BM25 + dense" ensemble of a
    * RAG stack, here with both branches exact and deterministic so the
    * whole fusion is oracle-checkable:
    *
    *   - lexical: per-term tf·(N/df) (the tx41 log-free convention —
    *     division is IEEE-exact, no ln() cross-engine risk), summed over
    *     the query terms;
    *   - vector: exact cosine against the query embedding (the ss30
    *     codegen'd dot-product path);
    *   - each branch keeps its top-100 by (score desc, id) — a
    *     TakeOrderedAndProject, never a global sort — and ranks are
    *     assigned within that bounded candidate set, so the only
    *     unpartitioned window in the plan runs on ≤100 rows;
    *   - branches meet in a full-outer join on doc id (candidate sets
    *     need not overlap), then top-20 by fused score.
    *
    * Ties break on doc_id everywhere, so the output is total-ordered and
    * partitioning-independent. */
  private def ss35(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    val embs = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val terms = Seq("join", "filter")

    val tf = docs.select(col("doc_id"), explode(TextOps.toks("text")).as("w"))
      .filter(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val lex = tf.join(broadcast(dfreq), "w").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), ((col("tf") * col("n_docs")).cast("double") / col("df")).as("s"))
      .groupBy("doc_id").agg(sum(col("s")).as("lex_score"))
    val lexTop = lex.orderBy(col("lex_score").desc, col("doc_id")).limit(100)
      .withColumn("r_lex", row_number().over(Window.orderBy(col("lex_score").desc, col("doc_id"))))
      .select("doc_id", "r_lex")

    val q = broadcast(embs.filter(col("vec_id") === 0)
      .select(col("embedding").as("_qv"), VectorOps.norm(col("embedding")).as("_qnrm")))
    val vec = embs.withColumn("_nrm", VectorOps.norm(col("embedding")))
      .filter(col("_nrm") > 0)
      .crossJoin(q)
      .select(col("vec_id").as("doc_id"),
        (VectorOps.dot(col("_qv"), col("embedding")) / (col("_qnrm") * col("_nrm"))).as("sim"))
    val vecTop = vec.orderBy(col("sim").desc, col("doc_id")).limit(100)
      .withColumn("r_vec", row_number().over(Window.orderBy(col("sim").desc, col("doc_id"))))
      .select("doc_id", "r_vec")

    lexTop.join(vecTop, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_vec")), lit(0.0))).as("rrf"),
        coalesce(col("r_lex"), lit(0)).as("r_lex"),
        coalesce(col("r_vec"), lit(0)).as("r_vec"))
      .orderBy(col("rrf").desc, col("doc_id")).limit(20)
  }

  private val ss35Oracle =
    """WITH tk AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tk WHERE w IN ('join', 'filter') GROUP BY 1, 2),
      |dfq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      |nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      |lex AS (
      |  SELECT doc_id, SUM(CAST(tf * n_docs AS DOUBLE) / df) AS s
      |  FROM tf JOIN dfq USING (w) CROSS JOIN nd GROUP BY 1),
      |lext AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INTEGER) AS r_lex
      |  FROM (SELECT * FROM lex ORDER BY s DESC, doc_id LIMIT 100)),
      |n0 AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |n AS (SELECT * FROM n0 WHERE nrm > 0),
      |q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id = 0),
      |vec AS (
      |  SELECT vec_id AS doc_id,
      |    list_sum(list_transform(range(1, len(q_emb) + 1),
      |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / (q_nrm * nrm) AS sim
      |  FROM n CROSS JOIN q),
      |vect AS (
      |  SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INTEGER) AS r_vec
      |  FROM (SELECT * FROM vec ORDER BY sim DESC, doc_id LIMIT 100))
      |SELECT COALESCE(lext.doc_id, vect.doc_id) AS doc_id,
      |  COALESCE(CAST(1 AS DOUBLE) / (60 + r_lex), 0) + COALESCE(CAST(1 AS DOUBLE) / (60 + r_vec), 0) AS rrf,
      |  COALESCE(r_lex, 0) AS r_lex, COALESCE(r_vec, 0) AS r_vec
      |FROM lext FULL OUTER JOIN vect ON lext.doc_id = vect.doc_id
      |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- ss36
  /** kNN label-prediction eval — the standard "is this embedding space
    * any good" probe of an embedding pipeline (kNN-classification recall
    * of labeled vectors, cf. the evaluation protocol in Jégou et al.,
    * TPAMI 2011): each query in the fixed batch takes its exact top-10
    * cosine neighbors (the ss30 codegen'd path — never the query's own
    * row), the neighbors vote with their `label`, majority wins with a
    * deterministic smallest-label tie-break, and the verdict is compared
    * to the query's own label. Output is one row per query — the
    * aggregate accuracy is a trivial AVG over it, but the per-query form
    * is what an eval harness joins back to error-analyze.
    *
    * Scale shape: everything rides the bounded query batch (broadcast)
    * against one corpus scan, then per-query vote aggs on <= k·batch
    * rows. Fully deterministic → exact DuckDB oracle. */
  private def ss36(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val top = graft.api.Ops.cosineTopK(
      corpus = e.select("vec_id", "embedding"),
      queries = queryBatch(normFiltered(e)).select("vec_id", "embedding"),
      idCol = "vec_id", vecCol = "embedding", k = 10)
    val labels = e.select(col("vec_id"), col("label"))
    val votes = top.join(labels, "vec_id")
      .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("q_id").orderBy(col("votes").desc, col("label"))
    val pred = votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("label").as("pred_label"), col("votes"))
    pred.join(labels.select(col("vec_id").as("q_id"), col("label").as("true_label")), "q_id")
      .select(col("q_id"), col("true_label"), col("pred_label"), col("votes"),
        (col("pred_label") === col("true_label")).cast("int").as("correct"))
      .orderBy("q_id")
  }

  private val ss36Oracle =
    """WITH n0 AS (
      |  SELECT vec_id, embedding, label,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |n AS (SELECT * FROM n0 WHERE nrm > 0),
      |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n
      |      WHERE vec_id % 100 = 0 ORDER BY vec_id LIMIT 64),
      |s AS (
      |  SELECT q_id, vec_id,
      |    list_sum(list_transform(range(1, len(q_emb) + 1),
      |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / (q_nrm * nrm) AS sim
      |  FROM q JOIN n ON vec_id <> q_id),
      |topk AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
      |    FROM s) t WHERE rn <= 10),
      |v AS (
      |  SELECT t.q_id, e.label, COUNT(*) AS votes
      |  FROM topk t JOIN embeddings e ON e.vec_id = t.vec_id GROUP BY 1, 2),
      |p AS (
      |  SELECT q_id, label AS pred_label, votes FROM (
      |    SELECT q_id, label, votes,
      |      row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, label) AS rn
      |    FROM v) t WHERE rn = 1)
      |SELECT p.q_id, e.label AS true_label, p.pred_label, CAST(p.votes AS BIGINT) AS votes,
      |  CAST(p.pred_label = e.label AS INTEGER) AS correct
      |FROM p JOIN embeddings e ON e.vec_id = p.q_id ORDER BY q_id""".stripMargin

  // ------------------------------------------------- ss37/ss38/ss39
  /** The PARTIAL ORACLE for the index-dependent ANN queries: their
    * returned id SETS are not SQL-reproducible (bucket/centroid/codebook
    * dependent), but two invariants are, and this query oracles exactly
    * those — per query vector it emits
    * `(q_id, score_mismatches, recall_floor_met)` where
    *
    *   - `score_mismatches` counts returned rows whose engine-reported
    *     `sim` disagrees (>1e-6) with the cosine RECOMPUTED through
    *     Spark's built-in `zip_with`/`aggregate` arithmetic — an
    *     independent code path from the custom [[VectorOps]] expressions
    *     the ANN ran, so it cross-checks the codegen'd kernels too;
    *     a returned id that doesn't exist in the corpus counts here;
    *   - `recall_floor_met` pins mean recall@5 against the EXACT top-5
    *     (the ss30 brute-force path) at the same floor the quality spec
    *     enforces, averaged over every query-batch vector so silently
    *     dropped queries score 0.
    *
    * The DuckDB oracle recomputes the query batch relationally and
    * expects `(q_id, 0, TRUE)` per query vector — any score drift,
    * phantom id, dropped query, or recall regression breaks the
    * hash-match. All joins are bounded: the batch is [[QueryBatchMax]]
    * rows, returned sets are k per query. */
  private def annVerify(spark: SparkSession, dir: String, ann: DataFrame,
      floor: Double): DataFrame = {
    val eRaw = Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    val e = eRaw.withColumn("nrm", VectorOps.norm(col("embedding")))
      .filter(col("nrm") > 0)
    val qb = queryBatch(e).select(col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    // independent arithmetic: built-in higher-order functions, not VectorOps
    def dotIndep(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val returned = ann.select("q_id", "vec_id", "sim")
    val matched = returned
      .join(broadcast(qb), Seq("q_id"))
      .join(e.select(col("vec_id"), col("embedding"), col("nrm")), Seq("vec_id"))
      .withColumn("sim_indep",
        dotIndep(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .groupBy("q_id")
      .agg(sum(when(abs(col("sim") - col("sim_indep")) > 1e-6, 1L).otherwise(0L))
          .as("bad_scores"),
        count(lit(1)).as("n_matched"))
    val nReturned = returned.groupBy("q_id").agg(count(lit(1)).as("n_returned"))
    val exact5 = graft.api.Ops.cosineTopK(corpus = eRaw,
        queries = queryBatch(normFiltered(eRaw)),
        idCol = "vec_id", vecCol = "embedding", k = 5)
      .select(col("q_id"), col("vec_id"))
    val hits = exact5.join(returned.select("q_id", "vec_id"), Seq("q_id", "vec_id"))
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    val recallPerQ = exact5.groupBy("q_id").agg(count(lit(1)).as("want"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), (coalesce(col("hits"), lit(0L)).cast("double") /
        least(col("want"), lit(5L)).cast("double")).as("recall"))
    // a bounded driver scalar: the batch is <= QueryBatchMax rows
    val meanRecall = recallPerQ.agg(avg(col("recall"))).collect()(0).getDouble(0)
    qb.select("q_id")
      .join(matched, Seq("q_id"), "left")
      .join(nReturned, Seq("q_id"), "left")
      .select(col("q_id"),
        (coalesce(col("bad_scores"), lit(0L)) +
          (coalesce(col("n_returned"), lit(0L)) - coalesce(col("n_matched"), lit(0L))))
          .as("score_mismatches"),
        lit(meanRecall >= floor).as("recall_floor_met"))
      .orderBy("q_id")
  }

  /** One oracle serves all three verify queries: the query batch is the
    * only relationally-derived part, and the expected verdict per vector
    * is the constant `(0, TRUE)`. */
  private val annVerifyOracle =
    """WITH n0 AS (
      |  SELECT vec_id,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id FROM n0 WHERE nrm > 0 AND vec_id % 100 = 0
      |      ORDER BY vec_id LIMIT 64)
      |SELECT q_id, CAST(0 AS BIGINT) AS score_mismatches, TRUE AS recall_floor_met
      |FROM q ORDER BY q_id""".stripMargin

  private def ss37(spark: SparkSession, dir: String): DataFrame =
    annVerify(spark, dir, ss31(spark, dir), floor = 0.4)
  private def ss38(spark: SparkSession, dir: String): DataFrame =
    annVerify(spark, dir, ss32(spark, dir), floor = 0.5)
  private def ss39(spark: SparkSession, dir: String): DataFrame =
    annVerify(spark, dir, ss34(spark, dir), floor = 0.5)

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("ss30_cosine_topk", ss30, Some(ss30Oracle)),
    GraftQuery("ss31_ann_lsh_topk", ss31, None),
    GraftQuery("ss32_ann_ivf_topk", ss32, None),
    GraftQuery("ss33_quantize_int8", ss33, Some(ss33Oracle)),
    GraftQuery("ss34_ann_pq_topk", ss34, None),
    GraftQuery("ss35_rrf_fusion", ss35, Some(ss35Oracle)),
    GraftQuery("ss36_knn_label_eval", ss36, Some(ss36Oracle)),
    GraftQuery("ss37_ann_lsh_verify", ss37, Some(annVerifyOracle)),
    GraftQuery("ss38_ann_ivf_verify", ss38, Some(annVerifyOracle)),
    GraftQuery("ss39_ann_pq_verify", ss39, Some(annVerifyOracle)))
}
