package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}
import graft.functions.{TextHash, VectorOps}

/** Deduplication operators over `documents` / `embeddings`:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup. All candidate generation is hash/band-bucketed (never a raw
  * n² self-join on the full table), so each op survives a 100× scale-up:
  * cost is O(n · sig) + O(Σ bucket²) with bucket sizes controlled by the
  * banding parameters.
  */
object Dedup {

  // ---------------------------------------------------------------- dd25
  /** Exact dedup: group identical texts, keep the smallest doc_id.
    * (dropDuplicates keeps an arbitrary row — this form is deterministic.) */
  private def dd25(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select("doc_id", "text")
      .groupBy("text")
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_copies"))
      .select("kept_doc_id", "n_copies")
      .orderBy("kept_doc_id")

  private val dd25Oracle =
    """SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY text ORDER BY kept_doc_id""".stripMargin

  // ---------------------------------------------------------------- dd26
  /** MinHash + LSH near-dup detection (Broder, "On the resemblance and
    * containment of documents", SEQUENCES 1997; banding analysis per
    * Rajaraman & Ullman, Mining of Massive Datasets ch. 3): tight-loop
    * signature UDF per doc,
    * native-expression banding, bucket self-join for candidates, exact
    * Jaccard verification over sorted-hash shingle sets. Shuffle cost is
    * bounded by band-bucket sizes; the shingle sets are re-joined by id
    * only for the (few) candidate pairs. See [[graft.api.Ops.minhashDupPairs]].
    *
    * Oracled against the brute-force all-pairs Jaccard: verification is
    * exact, so precision is 1 by construction, and recall is a banding
    * property. The oracle gate is what forces the band choice here:
    * rowsPerBand = 2 (32 bands of 2) puts P(catch) = 1-(1-J^2)^32 at
    * 0.99990 even for a pair sitting EXACTLY at the J = 0.5 threshold
    * (and ~1-1e-28 at the J >= 0.9 every sf0.01 pair actually has),
    * where the default 16x4 banding would catch a borderline pair with
    * p = 0.64 — too flappy to hard-gate. Narrower bands cost more
    * candidate pairs, which the exact verify absorbs; the OUTPUT is
    * banding-independent whenever recall holds, so the oracle compares
    * apples to apples.
    */
  private def dd26(spark: SparkSession, dir: String): DataFrame =
    graft.api.Ops.minhashDupPairs(
        Tables(spark, dir, "documents"), idCol = "doc_id", textCol = "text",
        k = 64, rowsPerBand = 2, threshold = 0.5)
      .orderBy("a_id", "b_id")

  /** Exact all-pairs shingle Jaccard (same distinct word-3-gram sets as the
    * engine's hashed form — identical counts absent 64-bit collisions, the
    * same equivalence dd28's oracle already rides). */
  private val dd26Oracle =
    """WITH g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [] END AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents) t),
      |ne AS (SELECT * FROM g WHERE len(sh) > 0)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.sh, b.sh))
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      |FROM ne a JOIN ne b ON a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh))
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // ---------------------------------------------------------------- dd27
  /** SimHash near-dup (Charikar, "Similarity estimation techniques from
    * rounding algorithms", STOC 2002): 64-bit signature over token hashes,
    * 4 16-bit bands
    * for candidates (any pair within Hamming distance 3 shares at least
    * one intact band by pigeonhole... with 4 bands and ≤3 differing bits),
    * verified with native bit_count. */
  private def dd27(spark: SparkSession, dir: String): DataFrame =
    graft.api.Ops.simhashDupPairs(
        Tables(spark, dir, "documents"), idCol = "doc_id", textCol = "text", maxHamming = 3)
      .orderBy("a_id", "b_id")

  // ---------------------------------------------------------------- dd28
  /** Exact n-gram Jaccard within `source` blocks, with PPJoin-style prefix
    * filtering for candidate generation (Chaudhuri et al., "A primitive
    * operator for similarity joins", ICDE 2006; Xiao et al., "Efficient
    * similarity joins for near duplicate detection", WWW 2008):
    * two sets with Jaccard >= 0.5 must share |A∩B| >= (|A|+|B|)/3 hashes,
    * and with the size-ratio constraint |B| >= |A|/2 that overlap is at
    * least ⌈|A|/2⌉ — so any qualifying pair shares a hash within the first
    * ⌊|A|/2⌋+1 elements of each SORTED hash set. Candidates come from an
    * equi-join on exploded prefix hashes (cost ∝ matching prefixes, not
    * block²), then exact merge-walk verification. Exactness-preserving:
    * the prefix theorem guarantees every qualifying pair survives
    * candidate generation, and verification is exact — same results as the
    * all-pairs form, same DuckDB oracle. */
  private def dd28(spark: SparkSession, dir: String): DataFrame =
    graft.api.Ops.jaccardDupPairs(
        Tables(spark, dir, "documents"), idCol = "doc_id", textCol = "text",
        blockCol = Some("source"), threshold = 0.5)
      .orderBy("a_id", "b_id")

  private val dd28Oracle =
    """WITH g AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [] END AS sh
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents) t)
      |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  len(list_intersect(a.sh, b.sh))
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
      |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE len(list_intersect(a.sh, b.sh))
      |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
      |ORDER BY a_id, b_id""".stripMargin

  // ---------------------------------------------------------------- dd29
  /** Embedding-cosine near-dup: exact pairs above a similarity threshold,
    * via [[graft.api.Ops.cosineDupPairs]] — pivot-blocked candidate
    * generation (exactness-preserving metric pruning + equi-join grid;
    * never a full×full BroadcastNestedLoopJoin — PlanSpec pins this).
    * Results are bit-identical to the all-pairs form, so the oracle is
    * unchanged; the approximate path for corpora where n² verification is
    * unaffordable is Similarity's LSH variant. */
  private def dd29(spark: SparkSession, dir: String): DataFrame =
    graft.api.Ops.cosineDupPairs(
        Tables(spark, dir, "embeddings"), idCol = "vec_id", vecCol = "embedding",
        threshold = 0.4)
      .orderBy("a_id", "b_id")

  private val dd29Oracle =
    """WITH n0 AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |n AS (SELECT * FROM n0 WHERE nrm > 0)
      |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
      |  list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) AS cos_sim
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY a_id, b_id""".stripMargin

  // ---------------------------------------------------------------- dd30
  /** Near-dup clusters: exact-Jaccard pairs (PPJoin prefix filter, no
    * block restriction) → connected components → one canonical doc per
    * duplicate cluster. The step that turns pairwise similarity into an
    * actual training-set dedup decision.
    *
    * Built on [[graft.api.Ops.jaccardDupPairs]] (exactness-preserving
    * candidates) rather than the MinHash pairs dd26 uses, so the WHOLE
    * pipeline — candidate generation, verification, clustering — is
    * deterministic and oracle-checked: the DuckDB side recomputes the
    * same pair set relationally and closes it with a recursive CTE
    * (min-label = min over the transitive closure). */
  private def dd30(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.api.Ops.jaccardDupPairs(
      Tables(spark, dir, "documents"), idCol = "doc_id", textCol = "text",
      blockCol = None, threshold = 0.5)
    graft.api.Ops.connectedComponents(pairs, "a_id", "b_id")
      .select(col("id").as("doc_id"), col("comp").as("cluster_rep"))
      .withColumn("is_canonical", (col("doc_id") === col("cluster_rep")).cast("int"))
      .orderBy("cluster_rep", "doc_id")
  }

  /** Pair generation mirrors dd28's oracle but via unnest→equi-join→count
    * (only pairs sharing >= 1 shingle are touched — the oracle-side analog
    * of the prefix filter); the closure is a recursive CTE. */
  private val dd30Oracle =
    """WITH RECURSIVE g AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1),
      |             i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [] END AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents) t),
      |sh AS (SELECT doc_id, len(sh) AS sz, unnest(sh) AS h FROM g WHERE len(sh) > 0),
      |inter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.sz AS sza, b.sz AS szb, COUNT(*) AS i
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |pairs AS (SELECT a_id, b_id FROM inter WHERE i / (sza + szb - i) >= 0.5),
      |nodes AS (SELECT a_id AS id FROM pairs UNION SELECT b_id AS id FROM pairs),
      |edges AS (SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id AS u, a_id AS v FROM pairs),
      |reach(id, r) AS (
      |  SELECT id, id FROM nodes
      |  UNION
      |  SELECT e.v, reach.r FROM reach JOIN edges e ON reach.id = e.u)
      |SELECT id AS doc_id, MIN(r) AS cluster_rep,
      |  CAST(CASE WHEN id = MIN(r) THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
      |FROM reach GROUP BY id ORDER BY cluster_rep, doc_id""".stripMargin

  // ---------------------------------------------------------------- dd31
  /** Normalization-keyed dedup: lowercase, strip punctuation, collapse
    * whitespace, then exact-group on the md5 of the normal form — the
    * "fuzzy-exact" tier between dd25 (byte-exact) and dd26 (MinHash).
    * One hash agg on a 16-byte key; the cheapest near-dup pass at 100 TB. */
  private def dd31(spark: SparkSession, dir: String): DataFrame = {
    // Char-pass UDF, not regexp_replace(lower(..)): the regex NFA pass was
    // the r2 bench's single worst line (12.5 s — 29% of the visible
    // total). Output is byte-identical on this corpus (QueriesSpec pins
    // UDF == regex on the real table; TextHashSpec on unit cases), so the
    // DuckDB oracle keeps its regex form.
    val norm = TextHash.normalizeUdf(col("text"))
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      .select(col("doc_id"), md5(encode(norm, "UTF-8")).as("norm_key"))
      .groupBy("norm_key")
      .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_copies"))
      .select("kept_doc_id", "n_copies", "norm_key")
      .orderBy("kept_doc_id")
  }

  private val dd31Oracle =
    """SELECT MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies,
      |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS norm_key
      |FROM documents
      |GROUP BY 3 ORDER BY kept_doc_id""".stripMargin

  // ---------------------------------------------------------------- dd32
  /** Exact-substring chunk dedup (the distributed shape of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL 2022):
    * each document is cut into consecutive non-overlapping 10-word chunks,
    * chunks are keyed by md5, and a chunk instance counts as duplicated
    * when its key occurs more than once in the WHOLE corpus. Output is the
    * per-doc duplicated-chunk fraction — the signal pipelines threshold on
    * to drop boilerplate-heavy docs that exact/doc-level dedup misses.
    *
    * Scale shape: one (16-byte-key) hash agg for global chunk counts +
    * one co-partitioned shuffle join back to chunk instances — no windows,
    * no self-join; cost is linear in corpus tokens. */
  def chunkDupFraction(docs: DataFrame, idCol: String, textCol: String,
      chunkWords: Int = 10): DataFrame = {
    val cw = chunkWords
    val w = docs
      .select(col(idCol).as("doc_id"), TextOps.toks(textCol).as("ws"))
      .filter(size(col("ws")) > 0)
    val chunks = w.select(col("doc_id"),
        explode(transform(
          sequence(lit(0), floor((size(col("ws")) + lit(cw - 1)) / lit(cw)).cast("int") - 1),
          i => md5(encode(array_join(slice(col("ws"), i * cw + 1, lit(cw)), " "), "UTF-8"))))
          .as("k"))
    val global = chunks.groupBy("k").agg(count(lit(1)).as("cnt"))
    chunks.join(global, "k")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("cnt") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_chunk_frac",
        col("n_dup_chunks").cast("double") / col("n_chunks"))
  }

  private def dd32(spark: SparkSession, dir: String): DataFrame =
    chunkDupFraction(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val dd32Oracle =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0),
      |c AS (
      |  SELECT doc_id, unnest(list_transform(range(0, (len(ws) + 9) // 10),
      |    i -> md5(array_to_string(ws[i*10+1:i*10+10], ' ')))) AS k
      |  FROM w),
      |g AS (SELECT k, COUNT(*) AS cnt FROM c GROUP BY 1),
      |d AS (
      |  SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |    CAST(SUM(CASE WHEN g.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
      |  FROM c JOIN g USING (k) GROUP BY 1)
      |SELECT doc_id, n_chunks, n_dup_chunks,
      |  CAST(n_dup_chunks AS DOUBLE) / n_chunks AS dup_chunk_frac
      |FROM d ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- dd34
  /** Incremental dedup: decide each document of a NEW batch against the
    * historical corpus plus the batch itself, without ever re-comparing
    * corpus×corpus — the daily-ingest regime of a production pipeline
    * (the corpus is already deduplicated; re-running a full-corpus dedup
    * per day would be quadratic in history).
    *
    * Keys are the dd31 normalization hash, so "duplicate" here means
    * normalized-exact. Scale shape: the corpus contributes only its
    * 16-byte KEY TABLE (the dedup index a production pipeline keeps
    * materialized between runs — at 100 TB text that index is ~1% of the
    * data), the increment joins it co-partitioned by key, and the
    * within-batch tier is one hash agg on the (small) increment. The
    * near-dup counterpart indexes corpus MinHash bands once and probes
    * them with increment signatures — same band join as
    * [[graft.api.Ops.minhashDupPairs]], increment×bands instead of
    * self×self.
    *
    * Output, per increment doc: dup_of_corpus / dup_in_increment flags
    * and the final keep decision (kept = new key AND first holder of it
    * in the batch). */
  def incrementalDedup(corpus: DataFrame, increment: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def k(t: org.apache.spark.sql.Column) = md5(encode(TextHash.normalizeUdf(t), "UTF-8"))
    val ck = corpus.select(k(col(textCol)).as("k")).distinct()
      .withColumn("_inCorpus", lit(1))
    val ik = increment.select(col(idCol).as("doc_id"), k(col(textCol)).as("k"))
    val firstInInc = ik.groupBy("k").agg(min("doc_id").as("_first"))
    ik.join(firstInInc, "k")
      .join(ck, Seq("k"), "left")
      .select(col("doc_id"),
        when(col("_inCorpus").isNotNull, 1).otherwise(0).as("dup_of_corpus"),
        when(col("doc_id") =!= col("_first"), 1).otherwise(0).as("dup_in_increment"),
        when(col("_inCorpus").isNull && col("doc_id") === col("_first"), 1)
          .otherwise(0).as("kept"))
  }

  private def dd34(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    incrementalDedup(
        corpus = docs.filter(col("doc_id") % 5 =!= 0),
        increment = docs.filter(col("doc_id") % 5 === 0),
        idCol = "doc_id", textCol = "text")
      .orderBy("doc_id")
  }

  private val dd34Oracle =
    """WITH inc AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k
      |  FROM documents WHERE doc_id % 5 = 0),
      |corp AS (
      |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS k
      |  FROM documents WHERE doc_id % 5 <> 0),
      |f AS (SELECT k, MIN(doc_id) AS first_id FROM inc GROUP BY 1)
      |SELECT inc.doc_id,
      |  CASE WHEN corp.k IS NOT NULL THEN 1 ELSE 0 END AS dup_of_corpus,
      |  CASE WHEN inc.doc_id <> f.first_id THEN 1 ELSE 0 END AS dup_in_increment,
      |  CASE WHEN corp.k IS NULL AND inc.doc_id = f.first_id THEN 1 ELSE 0 END AS kept
      |FROM inc JOIN f USING (k) LEFT JOIN corp ON inc.k = corp.k
      |ORDER BY inc.doc_id""".stripMargin

  // ---------------------------------------------------------------- dd33
  /** Semantic dedup (the SemDeDup shape — Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic deduplication",
    * arXiv:2303.09540): assign each embedding to its nearest centroid by
    * cosine, then inside each cluster greedily keep the lowest-id member
    * of every cosine-ε ball. Pairwise comparison happens only WITHIN
    * clusters, so the n² a full cosine dedup would cost collapses to
    * Σ cluster²; with k ∝ n (production: k-means centroids trained on a
    * sample — the IVF path in [[Similarity]]) per-cluster size stays
    * bounded and total cost is ~linear in n.
    *
    * Assignment is one broadcast join + ONE hash agg (`max_by` over a
    * `(cos, -cid)` struct — map-side partial agg with a deterministic
    * smallest-cid tie-break; no n×k window shuffle). The in-cluster pair
    * join shuffles by cluster key only. All float math is the ordered-fold
    * dot product, so any centroid frame that is itself deterministic makes
    * the whole decision bitwise-reproducible by the oracle.
    *
    * `centroids` must carry (cid, cv, cnrm). Zero-norm vectors are
    * excluded (no cosine direction). Output: (vec_id, cluster, kept). */
  def semanticDedup(embs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, threshold: Double): DataFrame = {
    val n = embs.select(col(idCol).as("vec_id"), col(vecCol).as("_v"))
      .withColumn("_nrm", VectorOps.norm(col("_v")))
      .filter(col("_nrm") > 0)
    // One pass: nearest centroid per vector. The materialized assignment
    // feeds both pair-join sides and the final projection (localCheckpoint
    // — blocks released when unreferenced, same rationale as cosineDupPairs).
    val asg = n.crossJoin(broadcast(centroids.select(col("cid"), col("cv"), col("cnrm"))))
      .select(col("vec_id"), col("_v"), col("_nrm"), col("cid"),
        (VectorOps.dot(col("_v"), col("cv")) / (col("_nrm") * col("cnrm"))).as("_cos"))
      .groupBy("vec_id")
      .agg(
        max_by(col("cid"), struct(col("_cos"), (-col("cid")).as("_t"))).as("cluster"),
        first(col("_v")).as("_v"), first(col("_nrm")).as("_nrm"))
      .localCheckpoint(true)
    val a = asg.select(col("vec_id").as("a_id"), col("_v").as("_va"),
      col("_nrm").as("_na"), col("cluster"))
    val b = asg.select(col("vec_id").as("b_id"), col("_v").as("_vb"),
      col("_nrm").as("_nb"), col("cluster"))
    val removed = a.join(b, "cluster")
      .filter(col("a_id") < col("b_id"))
      .filter(VectorOps.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")) >= threshold)
      .select(col("b_id")).distinct()
    asg.select(col("vec_id"), col("cluster"))
      .join(removed, col("vec_id") === col("b_id"), "left")
      .select(col("vec_id"), col("cluster"),
        when(col("b_id").isNull, 1).otherwise(0).as("kept"))
  }

  private def dd33(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("_nrm", VectorOps.norm(col("embedding")))
      .filter(col("_nrm") > 0)
    // Deterministic centroids — the k lowest-id vectors — so the oracle
    // can replay the assignment exactly; at scale swap in sampled k-means.
    val cents = base.orderBy("vec_id").limit(8)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"), col("_nrm").as("cnrm"))
    semanticDedup(Tables(spark, dir, "embeddings"), "vec_id", "embedding",
        cents, threshold = 0.5)
      .orderBy("vec_id")
  }

  private val dd33Oracle =
    """WITH n0 AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |n AS (SELECT * FROM n0 WHERE nrm > 0),
      |c AS (SELECT vec_id AS cid, embedding AS cv, nrm AS cnrm FROM n ORDER BY vec_id LIMIT 8),
      |sc AS (
      |  SELECT n.vec_id, c.cid,
      |    list_sum(list_transform(range(1, len(n.embedding) + 1),
      |      i -> CAST(n.embedding[i] AS DOUBLE) * CAST(c.cv[i] AS DOUBLE))) / (n.nrm * c.cnrm) AS cos
      |  FROM n CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, cid AS cluster FROM (
      |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      |    FROM sc) WHERE rn = 1),
      |m AS (SELECT n.vec_id, asg.cluster, n.embedding, n.nrm FROM n JOIN asg USING (vec_id)),
      |rm AS (
      |  SELECT DISTINCT b.vec_id AS b_id
      |  FROM m a JOIN m b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      |  WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / (a.nrm * b.nrm) >= 0.5)
      |SELECT m.vec_id, m.cluster, CASE WHEN rm.b_id IS NULL THEN 1 ELSE 0 END AS kept
      |FROM m LEFT JOIN rm ON m.vec_id = rm.b_id
      |ORDER BY m.vec_id""".stripMargin

  // ---------------------------------------------------------------- dd35
  /** Edit-distance fuzzy dedup: all document pairs within Levenshtein
    * distance 10 (the injected near-dup pairs sit at distance 4-8; the
    * nearest non-dup pair is at 38, so the threshold is comfortably
    * inside the gap). Candidates via exactness-preserving length-band +
    * q-gram count filtering, exact banded DP verify — see
    * [[graft.api.Ops.editDistanceDupPairs]]. The oracle states the plain
    * semantics (all pairs with levenshtein <= 10); its length-band
    * predicate is implied by the threshold, not an approximation. */
  private def dd35(spark: SparkSession, dir: String): DataFrame =
    graft.api.Ops.editDistanceDupPairs(
        Tables(spark, dir, "documents"), idCol = "doc_id", textCol = "text",
        maxDist = 10)
      .orderBy("a_id", "b_id")

  private val dd35Oracle =
    """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
      |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
      |FROM documents a JOIN documents b
      |  ON a.doc_id < b.doc_id
      |  AND abs(length(a.text) - length(b.text)) <= 10
      |WHERE levenshtein(a.text, b.text) <= 10
      |ORDER BY a_id, b_id""".stripMargin

  // ---------------------------------------------------------------- dd36
  /** Soft dedup: down-WEIGHT duplicates instead of dropping them — every
    * document survives with sampling weight 1/n_copies over its
    * normalized-duplicate group (He et al., "SoftDedup: an efficient data
    * reweighting method for speeding up language model pre-training",
    * ACL 2024 — the reweighting alternative to hard removal when repeated
    * data still carries signal, cf. Muennighoff et al., "Scaling
    * data-constrained language models", NeurIPS 2023).
    *
    * Scale shape: one window count over a 16-byte md5 key — a single hash
    * shuffle, no join, no second pass; the per-row weight is a codegen'd
    * projection. At 100 TB this is the same cost as dd31's group-agg but
    * keeps every row, so it composes with a downstream weighted sampler. */
  private def dd36(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = TextHash.normalizeUdf(col("text"))
    val w = Window.partitionBy(col("norm_key"))
    Tables(spark, dir, "documents").select(col("doc_id"),
        md5(encode(norm, "UTF-8")).as("norm_key"))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col("doc_id"), col("n_copies"),
        round(lit(1.0) / col("n_copies"), 9).as("weight"))
      .orderBy("doc_id")
  }

  private val dd36Oracle =
    """SELECT doc_id, n_copies, ROUND(CAST(1 AS DOUBLE) / n_copies, 9) AS weight
      |FROM (
      |  SELECT doc_id, COUNT(*) OVER (PARTITION BY
      |      md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS n_copies
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("dd25_dedup_exact", dd25, Some(dd25Oracle)),
    GraftQuery("dd26_dedup_minhash_lsh", dd26, Some(dd26Oracle)),
    GraftQuery("dd27_dedup_simhash", dd27, None),
    GraftQuery("dd28_dedup_ngram_jaccard", dd28, Some(dd28Oracle)),
    GraftQuery("dd29_dedup_embedding_cosine", dd29, Some(dd29Oracle)),
    GraftQuery("dd30_dedup_clusters", dd30, Some(dd30Oracle)),
    GraftQuery("dd31_dedup_normalized", dd31, Some(dd31Oracle)),
    GraftQuery("dd32_dedup_chunk_substr", dd32, Some(dd32Oracle)),
    GraftQuery("dd33_dedup_semantic", dd33, Some(dd33Oracle)),
    GraftQuery("dd34_dedup_incremental", dd34, Some(dd34Oracle)),
    GraftQuery("dd35_dedup_editdist", dd35, Some(dd35Oracle)),
    GraftQuery("dd36_dedup_soft_weight", dd36, Some(dd36Oracle)))
}
