package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftQuery, Tables}

/** Text-analysis operators over `documents`: word count (the reference's
  * one and only job, both as a relational pipeline and through the
  * generalized MapReducer API), language ID, quality scoring, token
  * counting, and fingerprinting.
  */
object TextOps {

  private[graft] def toks(c: String) = filter(split(col(c), " "), t => t =!= "")

  // ---------------------------------------------------------------- q22
  /** WordCount, relational form: explode → hash agg. Codegen'd end-to-end;
    * this is the plan Spark picks naturally and the fastest at scale
    * (map-side partial count before the shuffle). Reference behavior:
    * src/implm/word_count.rs:5-25 with GLOBAL (not per-chunk) scope. */
  private def q22(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select("text")
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  private val wordcountOracle =
    """SELECT w AS word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents) t
      |WHERE w <> '' GROUP BY w ORDER BY word""".stripMargin

  // ---------------------------------------------------------------- q23
  /** WordCount through the MapReducer API (the reference's user surface,
    * src/map_reduce.rs:4-7) — flatMap → shuffle → reduce with map-side
    * combine. Same oracle as q22: the two paths must agree. */
  private def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.core.{MapReduce, WordCount}
    val input = Tables(spark, dir, "documents")
      .select(col("doc_id").cast("string"), col("text"))
      .as[(String, String)]
    MapReduce.runAssociative(input, WordCount)
      .toDF("word", "cnt")
      .orderBy("word")
  }

  // ---------------------------------------------------------------- tx32
  /** Language ID by marker-token scoring (n-gram/stopword heuristic shape;
    * markers chosen from the synthetic vocabulary). Deterministic argmax
    * with a fixed preference chain on ties. */
  private def tx32(spark: SparkSession, dir: String): DataFrame = {
    def score(marker: String) = size(filter(toks("text"), t => t === marker))
    val sEn = score("the"); val sEs = score("value"); val sZh = score("join")
    val sDe = score("hash"); val sFr = score("scan")
    val pred = when(sEn >= sEs && sEn >= sZh && sEn >= sDe && sEn >= sFr, "en")
      .when(sEs >= sZh && sEs >= sDe && sEs >= sFr, "es")
      .when(sZh >= sDe && sZh >= sFr, "zh")
      .when(sDe >= sFr, "de")
      .otherwise("fr")
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"))
      .select(col("doc_id"), pred.as("pred_lang"), col("lang"),
        (pred === col("lang")).cast("int").as("correct"))
      .orderBy("doc_id")
  }

  private val tx32Oracle =
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    len(list_filter(string_split(text, ' '), t -> t = 'the'))   AS s_en,
      |    len(list_filter(string_split(text, ' '), t -> t = 'value')) AS s_es,
      |    len(list_filter(string_split(text, ' '), t -> t = 'join'))  AS s_zh,
      |    len(list_filter(string_split(text, ' '), t -> t = 'hash'))  AS s_de,
      |    len(list_filter(string_split(text, ' '), t -> t = 'scan'))  AS s_fr
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, lang,
      |    CASE WHEN s_en >= s_es AND s_en >= s_zh AND s_en >= s_de AND s_en >= s_fr THEN 'en'
      |         WHEN s_es >= s_zh AND s_es >= s_de AND s_es >= s_fr THEN 'es'
      |         WHEN s_zh >= s_de AND s_zh >= s_fr THEN 'zh'
      |         WHEN s_de >= s_fr THEN 'de'
      |         ELSE 'fr' END AS pred_lang
      |  FROM s)
      |SELECT doc_id, pred_lang, lang, CAST(pred_lang = lang AS INTEGER) AS correct
      |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx33
  /** Quality scoring: length / type-token ratio / stopword-ratio features
    * composed into a deterministic score. */
  private def tx33(spark: SparkSession, dir: String): DataFrame = {
    val t = toks("text")
    val nWords = size(t)
    val nUniq = size(array_distinct(t))
    val sumLen = aggregate(t, lit(0), (acc, x) => acc + length(x))
    val nStop = size(filter(t, x => x === "the" || x === "a"))
    // Empty/whitespace-only docs have nWords = 0: guard every ratio (ANSI
    // mode throws DIVIDE_BY_ZERO otherwise); such rows emit null metrics.
    def safe(c: org.apache.spark.sql.Column) = when(nWords > 0, c)
    val ttr = nUniq / nWords
    val quality = ttr * least(nWords, lit(100)) / lit(100.0)
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        nUniq.as("n_uniq"),
        safe(sumLen.cast("double") / nWords).as("avg_word_len"),
        safe(ttr).as("ttr"),
        safe(nStop / nWords).as("stop_ratio"),
        safe(quality).as("quality"))
      .orderBy("doc_id")
  }

  private val tx33Oracle =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(tk) AS INTEGER) AS n_words,
      |  CAST(len(list_distinct(tk)) AS INTEGER) AS n_uniq,
      |  CASE WHEN len(tk) > 0 THEN CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) / len(tk) END AS avg_word_len,
      |  CASE WHEN len(tk) > 0 THEN len(list_distinct(tk)) / len(tk) END AS ttr,
      |  CASE WHEN len(tk) > 0 THEN len(list_filter(tk, x -> x = 'the' OR x = 'a')) / len(tk) END AS stop_ratio,
      |  CASE WHEN len(tk) > 0 THEN len(list_distinct(tk)) / len(tk) * least(len(tk), 100) / CAST(100 AS DOUBLE) END AS quality
      |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx34
  /** Token counting: whitespace tokens plus a BPE-ish regex tokenizer. */
  private def tx34(spark: SparkSession, dir: String): DataFrame = {
    val nWs = size(toks("text"))
    val nAlpha = size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0)))
    val nBpe = size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"), col("n_chars"))
      .select(
        col("doc_id"),
        nWs.as("n_ws_tokens"),
        nAlpha.as("n_alpha_tokens"),
        nBpe.as("n_bpe_tokens"),
        length(col("text")).as("text_len"),
        when(nWs > 0, length(col("text")).cast("double") / nWs).as("chars_per_token"))
      .orderBy("doc_id")
  }

  private val tx34Oracle =
    """SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INTEGER) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_alpha_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER) AS n_bpe_tokens,
      |  CAST(length(text) AS INTEGER) AS text_len,
      |  CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
      |       THEN CAST(length(text) AS DOUBLE) / len(list_filter(string_split(text, ' '), x -> x <> '')) END AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx35
  /** Document fingerprinting: md5 over whitespace-normalized lowercase text
    * (the SQL-checkable fingerprint; a Karp–Rabin rolling hash lives in
    * graft.functions.TextHash with its own unit tests). */
  private def tx35(spark: SparkSession, dir: String): DataFrame = {
    val norm = regexp_replace(trim(lower(col("text"))), "\\s+", " ")
    Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
      .select(col("doc_id"), md5(encode(norm, "UTF-8")).as("fingerprint"))
      .orderBy("doc_id")
  }

  private val tx35Oracle =
    """SELECT doc_id,
      |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Composed training-data cleaning pipeline: quality gate → exact dedup
    * (keep smallest doc_id) → language distribution of the surviving docs.
    * The capstone shape: every stage is declarative, so Catalyst plans the
    * whole pipeline as one job with pushdown through all three stages. */
  private def q52(spark: SparkSession, dir: String): DataFrame = {
    val t = toks("text")
    val nWords = size(t)
    val ttr = size(array_distinct(t)) / nWords
    val kept = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .filter(nWords >= 20 && nWords <= 1000)
      .withColumn("ttr", ttr)
      .filter(col("ttr") >= 0.2)
    val deduped = kept
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("lang")).as("lang"), count(lit(1)).as("n_copies"))
    deduped.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_copies")).as("n_docs_with_dups"))
      .orderBy("lang")
  }

  private val q52Oracle =
    """WITH f AS (
      |  SELECT doc_id, text, lang,
      |    len(list_filter(string_split(text, ' '), x -> x <> '')) AS nw,
      |    len(list_distinct(list_filter(string_split(text, ' '), x -> x <> '')))
      |      / len(list_filter(string_split(text, ' '), x -> x <> '')) AS ttr
      |  FROM documents
      |  WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) BETWEEN 20 AND 1000),
      |k AS (SELECT * FROM f WHERE ttr >= 0.2),
      |d AS (
      |  SELECT text, MIN(doc_id) AS doc_id, MIN(lang) AS lang, COUNT(*) AS n_copies
      |  FROM k GROUP BY text)
      |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_copies) AS BIGINT) AS n_docs_with_dups
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- tx36
  /** Word-bigram frequency: the n-gram language-model counting shape.
    * Bigram construction is a tight-loop UDF, not a positional
    * transform/element_at HOF — Spark's higher-order array functions are
    * CodegenFallback (interpreted, boxed) and measured ~4s slower on this
    * query at sf0.1. Top-20 with a lexicographic tie-break so the LIMIT
    * boundary is deterministic. */
  private val bigramsUdf = udf { text: String =>
    // null-safe: a null text row yields no bigrams (the HOF form this
    // replaced — and the oracle's lower(text) — propagate null harmlessly)
    if (text == null) Array.empty[String]
    else {
      // same tokenization as toks(): split on single spaces, drop empties
      val ts = text.toLowerCase(java.util.Locale.ROOT).split(" ").filter(_.nonEmpty)
      if (ts.length < 2) Array.empty[String]
      else Array.tabulate(ts.length - 1)(i => ts(i) + " " + ts(i + 1))
    }
  }

  private def tx36(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(col("text"))
      .select(explode(bigramsUdf(col("text"))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)

  private val tx36Oracle =
    """WITH w AS (
      |  SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
      |  FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
      |                               i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |  FROM w WHERE len(ws) >= 2)
      |SELECT bigram, COUNT(*) AS n FROM bg
      |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- tx37
  /** Tokenize-to-ids: the text→model-input transform. A frequency-ranked
    * top-100 vocabulary (count desc, word asc — fully deterministic) maps
    * each token to its id, OOV to -1, preserving token order per document.
    * Scale shape: the vocab is pre-truncated with orderBy+limit BEFORE the
    * rank window, so the single-partition window only ever sees K rows (a
    * global row_number over millions of distinct words would bottleneck);
    * the tiny vocab then broadcasts to the token join. */
  private def tx37(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables(spark, dir, "documents")
      .select(col("doc_id"), filter(split(lower(col("text")), " "), t => t =!= "").as("ws"))
    val words = toks.select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "word")))
    val top = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(100)
    val vocab = top.select(col("word"),
      (row_number().over(Window.orderBy(col("cnt").desc, col("word"))) - 1).cast("int").as("id"))
    val perDoc = words.join(broadcast(vocab), Seq("word"), "left")
      .select(col("doc_id"), col("pos"), coalesce(col("id"), lit(-1)).as("tid"))
      .groupBy("doc_id")
      .agg(expr("transform(array_sort(collect_list(struct(pos, tid))), s -> s.tid)").as("token_ids"))
    // left join so zero-token docs still emit (with an empty id list).
    // The id list goes out as a ','-joined string: the driver's pandas
    // compare crashes sorting array-typed columns (r2 `err` row), and the
    // CSV form of an int list is a lossless, format-stable encoding.
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        concat_ws(",",
          coalesce(col("token_ids"), array().cast("array<int>")).cast("array<string>"))
          .as("token_ids"),
        size(col("ws")).as("n_tokens"))
      .orderBy("doc_id")
  }

  private val tx37Oracle =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
      |  FROM documents),
      |w AS (SELECT unnest(ws) AS word FROM toks),
      |vocab AS (
      |  SELECT word, CAST(row_number() OVER (ORDER BY COUNT(*) DESC, word) - 1 AS INTEGER) AS id
      |  FROM w GROUP BY word
      |  QUALIFY row_number() OVER (ORDER BY COUNT(*) DESC, word) <= 100),
      |m AS (SELECT map(list(word), list(id)) AS vm FROM vocab)
      |SELECT doc_id,
      |  coalesce(array_to_string(
      |    list_transform(ws, t -> coalesce(map_extract(vm, t)[1], -1)), ','), '') AS token_ids,
      |  CAST(len(ws) AS INTEGER) AS n_tokens
      |FROM toks, m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx38
  /** Sequence packing (concat-and-chunk): documents flow token-contiguously
    * in doc_id order; each doc gets its global token offset, and sequence
    * boundaries fall every 2048 tokens — the standard "pack the corpus into
    * fixed-length training sequences" step.
    *
    * The global running sum is computed with the scalable two-pass pattern,
    * NOT one global window (which would serialize the whole corpus through
    * a single partition): (1) per-bucket token totals, prefix-summed over
    * the tiny bucket table; (2) a within-bucket cumulative window,
    * partition-parallel; offset = bucket base + within-bucket cumsum. At
    * 100 TB, pick the bucket width so the bucket TABLE (not the data) fits
    * one partition — 1M docs/bucket ⇒ 100k bucket rows for 10^11 docs. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int = 2048, docsPerBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs
      .select(col(idCol).as("doc_id"), size(toks(textCol)).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("doc_id") / docsPerBucket).cast("long"))
    val base = t.groupBy("bucket").agg(sum("n_tokens").as("btot"))
      .withColumn("base", coalesce(
        sum(col("btot")).over(
          Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("bucket", "base")
    val within = t.withColumn("cum",
      sum(col("n_tokens")).over(
        Window.partitionBy("bucket").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    within.join(broadcast(base), "bucket")
      .withColumn("off", col("base") + col("cum") - col("n_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("off"),
        expr(s"off div $seqLen").as("seq_id"),
        (col("off") % seqLen).as("seq_offset"))
  }

  private def tx38(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val tx38Oracle =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS off
      |  FROM t)
      |SELECT doc_id, n_tokens, off,
      |  CAST(off // 2048 AS BIGINT) AS seq_id,
      |  CAST(off % 2048 AS BIGINT) AS seq_offset
      |FROM c ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx39
  /** Word n-grams of `words` as space-joined strings; empty array when the
    * document is shorter than `n`. Shared by the repetition metrics (tx39),
    * decontamination (tx40), and chunk dedup (dd32). */
  /** Distinct word n-grams of `text` as space-joined strings, in first-
    * occurrence order; empty when the document is shorter than `n` words.
    * One tight loop per row (split once, StringBuilder per gram, LinkedHashSet
    * dedup) — Spark's array HOF chain (transform + slice + array_join) is
    * CodegenFallback-interpreted and re-evaluates its input expression per
    * gram index, which measured O(doc²) at sf0.1. */
  private[graft] def distinctWordNgrams(text: String, n: Int): Array[String] = {
    val w0 = if (text == null) Array.empty[String] else text.split(' ')
    val w = w0.filter(_.nonEmpty)
    if (w.length < n) Array.empty[String]
    else {
      val seen = new java.util.LinkedHashSet[String]((w.length - n + 1) * 2)
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= w.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(w(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }


  /** Gopher-style repetition metrics (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", 2021, Table A1),
    * word-fraction variant (the synthetic corpus has no newlines, so the
    * line-based rules don't apply):
    *   - `top2_frac`: fraction of the document's words covered by its most
    *     frequent word 2-gram (drop threshold 0.20);
    *   - `dup3_frac`: fraction of word-3-gram instances that occur more
    *     than once within the document (drop threshold 0.30).
    * Repetition is per-doc local, so the whole pass is ONE tight-loop UDF
    * projection — no explode, no shuffle, no joins ([[TextHash.repCounts]]
    * counts grams in small local hash maps). The fraction arithmetic stays
    * in SQL so the IEEE operation order matches the DuckDB oracle exactly. */
  /** Gopher-style drop thresholds (word-fraction variant) — shared by the
    * batch metrics query and the streaming cleaner. */
  val Top2FracThreshold = 0.2
  val Dup3FracThreshold = 0.3

  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = udf { text: String => graft.functions.TextHash.repCounts(text) }
    val top2 = when(col("wc") === 0 || col("mx") === 0, lit(0.0))
      .otherwise(lit(2.0) * col("mx") / col("wc"))
    val dup3 = when(col("n3") === 0, lit(0.0))
      .otherwise(col("dup3").cast("double") / col("n3"))
    docs.select(col(idCol).as("doc_id"), counts(col(textCol)).as("_m"))
      .select(col("doc_id"), col("_m._1").as("wc"), col("_m._2").as("mx"),
        col("_m._3").as("n3"), col("_m._4").as("dup3"))
      .select(col("doc_id"), col("wc"),
        top2.as("top2_frac"), dup3.as("dup3_frac"))
      .withColumn("keep",
        (col("top2_frac") <= Top2FracThreshold && col("dup3_frac") <= Dup3FracThreshold)
          .cast("int"))
  }

  private def tx39(spark: SparkSession, dir: String): DataFrame =
    repetitionMetrics(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val tx39Oracle =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS wc FROM w),
      |g2 AS (
      |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
      |    THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
      |    ELSE [] END) AS g
      |  FROM w),
      |m2 AS (SELECT doc_id, MAX(c) AS mx FROM
      |  (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
      |g3 AS (
      |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      |    ELSE [] END) AS g
      |  FROM w),
      |a3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n3,
      |    CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup3 FROM
      |  (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
      |o AS (
      |  SELECT b.doc_id, b.wc,
      |    CASE WHEN b.wc = 0 OR m2.mx IS NULL THEN 0.0 ELSE 2.0 * m2.mx / b.wc END AS top2_frac,
      |    CASE WHEN a3.n3 IS NULL OR a3.n3 = 0 THEN 0.0 ELSE CAST(a3.dup3 AS DOUBLE) / a3.n3 END AS dup3_frac
      |  FROM base b LEFT JOIN m2 USING (doc_id) LEFT JOIN a3 USING (doc_id))
      |SELECT doc_id, wc, top2_frac, dup3_frac,
      |  CAST(CASE WHEN top2_frac <= 0.2 AND dup3_frac <= 0.3 THEN 1 ELSE 0 END AS INTEGER) AS keep
      |FROM o ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx40
  /** Benchmark decontamination by n-gram overlap (the GPT-3 appendix-C /
    * open-pipeline standard: a training doc is contaminated if it shares
    * any length-n word n-gram with an evaluation document). The
    * "benchmark" here is the deterministic `doc_id % 97 = 0` slice.
    *
    * Scale shape: the benchmark n-gram set is tiny next to the corpus
    * (eval suites vs 100 TB), so it is deduplicated and BROADCAST; the
    * training side streams once through a broadcast hash join — no
    * shuffle of corpus-sized data at all. Output is every training doc
    * with its distinct-shared-gram count and a contaminated flag. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      benchPred: Column, n: Int = 8): DataFrame = {
    // Per-doc gram sets come deduplicated out of one tight-loop UDF pass
    // (no explode-then-dropDuplicates shuffle); the one-row-per-doc frame
    // also gives the output doc list without a distinct.
    val gramsUdf = udf { (text: String) => distinctWordNgrams(text, n) }
    val gramSets = docs
      .select(col(idCol).as("doc_id"), gramsUdf(col(textCol)).as("gs"),
        benchPred.as("_bench"))
    val bench = gramSets.filter(col("_bench"))
      .select(explode(col("gs")).as("g")).distinct()
    val train = gramSets.filter(!col("_bench"))
    val hits = train.select(col("doc_id"), explode(col("gs")).as("g"))
      .join(broadcast(bench), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", (col("n_shared") > 0).cast("int"))
  }

  private def tx40(spark: SparkSession, dir: String): DataFrame =
    decontaminate(Tables(spark, dir, "documents"), "doc_id", "text",
      benchPred = col("doc_id") % 97 === 0)
      .orderBy("doc_id")

  private val tx40Oracle =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 8
      |    THEN list_distinct(list_transform(range(1, len(ws) - 6),
      |           i -> array_to_string(ws[i:i+7], ' ')))
      |    ELSE [] END) AS g
      |  FROM w),
      |bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      |  FROM g JOIN bench USING (g) WHERE g.doc_id % 97 <> 0 GROUP BY 1)
      |SELECT w.doc_id AS doc_id, COALESCE(hits.n_shared, 0) AS n_shared,
      |  CAST(CASE WHEN COALESCE(hits.n_shared, 0) > 0 THEN 1 ELSE 0 END AS INTEGER) AS contaminated
      |FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id
      |WHERE w.doc_id % 97 <> 0 ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------- tx41
  /** TF-IDF top terms per document, with a log-free deterministic score:
    * `tf * N / df` preserves the TF-IDF ordering for fixed N (log is
    * monotone) while staying bitwise-reproducible across engines — one
    * integer product (exact below 2^53) and one double division, no
    * transcendental functions (whose last-ulp behavior differs between
    * libm implementations; see the oracle-determinism playbook).
    *
    * Scale shape: two hash aggs — (doc, term) term frequencies and
    * per-term document frequencies — a broadcast of the 1-row corpus
    * count, a shuffle join on term, and a rank-limited window
    * (WindowGroupLimit: per-partition top-k before the shuffle). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = docs.select(col(idCol).as("doc_id"),
      explode(toks(textCol)).as("word"))
    val tf = w.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = w.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.select(count(lit(1)).as("n"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    tf.join(df, "word")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("word"),
        ((col("tf") * col("n")).cast("double") / col("df")).as("score"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("rn"), col("word"), col("score"))
  }

  private def tx41(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "rn")

  private val tx41Oracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n FROM documents),
      |s AS (
      |  SELECT tf.doc_id, tf.word, CAST(tf.tf * n.n AS DOUBLE) / df.df AS score
      |  FROM tf JOIN df USING (word) CROSS JOIN n)
      |SELECT doc_id, CAST(rn AS INTEGER) AS rn, word, score FROM (
      |  SELECT doc_id, word, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rn
      |  FROM s) t
      |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- tx42
  /** PII redaction: mask email addresses then long digit runs (account /
    * phone-number shaped) in free text, and count what was masked — the
    * pre-training privacy-scrub pass (the pattern-based tier of e.g.
    * Subramani et al., "Detecting personal identifiable information in
    * training data", and what C4's cleaning applied at corpus scale).
    * Per-row regex projection: embarrassingly parallel, no shuffle; the
    * patterns stay in the RE2-compatible subset (character classes,
    * bounded/unbounded repeats, no backrefs or lookaround) so Spark's
    * java.util.regex and the oracle's RE2 agree match-for-match, and so a
    * linear-time engine can run them at 100 TB without pathological
    * backtracking.
    *
    * Order matters and is pinned: emails first (their local part contains
    * digit runs the second pass would otherwise shred), digit runs on the
    * email-masked text. Counts are taken per pattern on the same text the
    * corresponding replace saw. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val DigitRunPattern = "[0-9]{6,}"

  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailPattern, "<EMAIL>")
    docs.select(col(idCol),
      regexp_replace(t1, DigitRunPattern, "<NUM>").as("redacted"),
      size(regexp_extract_all(t0, lit(EmailPattern), lit(0))).as("n_email"),
      size(regexp_extract_all(t1, lit(DigitRunPattern), lit(0))).as("n_num"))
  }

  private def tx42(spark: SparkSession, dir: String): DataFrame = {
    // The synthetic corpus carries no organic PII, so the query constructs
    // a deterministic contact string from customer fields (name with its
    // 9-digit id, a derived email, a derived account number) and redacts
    // that — the redaction engine is what's under test, and the oracle
    // replays the identical construction.
    val contact = Tables(spark, dir, "customer").select(
      col("c_custkey"),
      concat(
        col("c_name"), lit(" <"),
        lower(col("c_mktsegment")), col("c_custkey").cast("string"),
        lit("@example.com> acct "),
        (col("c_custkey") * 7919L + 1000000L).cast("string")).as("contact"))
    redactPii(contact, "c_custkey", "contact").orderBy("c_custkey")
  }

  private val tx42Oracle =
    """WITH c AS (
      |  SELECT c_custkey,
      |    c_name || ' <' || lower(c_mktsegment) || CAST(c_custkey AS VARCHAR)
      |      || '@example.com> acct ' || CAST(c_custkey * 7919 + 1000000 AS VARCHAR) AS contact
      |  FROM customer),
      |e AS (
      |  SELECT c_custkey, contact,
      |    regexp_replace(contact, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM c)
      |SELECT c_custkey,
      |  regexp_replace(t1, '[0-9]{6,}', '<NUM>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(contact, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_email,
      |  CAST(len(regexp_extract_all(t1, '[0-9]{6,}')) AS INTEGER) AS n_num
      |FROM e ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- tx43
  /** Cross-document boilerplate fraction (the CCNet / C4 cleaning signal —
    * Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
    * from Web Crawl Data", LREC 2020, dedups frequent paragraphs; C4 drops
    * lines repeated across documents — re-expressed over word n-grams
    * because the synthetic corpus has no newlines): an n-gram is
    * boilerplate when it appears in >= `minDf` distinct documents, and
    * each document reports what fraction of its distinct n-grams is
    * boilerplate.
    *
    * Scale shape: per-doc distinct grams come out of one tight-loop UDF
    * pass (no explode+dropDuplicates shuffle); document frequency is one
    * hash agg keyed on the gram (rows are per-doc distinct, so COUNT(*)
    * IS the DF); membership is a semi join also keyed on the gram. Every
    * corpus-sized shuffle is gram-keyed and partition-parallel — nothing
    * all-pairs, nothing driver-side. The fraction is an exact-int divide
    * (one IEEE op), bitwise-stable across engines. */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDf: Int = 2): DataFrame = {
    val gramsUdf = udf { (text: String) => distinctWordNgrams(text, n) }
    val grams = docs
      .select(col(idCol).as("doc_id"), gramsUdf(col(textCol)).as("gs"))
      .select(col("doc_id"), explode(col("gs")).as("g"))
    val frequent = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select("g")
    val bp = grams.join(frequent, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("bp_grams"))
    val totals = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    docs.select(col(idCol).as("doc_id"))
      .join(totals, Seq("doc_id"), "left")
      .join(bp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("bp_grams"), lit(0L)).as("bp_grams"))
      .withColumn("bp_frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("bp_grams").cast("double") / col("n_grams")))
  }

  private def tx43(spark: SparkSession, dir: String): DataFrame =
    boilerplateFraction(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val tx43Oracle =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 5
      |    THEN list_distinct(list_transform(range(1, len(ws) - 3),
      |           i -> array_to_string(ws[i:i+4], ' ')))
      |    ELSE [] END) AS g
      |  FROM w),
      |f AS (SELECT g FROM (SELECT g, COUNT(*) AS df FROM g GROUP BY 1) WHERE df >= 2),
      |t AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams FROM g GROUP BY 1),
      |b AS (SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS bp_grams FROM g JOIN f USING (g) GROUP BY 1)
      |SELECT w.doc_id AS doc_id,
      |  COALESCE(t.n_grams, 0) AS n_grams,
      |  COALESCE(b.bp_grams, 0) AS bp_grams,
      |  CASE WHEN COALESCE(t.n_grams, 0) = 0 THEN 0.0
      |       ELSE CAST(COALESCE(b.bp_grams, 0) AS DOUBLE) / t.n_grams END AS bp_frac
      |FROM w LEFT JOIN t USING (doc_id) LEFT JOIN b USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx44
  /** Overlapping token-window chunking — the retrieval-corpus (RAG) prep
    * step: each document becomes ceil(n_tokens / stride) chunks of up to
    * `size` tokens, chunk k starting at token k*stride, so consecutive
    * chunks overlap by `size - stride` tokens and no token is dropped.
    *
    * Scale shape: a pure per-row generator — one tight-loop UDF builds the
    * window strings from a single split (no self-join, no window function,
    * no shuffle), and posexplode yields (chunk_idx, chunk). Output size is
    * ~size/stride × corpus, the expected expansion for overlap chunking;
    * everything stays embarrassingly parallel. */
  private[graft] def wordWindows(text: String, size: Int, stride: Int): Array[String] = {
    val w0 = if (text == null) Array.empty[String] else text.split(' ')
    val w = w0.filter(_.nonEmpty)
    if (w.isEmpty) return Array.empty[String]
    val nChunks = (w.length + stride - 1) / stride
    val out = new Array[String](nChunks)
    val sb = new java.lang.StringBuilder()
    var k = 0
    while (k < nChunks) {
      val s = k * stride
      val e = math.min(s + size, w.length)
      sb.setLength(0)
      var i = s
      while (i < e) { if (i > s) sb.append(' '); sb.append(w(i)); i += 1 }
      out(k) = sb.toString
      k += 1
    }
    out
  }

  def chunkTokenWindows(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 32, stride: Int = 24): DataFrame = {
    require(stride >= 1 && size >= stride,
      s"need size >= stride >= 1, got size=$size stride=$stride")
    val winUdf = udf { (text: String) => wordWindows(text, size, stride) }
    docs.select(col(idCol).as("doc_id"), posexplode(winUdf(col(textCol))))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        (col("pos") * stride).as("tok_start"),
        org.apache.spark.sql.functions.size(split(col("col"), " ")).as("n_tok"),
        col("col").as("chunk"))
  }

  private def tx44(spark: SparkSession, dir: String): DataFrame =
    chunkTokenWindows(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "chunk_idx")

  private val tx44Oracle =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, unnest(range(0, (len(ws) + 23) // 24)) AS k
      |  FROM w)
      |SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
      |  CAST(k * 24 AS INTEGER) AS tok_start,
      |  CAST(len(ws[k*24+1 : LEAST(k*24+32, len(ws))]) AS INTEGER) AS n_tok,
      |  array_to_string(ws[k*24+1 : LEAST(k*24+32, len(ws))], ' ') AS chunk
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- tx45
  /** Unigram language-model quality scoring: train a Laplace-smoothed
    * unigram LM on the corpus itself, then score each document by its
    * negative log-likelihood — the perplexity-style quality filter of
    * CCNet (Wenzek et al., "CCNet: extracting high quality monolingual
    * datasets from web crawl data", LREC 2020) and the Gopher pipeline
    * (Rae et al. 2021), reduced to the self-trained unigram tier that
    * needs no external model artifact.
    *
    * Determinism: each token's NLL is rounded to 9 decimals and summed as
    * DECIMAL, so the per-doc sum is exact and order-independent (the
    * oracle-determinism rule for transcendental-valued aggregates); the
    * single final cast/division happens once per row on both engines.
    *
    * Scale shape: two hash aggs over the token stream (per-word counts +
    * the 1-row corpus total), then a broadcast join of the vocab-sized
    * NLL table back onto the token stream and one hash agg by doc_id. The
    * broadcast is safe because the vocabulary is sublinear in corpus
    * size; for an open-vocabulary web corpus drop the broadcast hint and
    * let AQE pick the join side. No shuffle carries the raw text. */
  def unigramNllScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = docs.select(col(idCol).as("doc_id"), explode(toks(textCol)).as("word"))
    val cnt = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    val tot = w.agg(count(lit(1)).as("t"), countDistinct(col("word")).as("v"))
    val lp = cnt.crossJoin(broadcast(tot))
      .select(col("word"),
        round(-log((col("cnt") + lit(1)).cast("double") /
          (col("t") + col("v")).cast("double")), 9)
          .cast("decimal(30,9)").as("nll"))
    w.join(broadcast(lp), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum(col("nll")).as("nll_dec"))
      .select(col("doc_id"), col("n_tok"),
        col("nll_dec").cast("double").as("nll_sum"),
        round(col("nll_dec").cast("double") / col("n_tok"), 6).as("avg_nll"))
  }

  private def tx45(spark: SparkSession, dir: String): DataFrame =
    unigramNllScore(Tables(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private val tx45Oracle =
    """WITH w AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
      |  FROM documents),
      |cnt AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS t, COUNT(DISTINCT word) AS v FROM w),
      |lp AS (
      |  SELECT word,
      |    CAST(ROUND(-ln(CAST(cnt + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)), 9)
      |      AS DECIMAL(30,9)) AS nll
      |  FROM cnt CROSS JOIN tot)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
      |  CAST(SUM(nll) AS DOUBLE) AS nll_sum,
      |  ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS avg_nll
      |FROM w JOIN lp USING (word)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- tx46
  /** BPE merge learning (Sennrich, Haddow & Birch, "Neural Machine
    * Translation of Rare Words with Subword Units", ACL 2016 §3.2): learn
    * the top-k byte-pair merge rules from the corpus — the tokenizer-
    * training step of an LLM data pipeline.
    *
    * Distributed shape: the corpus is scanned ONCE to build the
    * (word, freq) table — BPE statistics are a function of word
    * frequencies, so all further rounds run on the vocab-sized symbol
    * table (distinct words ≪ corpus rows; at 100 TB the corpus pass is
    * the only big job). Each of the k rounds is one pair-explode +
    * weighted hash agg over that small table, an argmax collect of ONE
    * row (same driver-scalar pattern as connectedComponents' convergence
    * probe), and a broadcast-free per-row merge map. The symbol table is
    * re-checkpointed each round to keep lineage flat. Iterative argmax-
    * then-rewrite is not expressible in one SQL query, so the op is
    * engine-only, property-tested on a hand-computed corpus.
    *
    * Determinism: ties on pair count break lexicographically on (left,
    * right), so the learned merge table is engine- and partitioning-
    * independent. End-of-word is marked with "</w>" per the paper, so
    * merges never cross word boundaries.
    *
    * Returns (step, left, right, pair_count) for steps 1..k.
    */
  def bpeMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(toks(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    val symsUdf = udf { w: String => w.map(_.toString) :+ "</w>" }
    var vocab = words.select(col("n"), symsUdf(col("w")).as("syms")).localCheckpoint()

    def mergeOnce(syms: Seq[String], l: String, r: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2 // left-to-right, non-overlapping
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }

    val steps = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val best = vocab
        .select(col("n"), col("syms"), posexplode(col("syms")).as(Seq("i", "l")))
        .withColumn("r", try_element_at(col("syms"), col("i") + 2))
        .filter(col("r").isNotNull)
        .groupBy("l", "r").agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        steps += ((step, l, r, c))
        val applyUdf = udf { syms: Seq[String] => mergeOnce(syms, l, r) }
        vocab = vocab.select(col("n"), applyUdf(col("syms")).as("syms"))
        // same sparse-checkpoint idiom as pageRank: the vocab chain is
        // consumed once per round, so materialize only every few rounds
        // to bound plan depth without a job per merge
        if (step % 3 == 0) vocab = vocab.localCheckpoint()
        step += 1
      }
    }
    steps.toSeq.toDF("step", "left", "right", "pair_count")
  }

  private def tx46(spark: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables(spark, dir, "documents"), "text", k = 10)
      .orderBy("step")

  val all: Seq[GraftQuery] = Seq(
    GraftQuery("q22_wordcount", q22, Some(wordcountOracle)),
    GraftQuery("q23_wordcount_mapreduce", q23, Some(wordcountOracle)),
    GraftQuery("tx32_langid", tx32, Some(tx32Oracle)),
    GraftQuery("tx33_quality_score", tx33, Some(tx33Oracle)),
    GraftQuery("tx34_token_count", tx34, Some(tx34Oracle)),
    GraftQuery("tx35_fingerprint", tx35, Some(tx35Oracle)),
    GraftQuery("tx36_bigram_freq", tx36, Some(tx36Oracle)),
    GraftQuery("tx37_tokenize_ids", tx37, Some(tx37Oracle)),
    GraftQuery("tx38_pack_sequences", tx38, Some(tx38Oracle)),
    GraftQuery("tx39_repetition_gopher", tx39, Some(tx39Oracle)),
    GraftQuery("tx40_decontaminate", tx40, Some(tx40Oracle)),
    GraftQuery("tx41_tfidf_topterms", tx41, Some(tx41Oracle)),
    GraftQuery("tx42_pii_redact", tx42, Some(tx42Oracle)),
    GraftQuery("tx43_boilerplate_frac", tx43, Some(tx43Oracle)),
    GraftQuery("tx44_chunk_windows", tx44, Some(tx44Oracle)),
    GraftQuery("tx45_lm_quality_nll", tx45, Some(tx45Oracle)),
    GraftQuery("tx46_bpe_merges", tx46, None),
    GraftQuery("q52_clean_pipeline", q52, Some(q52Oracle)))
}
