package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.TextHash
import graft.operators.TextOps

/** Streaming document cleaning — the incremental-ingest counterpart of the
  * batch px90 stages. Works unchanged on a `readStream` source because its
  * pieces are streaming-safe by construction:
  *
  *   - the repetition filter ([[TextOps.repetitionMetrics]]) is a pure
  *     per-row projection since the round-3 rewrite (per-doc local
  *     counting, no shuffle), so it needs no state at all;
  *   - near-dup suppression keys on the md5 of the normalized text
  *     ([[TextHash.normalizeUdf]], the dd31 key) through streaming
  *     `dropDuplicates`, whose state store holds one 16-byte key per
  *     distinct surviving document.
  *
  * At production scale, bound the dedup state with a watermark +
  * `dropDuplicatesWithinWatermark` on an ingest-time column (exact global
  * dedup over an unbounded stream is unbounded state by definition).
  */
object DocStream {

  /** docs(doc_id, text) → surviving (doc_id, text): repetition-filtered,
    * first-seen per normalized key. The filter is computed inline (not via
    * a join back to the metrics frame) so the streaming plan stays a
    * stateless projection + one dedup operator. */
  def cleanDocs(docs: DataFrame): DataFrame = {
    val counts = udf { text: String => TextHash.repCounts(text) }
    val top2 = when(col("_m._1") === 0 || col("_m._2") === 0, lit(0.0))
      .otherwise(lit(2.0) * col("_m._2") / col("_m._1"))
    val dup3 = when(col("_m._3") === 0, lit(0.0))
      .otherwise(col("_m._4").cast("double") / col("_m._3"))
    docs.withColumn("_m", counts(col("text")))
      .filter(top2 <= TextOps.Top2FracThreshold && dup3 <= TextOps.Dup3FracThreshold)
      .withColumn("norm_key", md5(encode(TextHash.normalizeUdf(col("text")), "UTF-8")))
      .dropDuplicates("norm_key")
      .select("doc_id", "text")
  }

  // ------------------------------------------------------------------
  // Streaming lake ingest (foreachBatch → appendToLake)
  // ------------------------------------------------------------------

  /** Close the loop between the document stream and the training lake:
    * every micro-batch lands through [[graft.operators.Pipeline
    * .appendToLake]], i.e. through the [[graft.operators.Lake]]
    * write-audit-publish commit. Exactly-once falls out of composing two
    * weaker guarantees:
    *
    *   - `foreachBatch` is AT-LEAST-ONCE: after a crash the last
    *     un-checkpointed micro-batch is re-delivered in full;
    *   - `appendToLake` is IDEMPOTENT twice over: each commit is tagged
    *     `(ingest-<checkpointDir>, batchId)` in the manifest's
    *     transaction watermark, so a re-delivered batch skips from ONE
    *     manifest resolution before any data is read — and even an
    *     UNTAGGED overlap (rows shared between batches) stages zero
    *     rows through the id anti-join against the (bloom-prefiltered)
    *     lake ids.
    *
    * A crash INSIDE an append is equally safe: before the manifest rename
    * the staged files are invisible (vacuumable orphans at worst), after
    * it the replay's anti-join sees the committed ids. The stream's rows
    * must already carry the lake's partition columns — shaping (split /
    * shard assignment) belongs to the upstream transform, exactly as in
    * the batch px100 write.
    *
    * Every micro-batch adds files, so a long-running stream fragments the
    * lake it feeds. `compactEvery = n` folds the maintenance pass in: after
    * every n-th micro-batch commit, partitions that accumulated more than
    * `compactMaxFilesPerPartition` files are bin-packed by
    * [[graft.operators.Pipeline.compactLake]] — file counts stay bounded
    * for the stream's lifetime instead of growing one file-set per batch
    * (DocStreamSpec pins the bound). Compaction is data-preserving and
    * replay-safe (a re-run after a crash just compacts again).
    *
    * `compactRetainHistory` (default TRUE) keeps each compaction's
    * rewritten pre-image on disk, which is what makes the maintenance
    * pass CDC-SAFE: an exact incremental consumer
    * ([[graft.operators.Lake.changesBetween]]) reading a range that
    * spans a compaction still finds every data-added file it needs
    * (DocStreamSpec pins this). The retained pre-images are reclaimed by
    * a periodic [[graft.operators.Lake.vacuumKeeping]] once consumers
    * have drained past them. Set it false only for a lake with NO
    * incremental consumers — the pre-image is then vacuumed eagerly and
    * an in-range `changesBetween` fails loudly. */
  def ingestToLake(docs: DataFrame, lakeDir: String, checkpointDir: String,
      idCol: String = "doc_id",
      partitionCols: Seq[String] = Seq("split", "shard_id"),
      compactEvery: Int = 0,
      compactMaxFilesPerPartition: Int = 8,
      compactTargetRowsPerFile: Long = 4000000L,
      compactRetainHistory: Boolean = true): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the checkpoint dir IS the query's replay identity (batch ids
        // restart from its offsets), so it keys the watermark
        graft.operators.Pipeline.appendToLake(
          batch.sparkSession, lakeDir, batch, idCol, partitionCols,
          txn = Some((s"ingest-$checkpointDir", batchId)))
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          graft.operators.Pipeline.compactLake(batch.sparkSession, lakeDir,
            maxFilesPerPartition = compactMaxFilesPerPartition,
            targetRowsPerFile = compactTargetRowsPerFile,
            partitionCols = partitionCols,
            retainHistory = compactRetainHistory)
        ()
      }
      .start()

  // ------------------------------------------------------------------
  // Per-source token-budget admission (transformWithState)
  // ------------------------------------------------------------------

  final case class DocTok(doc_id: Long, source: String, n_tok: Long)
  final case class Admitted(doc_id: Long, source: String, n_tok: Long,
      cum_tok: Long, admitted: Boolean)

  /** Keyed running token counter: admits documents per source until the
    * source's budget is consumed — the streaming form of px97's planning
    * step ("stop ingesting domain d once its token allocation is spent"),
    * enforced incrementally as data arrives instead of by a corpus scan.
    *
    * State is ONE long per source (the admitted-token prefix sum) in the
    * `transformWithState` value store — bounded by the number of sources,
    * not the stream length, so no watermark/TTL is needed for state to
    * stay small. Admission is soft-capped: a document is admitted iff the
    * budget is not yet exhausted when it arrives, so the crossing
    * document lands (budgets are targets, not hard byte limits). Within
    * one micro-batch a key's rows are admitted in doc_id order, making
    * replays of the same batched input deterministic.
    *
    * Memory bound: the determinism sort materializes ONE key's rows of
    * ONE micro-batch (`rows.toArray`) — and these are (id, source, count)
    * triples, never document text — so transient executor memory is
    * O(hottest key's rows per micro-batch), while checkpointed STATE
    * stays one long per source. A hot source in a huge micro-batch is
    * therefore bounded by trigger sizing (`maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger`), the knob production streams already use;
    * if upstream can guarantee per-key arrival order instead, the sort
    * (and the array) can be dropped to make the pass fully streaming.
    */
  private class TokenBudget(budget: Long)
      extends StatefulProcessor[String, DocTok, Admitted] {
    @transient private var cum: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cum = getHandle.getValueState[Long]("cum_tok", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[Admitted] = {
      var c = if (cum.exists()) cum.get() else 0L
      val out = rows.toArray.sortBy(_.doc_id).map { d =>
        val admit = c < budget
        if (admit) c += d.n_tok
        Admitted(d.doc_id, key, d.n_tok, c, admit)
      }
      cum.update(c)
      out.iterator
    }
  }

  /** docs(doc_id, source, n_tok) → per-doc admission decisions with the
    * running per-source total. Requires the RocksDB state store provider
    * (the only store transformWithState supports). */
  def admitByTokenBudget(docs: Dataset[DocTok], budgetPerSource: Long): Dataset[Admitted] = {
    require(budgetPerSource >= 0, s"budget must be >= 0, got $budgetPerSource")
    implicit val outEnc = Encoders.product[Admitted]
    implicit val keyEnc = Encoders.STRING
    docs.groupByKey(_.source)
      .transformWithState(new TokenBudget(budgetPerSource),
        TimeMode.None(), OutputMode.Append(), outEnc)
  }
}
