package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
