package graft.sources.lake

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Lake

/** EXACTLY-ONCE streaming ingest behind the format string:
  *
  * {{{
  *   docs.writeStream
  *     .format("graft-lake")
  *     .option("checkpointLocation", ckpt)
  *     .trigger(Trigger.AvailableNow())   // or ProcessingTime, etc.
  *     .start(lakeDir)
  * }}}
  *
  * Every micro-batch lands as ONE protocol `append` commit
  * ([[Lake.append]]: stage → audit → publish, OCC-rebased, CDC-visible,
  * stats-captured), tagged with the transaction pair
  * `(streaming-sink-<queryId>, batchId)`. Exactly-once is the
  * composition Delta Lake's `DeltaSink` uses (Armbrust et al., VLDB
  * 2020, streaming sinks): Spark's micro-batch engine re-delivers the
  * last un-checkpointed batch AT-LEAST-ONCE after a crash, and the
  * lake's transaction watermark ([[Lake.LakeState.txns]]) makes the
  * re-delivered commit a NO-OP — the replay is detected from the
  * manifest alone, before any data is read, and re-checked under the
  * commit's OCC rebase so a raced duplicate cannot double-land. The
  * query id is constant across restarts from the same checkpoint, so
  * the watermark key survives the crash that makes it matter.
  *
  * Unlike [[graft.streaming.DocStream.ingestToLake]] (the foreachBatch
  * form, whose idempotence anti-joins the batch's ids against the
  * lake), this dedup is CONTENT-AGNOSTIC — no id column is required,
  * duplicate ROWS across batches are preserved as data — and costs one
  * manifest resolution per replay instead of an id scan.
  *
  * A long-running stream fragments the lake it feeds (one file set per
  * micro-batch); `option("compactEvery", n)` folds the maintenance in —
  * after every n-th batch commit, partitions holding more than
  * `compactMaxFilesPerPartition` files bin-pack through
  * [[graft.operators.Pipeline.compactLake]] (history retained, so
  * incremental consumers stay exact) — the same bound
  * [[graft.streaming.DocStream.ingestToLake]] offers its foreachBatch
  * form. Compaction is replay-safe: a re-run after a crash just
  * compacts again.
  *
  * Contract, refused loudly otherwise: the target must already be a
  * lake (`Lake.init` / `ingestToLake` / catalog `CREATE TABLE` — the
  * sink never invents a layout); `outputMode` must be Append (the lake
  * append cannot retract rows, so Update/Complete would silently drop
  * semantics); `partitionBy` on the writer must be empty (the lake's
  * committed layout is authoritative — rows route to partition
  * directories by their column VALUES, exactly as in every other
  * protocol write). Rows must carry the lake's partition columns.
  */
private[lake] class LakeStreamingSink(path: String, compactEvery: Int,
    compactMaxFilesPerPartition: Int, compactTargetRowsPerFile: Long) extends Sink {

  override def name(): String = s"graft-lake-sink[$path]"

  override def addBatch(batchId: Long, data: Dataset[Row]): Unit = {
    val appId = ColumnBridge.streamingQueryId(data) match {
      case Some(q) => s"streaming-sink-$q"
      case None => throw new IllegalStateException(
        "graft-lake sink: no streaming query id on the execution thread — addBatch " +
          "called outside a running streaming query?")
    }
    // the micro-batch plan must be re-planned as a batch frame before the
    // lake append can checkpoint/count/write it (Sink.addBatch hands us
    // the incremental plan, not its rows)
    val spark = SparkSession.active
    Lake.append(spark, path, ColumnBridge.asBatch(data), txn = Some((appId, batchId)))
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
      val cols = Lake.partitionColsOf(Lake.adopt(spark, path))
      graft.operators.Pipeline.compactLake(spark, path,
        maxFilesPerPartition = compactMaxFilesPerPartition,
        targetRowsPerFile = compactTargetRowsPerFile,
        partitionCols = cols, retainHistory = true)
    }
  }
}

private[lake] object LakeStreamingSink {
  def create(parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-lake sink requires a path: .start(lakeDir) or .option(\"path\", …)"))
    if (outputMode != OutputMode.Append())
      throw new UnsupportedOperationException(
        s"graft-lake sink: output mode $outputMode is not supported — the lake append " +
          "cannot retract or replace committed rows; use Append (aggregations need a " +
          "watermark to close in Append mode)")
    if (partitionColumns.nonEmpty)
      throw new UnsupportedOperationException(
        "graft-lake sink: partitionBy is not supported — the lake's committed layout " +
          "is authoritative; rows route to partition directories by their column values")
    val spark = SparkSession.active
    if (Lake.latestManifest(spark, path).isEmpty)
      throw new IllegalArgumentException(
        s"graft-lake sink: $path is not a lake — initialize it first (Lake.init / " +
          "Pipeline.ingestToLake / catalog CREATE TABLE); the sink never invents a layout")
    // option keys may arrive in either case depending on the writer path
    def raw(k: String): Option[String] =
      parameters.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
    def intOpt(k: String, dflt: Int): Int =
      raw(k).map(v => v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"graft-lake sink: $k must be an int, got '$v'"))).getOrElse(dflt)
    def longOpt(k: String, dflt: Long): Long =
      raw(k).map(v => v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-lake sink: $k must be a long, got '$v'"))).getOrElse(dflt)
    new LakeStreamingSink(path,
      compactEvery = intOpt("compactEvery", 0),
      compactMaxFilesPerPartition = intOpt("compactMaxFilesPerPartition", 8),
      compactTargetRowsPerFile = longOpt("compactTargetRowsPerFile", 4000000L))
  }
}
