package graft.sources.lake

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Lake

/** Iceberg-style METADATA TABLES on the lake catalog — the commit log,
  * file census, and transaction watermarks behind plain `SELECT`:
  *
  * {{{
  *   SELECT version, action, n_removed FROM graft_lake.corpus$history
  *   SELECT path, partition FROM graft_lake.corpus$files
  *   SELECT app_id, last_version FROM graft_lake.corpus$txns
  *   SELECT partition, n_files FROM graft_lake.corpus$partitions
  *   SELECT * FROM graft_lake.`/abs/path$files`        -- path-addressed
  * }}}
  *
  * (backtick the identifier in SQL when `$` needs quoting). Each table
  * is computed DRIVER-SIDE from the manifest alone — one log resolution,
  * zero data-file opens, exactly the information [[Lake.describeHistory]]
  * / [[Lake.LakeState]] already hold — and shipped to the scan as one
  * bounded partition: `$history` is O(versions) via header-only delta
  * reads, `$files` is O(live files) — the size of the manifest itself —
  * and `$txns` is O(writer apps). Nothing here scales with data bytes,
  * so the tables stay cheap on a 100 TB lake; deliberately NOT included
  * is anything that would need per-file filesystem stats or footer
  * opens (use `compactLake`'s own sizing for that).
  *
  * Version/timestamp pinning (`VERSION AS OF`) applies to `$files` and
  * `$txns` (the census/watermarks AS OF that commit); `$history` always
  * reads the full retained log and refuses pinning rather than
  * truncating it ambiguously. */
private[lake] object LakeMetaTables {

  /** Recognized suffixes: `name$kind`. */
  val Kinds: Set[String] =
    Set("history", "files", "txns", "partitions", "constraints", "detail")

  /** Split `corpus$history` → (`corpus`, `history`); None for plain
    * table names (a `$` with an unknown tail is NOT metadata — it stays
    * part of the table name rather than guessing). */
  def parse(name: String): Option[(String, String)] = {
    val i = name.lastIndexOf('$')
    if (i <= 0) None
    else {
      val kind = name.substring(i + 1)
      if (Kinds.contains(kind)) Some((name.substring(0, i), kind)) else None
    }
  }

  val historySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("action", StringType, nullable = false),
    StructField("n_added", IntegerType, nullable = false),
    StructField("n_data_added", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false),
    StructField("n_dv_attached", IntegerType, nullable = false),
    StructField("n_cdc_files", IntegerType, nullable = false)))

  val filesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("n_stat_cols", IntegerType, nullable = false),
    StructField("n_dv_sidecars", IntegerType, nullable = false)))

  val txnsSchema: StructType = StructType(Seq(
    StructField("app_id", StringType, nullable = false),
    StructField("last_version", LongType, nullable = false)))

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("n_dv_sidecars", IntegerType, nullable = false)))

  val constraintsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("expression", StringType, nullable = false)))

  val detailSchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("write_layout", StringType, nullable = false),
    StructField("bloom_cols", StringType, nullable = false),
    StructField("n_layout_generations", IntegerType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("n_dv_attached_files", IntegerType, nullable = false),
    StructField("n_history_files", IntegerType, nullable = false),
    StructField("n_constraints", IntegerType, nullable = false),
    StructField("n_txn_apps", IntegerType, nullable = false),
    StructField("has_column_mapping", BooleanType, nullable = false),
    StructField("guidance", StringType, nullable = false)))

  /** Operational nudges surfaced on the `$detail` card — empty when the
    * lake needs nothing. Today: a generation-count warning (every read
    * plans one scan per live layout generation, so a lake evolved many
    * times without compaction pays that planning tax until `CALL
    * compact` / `repartitionLake` folds the old generations into the
    * current layout — the q89-style actionable text, not just a count). */
  private def guidanceFor(st: Lake.LakeState): String = {
    val gens = Lake.layoutGenerationsOf(st).size
    if (gens > 2)
      s"$gens live layout generations — each read plans one scan per " +
        "generation; CALL compact (or repartitionLake) to fold them into " +
        "the current write layout"
    else ""
  }

  private def s(v: String) = UTF8String.fromString(v)

  /** Build the metadata table for `kind` over the lake at `dir`,
    * optionally pinned to a version/timestamp (resolved exactly like the
    * data table's time travel). */
  def table(spark: SparkSession, dir: String, kind: String,
      pinnedVersion: Option[Long]): Table = kind match {
    case "history" =>
      if (pinnedVersion.isDefined)
        throw new UnsupportedOperationException(
          "graft-lake: $history always reads the full retained log — drop the " +
            "VERSION/TIMESTAMP AS OF (pin $files/$txns instead)")
      new LakeMetaTable(s"$dir$$history", historySchema, () =>
        Lake.describeHistory(spark, dir).collect().map { r =>
          new GenericInternalRow(Array[Any](
            r.getLong(0), r.getTimestamp(1).getTime * 1000L, s(r.getString(2)),
            r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
        })
    case "files" =>
      new LakeMetaTable(s"$dir$$files", filesSchema, () => {
        val st = stateFor(spark, dir, pinnedVersion)
        st.files.map { f =>
          val cut = f.lastIndexOf('/')
          val stats = st.stats.getOrElse(f, Seq.empty)
          // `#rows`/`#bytes` are the recorded numRecords/add.size, not
          // pruning stats — surfaced as their own columns (null for
          // pre-capture files); the stat-column census counts only
          // genuine BOUND columns (null-count pseudo-stats excluded too)
          val nRows: Any = stats.find(_.col == Lake.RowsStatName)
            .flatMap(_.min.toLongOption).orNull
          val nBytes: Any = stats.find(_.col == Lake.BytesStatName)
            .flatMap(_.min.toLongOption).orNull
          new GenericInternalRow(Array[Any](
            s(f), s(if (cut > 0) f.substring(0, cut) else ""),
            nRows, nBytes,
            stats.count(c => !Lake.ReservedStatNames(c.col) &&
              !c.col.endsWith(Lake.NullsStatSuffix)),
            st.dvs.getOrElse(f, Seq.empty).size)): InternalRow
        }.toArray
      })
    case "txns" =>
      new LakeMetaTable(s"$dir$$txns", txnsSchema, () => {
        val st = stateFor(spark, dir, pinnedVersion)
        st.txns.toSeq.sortBy(_._1).map { case (a, v) =>
          new GenericInternalRow(Array[Any](s(a), v)): InternalRow
        }.toArray
      })
    case "constraints" =>
      new LakeMetaTable(s"$dir$$constraints", constraintsSchema, () => {
        val st = stateFor(spark, dir, pinnedVersion)
        st.checks.toSeq.sortBy(_._1).map { case (n, e) =>
          new GenericInternalRow(Array[Any](s(n), s(e))): InternalRow
        }.toArray
      })
    case "partitions" =>
      // the fragmentation/tombstoning dashboard: which partitions need a
      // CALL compact — file counts and live vector attachments, grouped
      // from the census driver-side
      new LakeMetaTable(s"$dir$$partitions", partitionsSchema, () => {
        val st = stateFor(spark, dir, pinnedVersion)
        st.files.groupBy { f =>
          val cut = f.lastIndexOf('/')
          if (cut > 0) f.substring(0, cut) else ""
        }.toSeq.sortBy(_._1).map { case (p, fs) =>
          // Iceberg `record_count` parity: the partition's row total from
          // the recorded per-file numRecords — null (not an undercount)
          // whenever any file predates capture
          val per = fs.map(f => st.stats.getOrElse(f, Seq.empty)
            .find(_.col == Lake.RowsStatName).flatMap(_.min.toLongOption))
          val nRows: Any = if (per.exists(_.isEmpty)) null else per.flatten.sum
          new GenericInternalRow(Array[Any](s(p), fs.size, nRows,
            fs.map(f => st.dvs.getOrElse(f, Seq.empty).size).sum)): InternalRow
        }.toArray
      })
    case "detail" =>
      // the DESCRIBE DETAIL card: one row summarizing the resolved state
      // — version, write layout + live generations (partition-spec
      // evolution), census/tombstone/constraint/watermark counts. All
      // manifest-resolved; deliberately no on-disk byte sizes (those
      // would need per-file filesystem stats).
      new LakeMetaTable(s"$dir$$detail", detailSchema, () => {
        val st = stateFor(spark, dir, pinnedVersion)
        val schema = org.apache.spark.sql.types.DataType.fromJson(st.schemaJson)
          .asInstanceOf[StructType]
        Array(new GenericInternalRow(Array[Any](
          st.version,
          s(Lake.layoutSpecsOf(st).mkString(",")),
          s(st.bloomCols.mkString(",")),
          Lake.layoutGenerationsOf(st).size,
          st.files.size,
          // exact dv'd-file count via one scoped job on a deferred map —
          // a DESCRIBE DETAIL card must not force a corpus-scale map
          // onto the driver just to print a count
          Lake.dvdFileCount(spark, st.dvs),
          st.history.size,
          st.checks.size,
          st.txns.size,
          Lake.hasMapping(schema),
          s(guidanceFor(st)))): InternalRow)
      })
    case other => throw new IllegalArgumentException(s"unknown metadata table kind: $other")
  }

  /** The metadata tables ARE the driver-computed census — their contract
    * is "null means never captured", so they must see every RECORDED
    * stat. A lazily-resolved state ([[Lake.LazyStatsKey]]) deliberately
    * leaves checkpoint-resident stats in the parquet entries; rendering
    * the census from it would flip a populated `n_rows`/`n_bytes`/
    * `n_stat_cols` column to NULL on a session conf. Force the eager
    * resolution here — these tables are manifest-sized by design and
    * read rarely (dashboards, DESCRIBE), never in a query hot path. */
  private def stateFor(spark: SparkSession, dir: String,
      pinned: Option[Long]): Lake.LakeState =
    pinned.fold(Lake.currentState(spark, dir, forceEager = true))(v =>
      Lake.stateAt(spark, dir, v, forceEager = true))
}

/** One driver-computed, single-partition metadata table. The row set is
  * built lazily at scan-planning time (every query sees the log as of
  * ITS planning, not catalog-load), and rides to the one reader task as
  * the partition payload — these are manifest-sized lists, bounded by
  * design, never data-proportional. */
private[lake] class LakeMetaTable(tblName: String, tblSchema: StructType,
    compute: () => Array[InternalRow]) extends Table with SupportsRead {
  override def name(): String = tblName
  override def schema(): StructType = tblSchema
  override def partitioning(): Array[Transform] = Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LakeMetaScan(tblName, tblSchema, compute)
    }
}

/** Single-partition scan over driver-computed rows — shared by the
  * metadata tables and the `CALL` procedures' result sets
  * ([[LakeProcedures]]). Also a `LocalScan` (the rows ARE driver-local),
  * which is the only output shape Spark's procedure invocation accepts;
  * table reads still go through the batch path. */
private[lake] class LakeMetaScan(scanName: String, scanSchema: StructType,
    compute: () => Array[InternalRow])
    extends Scan with org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = scanSchema
  override def description(): String = s"graft-lake metadata $scanName"
  override def rows(): Array[InternalRow] = compute()
  override def toBatch: Batch = new Batch {
    private val rows = compute()
    override def planInputPartitions(): Array[InputPartition] =
      Array(LakeMetaPartition(rows))
    override def createReaderFactory(): PartitionReaderFactory =
      new LakeMetaReaderFactory
  }
}

private[lake] final case class LakeMetaPartition(rows: Array[InternalRow])
    extends InputPartition

private[lake] class LakeMetaReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = p.asInstanceOf[LakeMetaPartition].rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean = { if (it.hasNext) { cur = it.next(); true } else false }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
