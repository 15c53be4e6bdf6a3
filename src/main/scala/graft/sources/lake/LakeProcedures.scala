package graft.sources.lake

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.Scan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Lake, Pipeline}

/** Lake MAINTENANCE behind SQL `CALL` — Spark 4's `ProcedureCatalog`
  * surface (SPIP: stored procedures; the Iceberg `CALL cat.system.…`
  * idiom), so the operations that keep a 100 TB lake healthy need no
  * Scala entry point:
  *
  * {{{
  *   CALL graft_lake.system.vacuum(table => 'corpus', min_age_ms => 3600000)
  *   CALL graft_lake.system.vacuum_keeping(table => 'corpus', keep_versions => 10)
  *   CALL graft_lake.system.compact(table => 'corpus', target_rows_per_file => 4000000)
  *   CALL graft_lake.system.compact_dvs(table => 'corpus')
  *   CALL graft_lake.system.restore(table => 'corpus', version => 3)
  * }}}
  *
  * `table` is a catalog table name (or an absolute lake path). Every
  * procedure routes to the SAME Scala maintenance op the engine already
  * pins with specs — vacuum's grace windows, vacuumKeeping's retention
  * checkpoint, compaction's DV fold-away, restore's no-copy rollback —
  * and returns its facts as rows (reclaimed paths, folded sidecar
  * counts, the restored version) through the bounded driver-side scan
  * the metadata tables use. */
private[lake] object LakeProcedures {

  val All: Seq[String] =
    Seq("vacuum", "vacuum_keeping", "compact", "compact_dvs", "restore", "analyze",
      "repartition", "evolve_layout", "add_constraint", "drop_constraint",
      "set_bloom_cols", "checkpoint")

  private def spark: SparkSession = SparkSession.active

  private def p(name: String, dt: DataType) = ProcedureParameter.in(name, dt)

  private def s(v: String) = UTF8String.fromString(v)

  private val pathsSchema = StructType(Seq(
    StructField("reclaimed_path", StringType, nullable = false)))

  private def pathRows(paths: Seq[String]): Array[InternalRow] =
    paths.sorted.map(f => new GenericInternalRow(Array[Any](s(f))): InternalRow).toArray

  /** One procedure: fixed parameters, one result schema, a driver-side
    * body returning the result rows. `resolve` is the owning catalog's
    * table-name → directory mapping; a path-form `table` argument
    * bypasses it. */
  private final class LakeProc(procName: String, procDescription: String,
      params: Array[ProcedureParameter], outSchema: StructType,
      resolve: String => String,
      body: (String, InternalRow) => Array[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDescription
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val table = input.getUTF8String(0).toString
      val dir = if (table.startsWith("/")) table else resolve(table)
      val rows = body(dir, input)
      util.Collections.singletonList[Scan](
        new LakeMetaScan(procName, outSchema, () => rows)).iterator()
    }
  }

  private val tableParam =
    p("table", StringType).comment("catalog table name or absolute lake path").build()

  def load(name: String, resolve: String => String): UnboundProcedure = name match {
    case "vacuum" => new LakeProc("vacuum",
      "reclaim unreferenced data files and sidecars (invisible orphans); " +
        "min_age_ms is the in-flight-writer grace window",
      Array(tableParam,
        p("min_age_ms", LongType).defaultValue("0").build()),
      pathsSchema, resolve,
      (dir, in) => pathRows(Lake.vacuum(spark, dir, in.getLong(1))))
    case "vacuum_keeping" => new LakeProc("vacuum_keeping",
      "retire history and reclaim the files only it referenced — by " +
        "version count (keep_versions) or by age (retention_ms, the " +
        "'keep the last 7 days readable' policy); set exactly one",
      Array(tableParam,
        p("keep_versions", IntegerType).defaultValue("-1").build(),
        p("min_age_ms", LongType).defaultValue("0").build(),
        p("retention_ms", LongType).defaultValue("-1").build()),
      pathsSchema, resolve,
      (dir, in) => {
        val keep = in.getInt(1)
        val retention = in.getLong(3)
        (keep >= 0, retention >= 0) match {
          case (true, false) =>
            pathRows(Lake.vacuumKeeping(spark, dir, keep, in.getLong(2)))
          case (false, true) =>
            pathRows(Lake.vacuumKeepingAge(spark, dir, retention, in.getLong(2)))
          case _ => throw new IllegalArgumentException(
            "vacuum_keeping: set exactly one of keep_versions (count policy) or " +
              "retention_ms (age policy)")
        }
      })
    case "compact" => new LakeProc("compact",
      "bin-pack fragmented partitions and materialize deletion vectors " +
        "back into plain files; sort_by range-clusters the rewrite " +
        "(tight disjoint per-file min/max -> stats pruning); zorder " +
        "Morton-interleaves 2-4 dimensions (per-file bounding " +
        "hyper-rectangles -> any-column pruning); only_smaller_than " +
        "rewrites just the sub-threshold file tail (OPTIMIZE shape)",
      Array(tableParam,
        p("max_files_per_partition", IntegerType).defaultValue("1").build(),
        p("target_rows_per_file", LongType).defaultValue("4000000").build(),
        p("sort_by", StringType).defaultValue("''")
          .comment("comma-separated clustering columns; empty = bin-pack only").build(),
        p("zorder", StringType).defaultValue("''")
          .comment("2-4 comma-separated numeric columns; " +
            "alternative to sort_by").build(),
        p("only_smaller_than", LongType).defaultValue("0")
          .comment("only rewrite files under this byte size (0 = all files)").build()),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_live_files", IntegerType, nullable = false))),
      resolve,
      (dir, in) => {
        val cols = Lake.layoutSpecsOf(Lake.adopt(spark, dir))
        val sortBy = in.getUTF8String(3).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val zorder = in.getUTF8String(4).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val smaller = Some(in.getLong(5)).filter(_ > 0L)
        Pipeline.compactLake(spark, dir, maxFilesPerPartition = in.getInt(1),
          targetRowsPerFile = in.getLong(2), partitionCols = cols,
          sortCols = sortBy, retainHistory = true, zorderCols = zorder,
          onlyFilesSmallerThan = smaller)
        val st = Lake.currentState(spark, dir)
        Array(new GenericInternalRow(Array[Any](st.version, st.files.size)))
      })
    case "compact_dvs" => new LakeProc("compact_dvs",
      "fold each file's stacked deletion-vector sidecars into one " +
        "(vectors-only commit, zero data bytes, CDC-invisible)",
      Array(tableParam),
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("n_folded", IntegerType, nullable = false))),
      resolve,
      (dir, _) => Lake.compactDeletionVectors(spark, dir).toSeq.sortBy(_._1)
        .map { case (f, n) => new GenericInternalRow(Array[Any](s(f), n)): InternalRow }
        .toArray)
    case "checkpoint" => new LakeProc("checkpoint",
      "force a checkpoint at the latest version without waiting for the " +
        "interval grid (Iceberg rewrite_manifests parity) — after a bulk " +
        "ingest, readers resolve one checkpoint load instead of a delta " +
        "replay; idempotent",
      Array(tableParam),
      StructType(Seq(StructField("version", LongType, nullable = false),
        StructField("written", BooleanType, nullable = false))),
      resolve,
      (dir, _) => {
        val (v, wrote) = Lake.checkpointNow(spark, dir)
        Array(new GenericInternalRow(Array[Any](v, wrote)))
      })
    case "restore" => new LakeProc("restore",
      "roll the lake back to a retained version as a NEW commit (no bytes copied)",
      Array(tableParam, p("version", LongType).build()),
      StructType(Seq(StructField("restored_to_version", LongType, nullable = false),
        StructField("new_version", LongType, nullable = false))),
      resolve,
      (dir, in) => {
        val target = in.getLong(1)
        Lake.restore(spark, dir, target)
        Array(new GenericInternalRow(Array[Any](
          target, Lake.currentState(spark, dir).version)))
      })
    case "analyze" => new LakeProc("analyze",
      "backfill per-file min/max stats for the named columns (metadata-only " +
        "commit) so scans stat-prune a lake that was adopted or written " +
        "without statsCols; scope bounds the pass to partition-dir prefixes " +
        "(the incremental form)",
      Array(tableParam,
        p("columns", StringType).comment("comma-separated column names").build(),
        p("scope", StringType).defaultValue("''")
          .comment("comma-separated partition-dir prefixes; empty = whole lake").build()),
      StructType(Seq(
        StructField("n_files_analyzed", IntegerType, nullable = false),
        StructField("columns", StringType, nullable = false))),
      resolve,
      (dir, in) => {
        val cols = in.getUTF8String(1).toString.split(',').map(_.trim).filter(_.nonEmpty)
        val scope = in.getUTF8String(2).toString.split(',').map(_.trim).filter(_.nonEmpty)
        val stats = Lake.analyzeStats(spark, dir, cols.toSeq, scope.toSeq)
        Array(new GenericInternalRow(Array[Any](stats.size, s(cols.mkString(",")))))
      })
    case "repartition" => new LakeProc("repartition",
      "change the lake's partition layout in one audited rewrite commit " +
        "(a full rewrite, priced honestly — no metadata trick relayouts " +
        "directories); old layout stays readable as history",
      Array(tableParam,
        p("partition_by", StringType)
          .comment("comma-separated new partition columns; empty = unpartitioned").build(),
        p("target_rows_per_file", LongType).defaultValue("4000000").build(),
        p("sort_by", StringType).defaultValue("''")
          .comment("comma-separated clustering columns within the new layout").build()),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_live_files", IntegerType, nullable = false))),
      resolve,
      (dir, in) => {
        val parts = in.getUTF8String(1).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val sortBy = in.getUTF8String(3).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        Pipeline.repartitionLake(spark, dir, parts,
          targetRowsPerFile = in.getLong(2), sortCols = sortBy)
        val st = Lake.currentState(spark, dir)
        Array(new GenericInternalRow(Array[Any](st.version, st.files.size)))
      })
    case "evolve_layout" => new LakeProc("evolve_layout",
      "change the partition layout for NEW writes as a METADATA commit " +
        "(Iceberg partition-spec evolution: existing files stay put, readers " +
        "union the generations; CALL repartition is the optional compaction)",
      Array(tableParam,
        p("partition_by", StringType)
          .comment("comma-separated new partition columns; empty = unpartitioned").build()),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("n_generations", IntegerType, nullable = false))),
      resolve,
      (dir, in) => {
        val parts = in.getUTF8String(1).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        Lake.evolveLayout(spark, dir, parts)
        val st = Lake.currentState(spark, dir)
        Array(new GenericInternalRow(Array[Any](st.version,
          Lake.layoutGenerationsOf(st).size)))
      })
    case "set_bloom_cols" => new LakeProc("set_bloom_cols",
      "record the bloom-filter column set as a METADATA commit: every " +
        "later data write carries per-file parquet footer blooms for " +
        "these columns, and sparse merges/deletes + equality point " +
        "lookups file-skip keys min/max stats cannot prune (existing " +
        "files keep until compaction rewrites them)",
      Array(tableParam,
        p("columns", StringType)
          .comment("comma-separated integral/string key columns; " +
            "empty = disable for new writes").build()),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("bloom_cols", StringType, nullable = false))),
      resolve,
      (dir, in) => {
        val cols = in.getUTF8String(1).toString
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        Lake.setBloomCols(spark, dir, cols)
        val st = Lake.currentState(spark, dir)
        Array(new GenericInternalRow(Array[Any](st.version,
          s(st.bloomCols.mkString(",")))))
      })
    case "add_constraint" => new LakeProc("add_constraint",
      "add a CHECK constraint (validates the existing corpus in one scan, " +
        "then a metadata commit) — every later row-adding write verifies it " +
        "and refuses violating batches loudly",
      Array(tableParam,
        p("name", StringType).build(),
        p("expression", StringType).comment("SQL predicate over the lake's columns").build()),
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("expression", StringType, nullable = false))),
      resolve,
      (dir, in) => {
        val (n, e) = (in.getUTF8String(1).toString, in.getUTF8String(2).toString)
        Lake.addCheckConstraint(spark, dir, n, e)
        Array(new GenericInternalRow(Array[Any](s(n), s(e))))
      })
    case "drop_constraint" => new LakeProc("drop_constraint",
      "drop a CHECK constraint (metadata commit; enforcement stops at this version)",
      Array(tableParam, p("name", StringType).build()),
      StructType(Seq(StructField("name", StringType, nullable = false))),
      resolve,
      (dir, in) => {
        val n = in.getUTF8String(1).toString
        Lake.dropCheckConstraint(spark, dir, n)
        Array(new GenericInternalRow(Array[Any](s(n))))
      })
    case other => throw new IllegalArgumentException(
      s"graft-lake catalog: unknown procedure '$other' — available: ${All.mkString(", ")}")
  }
}
