package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Manifest-resolved lake storage: the write-audit-publish commit protocol
  * under the px100-px103 lake lifecycle (cf. the transaction-log design of
  * open table formats — Armbrust et al., "Delta Lake: High-Performance ACID
  * Table Storage over Cloud Object Stores", VLDB 2020 — re-expressed in its
  * minimal single-writer form).
  *
  * The round-5 lake mutations rewrote partitions IN PLACE via dynamic
  * partition overwrite, which has two production-disqualifying failure
  * modes: (a) a crash mid-overwrite leaves a partition half-replaced with
  * the survivors unrecoverable (the pre-image was already clobbered), and
  * (b) a partition whose every row is deleted produces zero output rows, so
  * dynamic overwrite never touches its directory and the deleted rows
  * silently SURVIVE — data retention in a right-to-be-forgotten operator.
  * Both disappear when visibility is decoupled from file existence:
  *
  *   1. STAGE — mutations only ever APPEND new files (Spark's task/job
  *      UUID naming makes collisions impossible); the pre-image is never
  *      opened for write, so staging is recomputable and abortable at any
  *      point, and no self-overwrite checkpoint guard is needed at all;
  *   2. AUDIT — the staged files are read back and counted against the
  *      row count of the pre-write frame; a mismatch aborts (staged files
  *      deleted) before anything becomes visible;
  *   3. PUBLISH — a manifest listing exactly the live data files is
  *      renamed into `_graft_log/` (write-temp-then-rename: atomic on
  *      POSIX/HDFS; on object stores without atomic rename this is the
  *      documented swap-in point for a put-if-absent conditional write);
  *   4. VACUUM — files superseded by the commit are deleted best-effort
  *      AFTER the manifest lands; a crash mid-vacuum leaves orphans that
  *      are invisible to manifest readers and reclaimable by [[vacuum]].
  *
  * Readers resolve the latest manifest and load exactly its file list, so
  * at every instant they see the pre-commit lake or the post-commit lake,
  * never a mix. A fully-emptied partition simply has no files in the new
  * manifest — deletion-completeness by construction. Single-writer is the
  * assumed regime (a concurrent commit to the same version is detected and
  * refused, not merged).
  *
  * Directories without a `_graft_log` (plain `df.write.partitionBy`
  * layouts) bootstrap as version 0 = the current listing, so the protocol
  * retrofits onto any existing partitioned-parquet lake.
  *
  * Because every manifest is an immutable, self-contained file list, the
  * expensive-sounding lake features come out as near-trivial reads:
  * [[readVersion]] (time travel / audit reads), [[changesBetween]]
  * (incremental CDC-style consumption — the delta's files only),
  * schema evolution (the manifest carries the schema; every file projects
  * into it), and [[vacuumKeeping]] (retention: keep N versions readable,
  * reclaim the rest).
  */
object Lake {

  val LogDirName = "_graft_log"

  /** One resolved lake version: the schema (JSON, for empty-lake reads)
    * and the lakeDir-relative paths of every live data file. */
  final case class LakeState(version: Long, schemaJson: String, files: Seq[String])

  /** A staged-but-unpublished mutation: everything [[publish]] needs to
    * audit, commit, and vacuum. `removedFiles` are superseded pre-image
    * files (still live until publish); `stagedFiles` are written but
    * invisible to readers until the manifest lands; `schemaJson` is the
    * schema the new manifest records (the base's for mutations, the staged
    * data's for a first-ever ingest). */
  final case class StagedCommit(
      lakeDir: String,
      base: LakeState,
      schemaJson: String,
      removedFiles: Seq[String],
      stagedFiles: Seq[String],
      stagedRows: Long,
      expectedRows: Long)

  private def fsRoot(spark: SparkSession, lakeDir: String): (FileSystem, Path) = {
    val p = new Path(lakeDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    (fs, fs.makeQualified(p))
  }

  /** lakeDir-relative form of a data-file path. String-prefix based (not
    * `URI.relativize`) so `file:/x` vs `file:///x` authority-normalization
    * quirks can't silently yield absolute paths in a manifest. */
  private[graft] def relativize(root: Path, file: Path): String = {
    val rp = root.toUri.getPath.stripSuffix("/")
    val fp = file.toUri.getPath
    require(fp.startsWith(rp + "/"), s"$file is not under lake root $root")
    fp.substring(rp.length + 1)
  }

  /** Recursive listing of the lake's parquet data files as lakeDir-relative
    * paths; hidden trees (`_graft_log`, `_SUCCESS`, `.`-prefixed temp
    * files) are excluded. Used to bootstrap version 0 and to diff a staged
    * write's output; manifest readers never need it. A non-empty
    * `scopeDirs` (lakeDir-relative partition directories) restricts the
    * walk to exactly those subtrees — the listing cost of a surgical
    * mutation then tracks the AFFECTED partitions, not the lake. */
  private[graft] def listDataFiles(spark: SparkSession, lakeDir: String,
      scopeDirs: Seq[String] = Seq.empty): Seq[String] = {
    val (fs, root) = fsRoot(spark, lakeDir)
    val roots = if (scopeDirs.isEmpty) Seq(root) else scopeDirs.map(new Path(root, _))
    val out = Seq.newBuilder[String]
    roots.foreach { r =>
      if (fs.exists(r)) {
        val it = fs.listFiles(r, true)
        while (it.hasNext) {
          val f = it.next().getPath
          val rel = relativize(root, fs.makeQualified(f))
          val segments = rel.split('/')
          if (f.getName.endsWith(".parquet") &&
              !segments.exists(s => s.startsWith("_") || s.startsWith(".")))
            out += rel
        }
      }
    }
    out.result().distinct.sorted
  }

  /** The manifest files living under any of `dirs` (relative partition
    * directories). The manifest IS the lake's file census — partition
    * membership is the path prefix, so "which files does this mutation
    * supersede" is driver-side string work, never a Spark job. */
  private[graft] def filesUnder(files: Seq[String], dirs: Seq[String]): Seq[String] =
    files.filter(f => dirs.exists(d => f.startsWith(d + "/")))

  /** Render one typed partition-value row as its directory path, exactly
    * as Spark's writer lays it out. The value string is produced by the
    * same device the write path uses — a Catalyst `Cast(v, string)` with
    * the session time zone — so date/timestamp/decimal partition values
    * render identically to the directories the writer created (a raw
    * `toString` diverges for e.g. `java.sql.Timestamp`'s trailing `.0`);
    * Hive escaping and null → default partition then come from
    * `getPartitionPathString`. A wrong rendering for an exotic type is
    * still caught by the callers' sanity checks (each rendered dir must
    * own manifest files) — it can surface as a refused mutation, never a
    * wrong commit. Rows must carry their schema (collected frames do). */
  private[graft] def partitionDir(partitionCols: Seq[String], row: org.apache.spark.sql.Row): String = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    val tz = Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    partitionCols.zipWithIndex.map { case (c, i) =>
      val v =
        if (row.isNullAt(i)) null
        else {
          val lit = Literal.create(row.get(i), row.schema(i).dataType)
          String.valueOf(Cast(lit, org.apache.spark.sql.types.StringType, tz).eval(null))
        }
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.getPartitionPathString(c, v)
    }.mkString("/")
  }

  private def logDir(root: Path): Path = new Path(root, LogDirName)

  private def manifestName(version: Long): String = f"v$version%020d.manifest"

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  private def readManifestFile(fs: FileSystem, p: Path, v: Long): LakeState = {
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = text.split('\n').toSeq
    LakeState(v, lines.head, lines.tail.filter(_.nonEmpty))
  }

  /** A specific committed manifest; throws if `version` was never
    * committed. */
  private[graft] def manifestAt(spark: SparkSession, lakeDir: String, version: Long): LakeState = {
    val (fs, root) = fsRoot(spark, lakeDir)
    val target = new Path(logDir(root), manifestName(version))
    if (!fs.exists(target))
      throw new IllegalArgumentException(
        s"lake $lakeDir has no committed manifest version $version")
    readManifestFile(fs, target, version)
  }

  /** Latest committed manifest, if the lake has a log. */
  private[graft] def latestManifest(spark: SparkSession, lakeDir: String): Option[LakeState] = {
    val (fs, root) = fsRoot(spark, lakeDir)
    val log = logDir(root)
    if (!fs.exists(log)) return None
    val versions = fs.listStatus(log).toSeq
      .flatMap(s => parseVersion(s.getPath.getName).map(_ -> s.getPath))
    if (versions.isEmpty) return None
    val (v, p) = versions.maxBy(_._1)
    Some(readManifestFile(fs, p, v))
  }

  /** Current state: the latest manifest, or a bootstrap version 0 built
    * from the directory listing when the lake predates the log. */
  private[graft] def currentState(spark: SparkSession, lakeDir: String): LakeState =
    latestManifest(spark, lakeDir).getOrElse {
      val files = listDataFiles(spark, lakeDir)
      val schemaJson =
        if (files.isEmpty) StructType(Seq.empty).json
        else spark.read.parquet(lakeDir).schema.json
      LakeState(0L, schemaJson, files)
    }

  /** [[currentState]], but a non-empty manifest-less lake gets its
    * bootstrap listing COMMITTED as version 0 first. Every mutation
    * starts here: once v0 exists, [[read]] resolves through the log, so
    * the mutation's staged files are invisible from the first byte — on
    * a plain directory lake they would otherwise leak into directory
    * reads mid-stage. (An empty/missing lake skips the adopt commit;
    * there is nothing for a reader to see torn.) */
  private[graft] def adopt(spark: SparkSession, lakeDir: String): LakeState = {
    val st = currentState(spark, lakeDir)
    if (latestManifest(spark, lakeDir).isEmpty && st.files.nonEmpty)
      commit(spark, lakeDir, 0L, st.schemaJson, st.files)
    st
  }

  /** Read a specific file list under the manifest's recorded schema.
    * Applying the schema explicitly (instead of inferring from a sample
    * file) is what makes schema EVOLUTION sound: after a merge-schema
    * append the lake holds files written under different column sets, and
    * every file projects into the manifest schema with absent columns as
    * null — no mergeSchema footer sweep, no sample-file lottery. An empty
    * list reads as an empty frame with the same schema, so "every row
    * deleted" round-trips. Partition columns keep their recorded types. */
  private[graft] def readFiles(spark: SparkSession, lakeDir: String,
      schemaJson: String, files: Seq[String]): DataFrame = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val (_, root) = fsRoot(spark, lakeDir)
      val reader = spark.read.option("basePath", root.toString)
      (if (schema.nonEmpty) reader.schema(schema) else reader)
        .parquet(files.map(f => new Path(root, f).toString): _*)
    }
  }

  private[graft] def readState(spark: SparkSession, lakeDir: String, st: LakeState): DataFrame =
    readFiles(spark, lakeDir, st.schemaJson, st.files)

  /** The lake as its readers see it: resolved through the latest manifest
    * when one exists (staged-but-unpublished files are invisible; vacuum
    * lag is invisible), plain directory read otherwise. */
  def read(spark: SparkSession, lakeDir: String): DataFrame =
    latestManifest(spark, lakeDir) match {
      case Some(st) => readState(spark, lakeDir, st)
      case None     => spark.read.parquet(lakeDir)
    }

  /** Time travel: the lake exactly as manifest `version` committed it.
    * Free by construction — every manifest is immutable and lists its
    * full file set, so an audit/repro read of "the corpus the model was
    * trained on" is one manifest load, no log replay. Files superseded
    * AFTER `version` remain readable until an eager vacuum or [[vacuum]]
    * reclaims them; reading a vacuumed-away version fails loudly with
    * the missing files named. */
  def readVersion(spark: SparkSession, lakeDir: String, version: Long): DataFrame = {
    val (fs, root) = fsRoot(spark, lakeDir)
    val st = manifestAt(spark, lakeDir, version)
    val gone = st.files.filterNot(f => fs.exists(new Path(root, f)))
    if (gone.nonEmpty)
      throw new IllegalStateException(
        s"lake version $version is no longer reconstructible — " +
          s"${gone.size} file(s) vacuumed, e.g. ${gone.take(3).mkString(", ")}")
    readState(spark, lakeDir, st)
  }

  /** Append-mode write of `df` into the lake's partition layout, returning
    * the relative paths of the files it created (listing diff; the
    * single-writer regime makes the diff race-free). Nothing pre-existing
    * is opened, so a crash here strands invisible files at worst. When the
    * mutation can only land inside known partition directories (delete,
    * compact), pass them as `scopeDirs` so the diff lists O(affected)
    * files instead of walking the lake. */
  private[graft] def stageWrite(spark: SparkSession, lakeDir: String, df: DataFrame,
      partitionCols: Seq[String], writeOptions: Map[String, String] = Map.empty,
      scopeDirs: Seq[String] = Seq.empty): Seq[String] = {
    val before = listDataFiles(spark, lakeDir, scopeDirs).toSet
    df.write.mode("append").options(writeOptions)
      .partitionBy(partitionCols: _*).parquet(lakeDir)
    listDataFiles(spark, lakeDir, scopeDirs).filterNot(before)
  }

  /** Atomically commit a new manifest version. Refuses (rather than
    * clobbers) an already-committed version — the single-writer guard.
    * The guard is exists-check + rename + content read-back: on HDFS a
    * rename onto an existing destination fails outright; on filesystems
    * where rename OVERWRITES (POSIX / RawLocalFileSystem) two truly
    * concurrent publishes could both "succeed", so after the rename the
    * manifest is read back and compared to what this writer wrote — at
    * most one racer matches, the other throws with its commit un-landed.
    * (On object stores without atomic rename this whole method is the
    * documented swap-in point for a put-if-absent conditional write.) */
  private[graft] def commit(spark: SparkSession, lakeDir: String, version: Long,
      schemaJson: String, files: Seq[String]): Unit = {
    val (fs, root) = fsRoot(spark, lakeDir)
    val log = logDir(root)
    fs.mkdirs(log)
    val target = new Path(log, manifestName(version))
    if (fs.exists(target))
      throw new IllegalStateException(
        s"concurrent commit: manifest version $version already exists at $target")
    val payload = (schemaJson +: files.sorted).mkString("\n")
    val tmp = new Path(log, s".tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(payload.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit: rename to $target failed (version raced by another writer)")
    }
    val landed = readManifestFile(fs, target, version)
    if (landed.schemaJson != schemaJson || landed.files != files.sorted)
      throw new IllegalStateException(
        s"concurrent commit: manifest version $version was clobbered by another " +
          "writer after rename (overwrite-on-rename filesystem) — this commit lost")
  }

  private def deleteFiles(spark: SparkSession, lakeDir: String, files: Seq[String]): Unit = {
    val (fs, root) = fsRoot(spark, lakeDir)
    files.foreach(f => fs.delete(new Path(root, f), false))
  }

  /** Audit + commit + vacuum of a staged mutation. The audit gate is the
    * "verify" of write-audit-publish: staged read-back rows must equal the
    * pre-write frame's rows, or the staged files are deleted and the lake
    * is untouched (readers never saw them). Vacuum of the superseded
    * pre-image runs only AFTER the manifest rename — a crash between the
    * two leaves invisible orphans, not a corrupt lake. Pass
    * `vacuumSuperseded = false` to retain the pre-image files and keep
    * earlier versions [[readVersion]]-able (storage-for-history; reclaim
    * later by vacuuming against the version you are willing to lose). */
  private[graft] def publish(spark: SparkSession, sc: StagedCommit,
      vacuumSuperseded: Boolean = true): Unit = {
    if (sc.stagedRows != sc.expectedRows) {
      abort(spark, sc)
      throw new IllegalStateException(
        s"lake publish audit failed: staged ${sc.stagedRows} rows, " +
          s"expected ${sc.expectedRows} — staged files deleted, lake untouched")
    }
    val removed = sc.removedFiles.toSet
    commit(spark, sc.lakeDir, sc.base.version + 1, sc.schemaJson,
      sc.base.files.filterNot(removed) ++ sc.stagedFiles)
    if (vacuumSuperseded) deleteFiles(spark, sc.lakeDir, sc.removedFiles)
  }

  /** Roll back a staged-but-unpublished mutation: delete its invisible
    * staged files. The manifest never moved, so readers are unaffected. */
  private[graft] def abort(spark: SparkSession, sc: StagedCommit): Unit =
    deleteFiles(spark, sc.lakeDir, sc.stagedFiles)

  /** Create a lake: write the initial partition layout and commit manifest
    * version 1 over exactly the files that landed. Overwrite semantics —
    * anything at `lakeDir` (a previous run's lake, log included) is
    * replaced. Returns the read-back. */
  def init(spark: SparkSession, df: DataFrame, lakeDir: String,
      partitionCols: Seq[String]): DataFrame = {
    val (fs, root) = fsRoot(spark, lakeDir)
    if (fs.exists(root)) fs.delete(root, true)
    val files = stageWrite(spark, lakeDir, df, partitionCols)
    val schemaJson =
      if (files.isEmpty) df.schema.json
      else readFiles(spark, lakeDir, df.schema.json, files).schema.json
    commit(spark, lakeDir, 1L, schemaJson, files)
    read(spark, lakeDir)
  }

  /** Incremental (CDC-style) read: the rows ADDED between two committed
    * versions, computed by reading ONLY the files present in `toVersion`'s
    * manifest but not in `fromVersion`'s — never the lake. This is the
    * primitive an incremental consumer (nightly retraining, downstream
    * index refresh) runs instead of a full-corpus diff: for append-only
    * histories it is exactly the new documents, at the cost of the delta,
    * not the corpus. Rewritten files (delete/compact) surface their
    * surviving rows as "added" — set-difference against [[readVersion]]
    * of `fromVersion` if exact row-level CDC across rewrites is needed
    * (that cost is inherently O(both versions), which is why real CDC
    * logs record row-level actions; the manifest records file-level ones).
    */
  def changesBetween(spark: SparkSession, lakeDir: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val from = manifestAt(spark, lakeDir, fromVersion).files.toSet
    val to = manifestAt(spark, lakeDir, toVersion)
    readFiles(spark, lakeDir, to.schemaJson, to.files.filterNot(from))
  }

  /** Delete every data file the latest manifest does not reference —
    * reclaims orphans left by crashes between stage and publish (or
    * between publish and its eager vacuum). Returns what it deleted.
    * No-op on manifest-less lakes (nothing is provably dead there). */
  def vacuum(spark: SparkSession, lakeDir: String): Seq[String] =
    latestManifest(spark, lakeDir) match {
      case None => Seq.empty
      case Some(st) =>
        val live = st.files.toSet
        val dead = listDataFiles(spark, lakeDir).filterNot(live)
        deleteFiles(spark, lakeDir, dead)
        dead
    }

  /** Retention-policy vacuum: keep the newest `keepVersions` manifests
    * fully readable ([[readVersion]] / [[changesBetween]]), reclaim
    * everything older — data files referenced by no retained version are
    * deleted, then the expired manifests themselves (data first, so a
    * crash mid-vacuum leaves dangling manifests that fail loudly rather
    * than silently-live files). The latest version is always retained. */
  def vacuumKeeping(spark: SparkSession, lakeDir: String, keepVersions: Int): Seq[String] = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val (fs, root) = fsRoot(spark, lakeDir)
    val log = logDir(root)
    if (!fs.exists(log)) return Seq.empty
    val versions = fs.listStatus(log).toSeq
      .flatMap(s => parseVersion(s.getPath.getName)).sorted
    if (versions.isEmpty) return Seq.empty
    val (expired, retained) = versions.splitAt(math.max(versions.size - keepVersions, 0))
    val live = retained.flatMap(v => manifestAt(spark, lakeDir, v).files).toSet
    val dead = listDataFiles(spark, lakeDir).filterNot(live)
    deleteFiles(spark, lakeDir, dead)
    expired.foreach(v => fs.delete(new Path(log, manifestName(v)), false))
    dead
  }
}
