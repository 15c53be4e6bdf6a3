package graft.sources.lake

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Lake

/** Named-catalog surface for graft lakes — SQL users stop passing paths:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_lake",
  *     "graft.sources.lake.LakeCatalog")
  *   spark.conf.set("spark.sql.catalog.graft_lake.warehouse", "/lakes")
  *
  *   SELECT * FROM graft_lake.corpus                      -- /lakes/corpus
  *   SELECT * FROM graft_lake.corpus VERSION AS OF 2      -- time travel
  *   SELECT * FROM graft_lake.corpus TIMESTAMP AS OF '…'
  *   INSERT INTO graft_lake.corpus SELECT …               -- protocol commit
  *   DELETE FROM graft_lake.corpus WHERE …                -- sparse DV commit
  *   MERGE INTO graft_lake.corpus t USING u s ON …        -- sparse merge
  * }}}
  *
  * A `TableCatalog` whose identity IS the filesystem layout: table
  * `db.t` lives at `<warehouse>/db/t`, and a backtick-quoted absolute
  * path (`` graft_lake.`/abs/path` ``) addresses a lake directly — the
  * Delta-style path-table idiom. Tables resolve through the SAME
  * [[LakeSource]] machinery as the format string (manifest isolation,
  * stat-pruned scans, merge-on-read under deletion vectors, the
  * protocol write path), so the catalog adds naming and the standard
  * `VERSION AS OF` / `TIMESTAMP AS OF` syntax, not a second read path.
  *
  * `CREATE TABLE` commits an EMPTY unpartitioned lake (version 1, the
  * schema recorded) so `INSERT INTO` can bootstrap it; a PARTITIONED
  * create refuses — an empty lake has no file layout to record
  * partition columns in, so partitioned lakes are created by their
  * first data write (`Lake.init` / `ingestToLake`) and then named here.
  * `DROP TABLE` deletes the lake directory (the path is the identity —
  * there is no registration to remove). `ALTER TABLE` routes the
  * metadata-commit evolutions (rename / drop / widen / add column). */
class LakeCatalog extends TableCatalog with ProcedureCatalog {
  private var catalogName: String = _
  private var warehouse: Option[String] = None

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
  }
  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def dirFor(ident: Identifier): String = {
    if (ident.name.startsWith("/")) {
      require(ident.namespace.isEmpty,
        s"graft-lake catalog: a path-addressed table takes no namespace, got " +
          s"${ident.namespace.mkString(".")}.${ident.name}")
      ident.name
    } else warehouse match {
      case Some(w) => (w.stripSuffix("/") +: (ident.namespace :+ ident.name)).mkString("/")
      case None => throw new IllegalArgumentException(
        s"graft-lake catalog '$catalogName' has no warehouse configured — set " +
          s"spark.sql.catalog.$catalogName.warehouse, or address lakes by absolute " +
          s"path: $catalogName.`/path/to/lake`")
    }
  }

  private def isLake(dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && (fs.exists(new Path(p, Lake.LogDirName)) ||
      Lake.hasAnyDataFile(spark, dir))
  }

  private def tableAt(ident: Identifier, version: Option[String],
      timestampAsOf: Option[String]): Table = {
    // `corpus$history` / `$files` / `$txns` — the metadata tables
    // ([[LakeMetaTables]]); the suffix is parsed off the NAME, so both
    // named and path-addressed (`graft_lake.`/lake$files``) forms work
    LakeMetaTables.parse(ident.name) match {
      case Some((base, kind)) =>
        val dir = dirFor(Identifier.of(ident.namespace, base))
        if (!isLake(dir)) throw new NoSuchTableException(ident)
        val pinned: Option[Long] = (version, timestampAsOf) match {
          case (Some(v), _) => Some(v.toLongOption.getOrElse(
            throw new IllegalArgumentException(
              s"graft-lake catalog: VERSION AS OF on a metadata table takes a " +
                s"version number, got '$v'")))
          case (_, Some(ts)) => Some(Lake.versionAtTimestamp(spark, dir, ts.toLong))
          case _ => None
        }
        return LakeMetaTables.table(spark, dir, kind, pinned)
      case None => ()
    }
    val dir = dirFor(ident)
    if (!isLake(dir)) throw new NoSuchTableException(ident)
    val props = new util.HashMap[String, String]()
    props.put("path", dir)
    version.foreach(props.put("version", _))
    timestampAsOf.foreach(props.put("timestampAsOf", _))
    new LakeSource().getTable(null, Array.empty, props)
  }

  override def loadTable(ident: Identifier): Table = tableAt(ident, None, None)

  /** `VERSION AS OF v` — the catalog time-travel overload. */
  override def loadTable(ident: Identifier, version: String): Table =
    tableAt(ident, Some(version), None)

  /** `TIMESTAMP AS OF t` — Spark passes MICROseconds since epoch. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table =
    tableAt(ident, None, Some((timestampMicros / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean =
    LakeMetaTables.parse(ident.name) match {
      case Some((base, _)) => isLake(dirFor(Identifier.of(ident.namespace, base)))
      case None => isLake(dirFor(ident))
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val w = warehouse.getOrElse(throw new NoSuchNamespaceException(namespace))
    val base = new Path((w.stripSuffix("/") +: namespace).mkString("/"))
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(base).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isLake((w.stripSuffix("/") +: namespace :+ n).mkString("/")))
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        "graft-lake catalog: CREATE TABLE with partitioning is not supported — an " +
          "empty lake has no file layout to record partition columns in; create " +
          "partitioned lakes with their first data write (Lake.init / ingestToLake), " +
          "then query them by name")
    val dir = dirFor(ident)
    // the catalog's identity IS the filesystem layout (no metastore to
    // record a divergent location in), so a LOCATION that disagrees with
    // the name-derived path would be silently lost on the next
    // loadTable — refuse it loudly instead of creating the lake
    // somewhere the name will never find again
    Option(properties.get("location"))
      .map(_.stripSuffix("/")).filter(_ != dir.stripSuffix("/"))
      .foreach { loc =>
        throw new UnsupportedOperationException(
          s"graft-lake catalog: CREATE TABLE ... LOCATION '$loc' disagrees with the " +
            s"name-derived path '$dir' — this catalog has no metastore, the table " +
            "name IS the path; either create the lake at the derived path or " +
            s"address it by path: $catalogName.`$loc`")
      }
    // an empty UNPARTITIONED lake: version 1 commits the schema over no
    // files, so INSERT INTO bootstraps the layout
    Lake.commitDelta(spark, dir,
      Lake.DeltaRecord(1L, "init", schema.json, Seq.empty, Seq.empty),
      Some(Lake.LakeState(1L, schema.json, Seq.empty)))
    loadTable(ident)
  }

  /** `ALTER TABLE graft_lake.t RENAME COLUMN a TO b` / `DROP COLUMN a`
    * / `ALTER COLUMN a TYPE <wider>` / `ADD COLUMN c <type>` — the
    * METADATA-COMMIT evolutions ([[Lake.renameColumn]] /
    * [[Lake.dropColumn]] / [[Lake.widenColumn]] / [[Lake.addColumn]]:
    * zero data bytes move). Non-widening retypes, NOT NULL adds and
    * positioned adds refuse naming the alternative.
    *
    * Changes apply as SEPARATE metadata commits in order: a multi-change
    * ALTER that fails midway leaves the earlier changes committed (each
    * is independently valid and versioned — re-issue the remainder). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = dirFor(ident)
    if (!isLake(dir)) throw new NoSuchTableException(ident)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        if (r.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            "graft-lake catalog: nested-field rename is not supported")
        Lake.renameColumn(spark, dir, r.fieldNames()(0), r.newName())
      case d: TableChange.DeleteColumn =>
        if (d.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            "graft-lake catalog: nested-field drop is not supported")
        Lake.dropColumn(spark, dir, d.fieldNames()(0))
      case t: TableChange.UpdateColumnType =>
        if (t.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            "graft-lake catalog: nested-field retype is not supported")
        // widening promotions land as metadata commits
        // ([[Lake.widenColumn]]); anything else refuses there, naming
        // the rewrite
        Lake.widenColumn(spark, dir, t.fieldNames()(0), t.newDataType())
      case a: TableChange.AddColumn =>
        if (a.fieldNames.length != 1)
          throw new UnsupportedOperationException(
            "graft-lake catalog: nested-field add is not supported")
        if (!a.isNullable)
          throw new UnsupportedOperationException(
            "graft-lake catalog: ADD COLUMN ... NOT NULL is not supported — no " +
              "existing row could satisfy it; add the column nullable, backfill, " +
              "then gate new writes with a CHECK constraint")
        if (a.position() != null)
          throw new UnsupportedOperationException(
            "graft-lake catalog: ADD COLUMN with a position (FIRST/AFTER) is not " +
              "supported — new columns append at the end of the schema")
        // a metadata commit ([[Lake.addColumn]]): old files read null,
        // new writes land values — zero data bytes move
        Lake.addColumn(spark, dir, a.fieldNames()(0), a.dataType())
      case other =>
        throw new UnsupportedOperationException(
          s"graft-lake catalog: ALTER TABLE change $other is not supported — " +
            "non-widening type changes need a rewrite")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!isLake(dir)) return false
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(p, true)
  }

  /** `CALL graft_lake.system.<proc>(table => 't', …)` — the maintenance
    * surface ([[LakeProcedures]]). The `system` namespace is
    * conventional (the Iceberg idiom) but not enforced: a bare
    * `graft_lake.vacuum(…)` resolves too. */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    if (!(ident.namespace.isEmpty || ident.namespace.sameElements(Array("system"))))
      throw new IllegalArgumentException(
        s"graft-lake catalog: procedures live under the 'system' namespace, got " +
          ident.namespace.mkString("."))
    LakeProcedures.load(ident.name, table => {
      val parts = table.split('.')
      dirFor(Identifier.of(parts.init, parts.last))
    })
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      LakeProcedures.All.map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val from = new Path(dirFor(oldIdent))
    val to = new Path(dirFor(newIdent))
    val fs = from.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(to.getParent)
    if (!fs.rename(from, to))
      throw new IllegalStateException(
        s"graft-lake catalog: rename $from -> $to failed (filesystem refused)")
  }
}
