package org.apache.spark.sql.graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.{Literal, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, Project, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DataType, StructType}

import graft.operators.Pipeline
import graft.sources.lake.GraftLakeTable

/** SQL `MERGE INTO` on a graft-lake table, routed onto the SPARSE
  * deletion-vector commit paths:
  *
  * {{{
  *   MERGE INTO corpus t USING updates s ON t.doc_id = s.doc_id
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * lands as ONE `merge` commit through
  * [[Pipeline.mergeIntoLakeSparse]]: matched pre-image rows tombstone
  * by deletion vector (zero survivor files rewritten), the upserts land
  * as genuinely-new data files, the CDC feed sees exactly the changes —
  * the same O(matched rows) write amplification the Scala path has,
  * now reachable from SQL/Python. `WHEN MATCHED THEN DELETE` (with no
  * insert branch) routes to [[Pipeline.deleteFromLakeSparse]] — the
  * tombstone-id-set form, stats-pruned by the source ids' bounds.
  *
  * Spark's own `MERGE` rewrite requires `SupportsRowLevelOperations` +
  * a full DSv2 delta-write machinery; this rule instead recognizes the
  * resolved [[MergeIntoTable]] over a [[GraftLakeTable]] relation during
  * analysis (the built-in rewrite ignores non-row-level tables) and
  * replaces it with a driver-routed command — one commit path, no
  * second write protocol. Supported shapes, refused LOUDLY otherwise
  * (never silently approximated):
  *
  *   - condition `t.<id> = s.<expr>` (either side order);
  *   - `WHEN MATCHED THEN UPDATE SET *` / explicit all-column SET with
  *     the SAME per-column expressions as the INSERT branch (upsert:
  *     matched rows are REPLACED by the source row — expressions may
  *     reference only the source);
  *   - `WHEN NOT MATCHED THEN INSERT *` / explicit all-column VALUES;
  *   - or `WHEN MATCHED THEN DELETE` alone.
  *
  * Duplicate source keys dedupe (last-writer-arbitrary) rather than
  * raising ANSI MERGE's cardinality error — documented divergence, the
  * upsert semantics of [[Pipeline.mergeIntoLakeSparse]].
  */
class ResolveLakeMerge(session: SparkSession) extends Rule[LogicalPlan] {

  private def lakeTable(plan: LogicalPlan): Option[GraftLakeTable] =
    EliminateSubqueryAliases(plan) match {
      case r: DataSourceV2Relation =>
        r.table match {
          case t: GraftLakeTable => Some(t)
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if m.resolved && lakeTable(m.targetTable).isDefined =>
      convert(m, lakeTable(m.targetTable).get)
    case u: UpdateTable if u.resolved && lakeTable(u.table).isDefined =>
      convertUpdate(u, lakeTable(u.table).get)
  }

  /** Swap resolved attribute references for by-name unresolved ones, so
    * the expression re-binds against the command's own lake read at run
    * time (the original exprIds died with the analyzed relation). */
  private def unresolve(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
  }

  /** `UPDATE lake SET col = expr, … WHERE pred` → ONE sparse commit
    * ([[Pipeline.updateLakeSparseWhere]]): matched rows tombstone by
    * deletion vector, the post-image rows land as new data files.
    * Assignments may reference the row's own columns. */
  private def convertUpdate(u: UpdateTable, table: GraftLakeTable): LogicalPlan = {
    if (table.lakePinned)
      refuse(s"cannot UPDATE a version/timestamp-pinned read of ${table.lakeDirPath}")
    val targetOut = u.table.outputSet
    val cond = u.condition.getOrElse(Literal.TrueLiteral)
    if (SubqueryExpression.hasSubquery(cond) ||
        u.assignments.exists(a => SubqueryExpression.hasSubquery(a.value)))
      refuse("UPDATE with subqueries is not supported")
    val sets = u.assignments.map {
      case Assignment(k: AttributeReference, v) if targetOut.contains(k) =>
        if (!v.references.subsetOf(targetOut))
          refuse(s"UPDATE assigns ${k.name} from outside the table")
        k.name -> unresolve(v)
      case Assignment(k, _) =>
        refuse(s"UPDATE assigns non-column ${k.sql} (nested fields unsupported)")
    }
    LakeUpdateCommand(table.lakeDirPath, ExprHolder(unresolve(cond)),
      sets.map { case (n, e) => (n, ExprHolder(e)) })
  }

  private def refuse(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-lake MERGE INTO: $why. Supported: ON t.<id> = s.<expr> with " +
        "[WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *] " +
        "(upsert; UPDATE and INSERT must assign the same source expressions) " +
        "or [WHEN MATCHED THEN DELETE] alone")

  private def convert(m: MergeIntoTable, table: GraftLakeTable): LogicalPlan = {
    if (table.lakePinned)
      refuse(s"cannot merge into a version/timestamp-pinned read of ${table.lakeDirPath}")
    if (m.withSchemaEvolution)
      refuse("WITH SCHEMA EVOLUTION is not supported (evolve through mergeSchema appends)")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")
    val targetOut = m.targetTable.outputSet
    val sourceOut = m.sourceTable.outputSet

    // ON t.<id> = s.<expr>: the target side must be a bare column (the
    // merge key the manifest stats prune on); the source side any
    // source-only expression
    val (idAttr, srcIdExpr) = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b) if targetOut.contains(a) &&
          b.references.subsetOf(sourceOut) => (a, b)
      case EqualTo(b, a: AttributeReference) if targetOut.contains(a) &&
          b.references.subsetOf(sourceOut) => (a, b)
      case other => refuse(s"condition ${other.sql} is not t.<id> = s.<expr>")
    }

    val lakeSchema = DataType.fromJson(table.lakeManifest.schemaJson)
      .asInstanceOf[StructType]
    val partitionCols = table.lakePartitionCols

    def assignMap(what: String, assigns: Seq[Assignment]): Map[String, Expression] = {
      val pairs = assigns.map {
        case Assignment(k: AttributeReference, v) if targetOut.contains(k) =>
          if (!v.references.subsetOf(sourceOut))
            refuse(s"$what assigns ${k.name} from an expression referencing the " +
              "target — matched rows are fully replaced, so only source " +
              "references are expressible")
          k.name -> v
        case Assignment(k, _) => refuse(s"$what assigns non-column ${k.sql}")
      }
      val names = pairs.map(_._1)
      val missing = lakeSchema.fieldNames.filterNot(names.contains)
      if (missing.nonEmpty)
        refuse(s"$what does not assign column(s) ${missing.mkString(", ")} — " +
          "every lake column must be set (use SET * / INSERT *)")
      pairs.toMap
    }

    (m.matchedActions, m.notMatchedActions) match {
      // upsert: UPDATE SET * + INSERT *
      case (Seq(UpdateAction(None, up, _)), Seq(InsertAction(None, ins))) =>
        val upMap = assignMap("UPDATE", up)
        val insMap = assignMap("INSERT", ins)
        lakeSchema.fieldNames.foreach { c =>
          if (!upMap(c).semanticEquals(insMap(c)))
            refuse(s"UPDATE and INSERT assign different expressions to $c — " +
              "split-shape merges are not expressible as one upsert")
        }
        val projected: Seq[NamedExpression] = lakeSchema.fields.toSeq.map { f =>
          Alias(Cast(upMap(f.name), f.dataType), f.name)()
        }
        LakeMergeIntoCommand(table.lakeDirPath, idAttr.name, partitionCols,
          Project(projected, m.sourceTable))
      // pure delete: WHEN MATCHED THEN DELETE
      case (Seq(DeleteAction(None)), Seq()) =>
        LakeDeleteMatchedCommand(table.lakeDirPath, idAttr.name,
          Project(Seq(Alias(srcIdExpr, idAttr.name)()), m.sourceTable))
      case (matched, notMatched) =>
        refuse(s"action shape [matched: ${matched.map(_.getClass.getSimpleName).mkString(",")}; " +
          s"not matched: ${notMatched.map(_.getClass.getSimpleName).mkString(",")}] " +
          "is not supported (conditional WHEN clauses included)")
    }
  }
}

/** The routed upsert: runs [[Pipeline.mergeIntoLakeSparse]] over the
  * source projection. A leaf command (the source plan re-enters query
  * planning inside `run` via `Dataset.ofRows`, getting its own
  * analysis/optimization pass). */
case class LakeMergeIntoCommand(lakeDir: String, idCol: String,
    partitionCols: Seq[String], updates: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(updates)
  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Pipeline.mergeIntoLakeSparse(classic, lakeDir,
      org.apache.spark.sql.classic.Dataset.ofRows(classic, updates),
      idCol, partitionCols)
    Seq.empty
  }
}

/** Opaque expression carrier: keeps the deliberately-UNRESOLVED
  * by-name expressions out of `QueryPlan.expressions`, so CheckAnalysis
  * does not reject the (fully intentional) unresolved attributes — they
  * re-bind against the command's own lake read at run time. */
case class ExprHolder(e: Expression)

/** The routed SQL UPDATE: [[Pipeline.updateLakeSparseWhere]] with the
  * condition and SET expressions re-bound by name over the lake read. */
case class LakeUpdateCommand(lakeDir: String, condition: ExprHolder,
    sets: Seq[(String, ExprHolder)]) extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    Pipeline.updateLakeSparseWhere(session, lakeDir,
      ColumnBridge.column(condition.e),
      sets.map { case (n, h) => n -> ColumnBridge.column(h.e) }.toMap)
    Seq.empty
  }
}

/** The routed matched-delete: [[Pipeline.deleteFromLakeSparse]] with the
  * source's id projection as the tombstone set. */
case class LakeDeleteMatchedCommand(lakeDir: String, idCol: String,
    tombstones: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(tombstones)
  override def run(session: SparkSession): Seq[Row] = {
    val classic = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    Pipeline.deleteFromLakeSparse(classic, lakeDir,
      org.apache.spark.sql.classic.Dataset.ofRows(classic, tombstones),
      idCol, idCol)
    Seq.empty
  }
}
