package graft.storage

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, And => CAnd, AttributeReference, Cast, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** SQL DML front door for `graft-snapshot` tables (round 15): makes
  *
  * {{{
  *   DELETE FROM snap WHERE doc_id BETWEEN 50 AND 120
  *   MERGE INTO snap t USING updates s ON t.doc_id = s.doc_id
  *     WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * resolve over a table registered `USING graft-snapshot`, routing to
  * the store's copy-on-write [[SnapshotStore.deleteCondition]] /
  * [[SnapshotStore.merge]] — the read/write faces already spoke SQL
  * (`CREATE TABLE USING`), and mutation should too.
  *
  * Mechanics: Spark's parser + analyzer fully resolve `DeleteFromTable`
  * and `MergeIntoTable` even for a v1 relation (the "v2 tables only"
  * refusal fires at PLANNING, measured on 4.1) — so one injected
  * resolution rule ([[SnapshotDmlRule]], registered through
  * `GraftExtensions`) matches the RESOLVED command whose target is a
  * [[SnapshotFileIndex]]-backed relation and swaps in an eagerly-run
  * command. DELETE keeps the store's file-grain write-side skipping:
  * the resolved condition lowers to a [[SnapshotStore.FilePredicate]]
  * through the same conservative translation reads use, so provably
  * clean files are CARRIED, not rewritten. MERGE supports the canonical
  * upsert shape the store implements — unconditional `UPDATE SET *` +
  * `INSERT *` on an equality key — and refuses anything fancier loudly
  * (conditional/partial actions need a row-level-operation engine, not
  * a silent approximation).
  */
object SnapshotDmlRule extends Rule[LogicalPlan] {

  /** the snapshot table dir behind a resolved DML target, if any */
  private def snapshotDir(plan: LogicalPlan): Option[String] = plan match {
    case SubqueryAlias(_, child) => snapshotDir(child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case idx: SnapshotFileIndex => Some(idx.tableDir)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case d @ DeleteFromTable(target, cond)
        if target.resolved && cond.resolved =>
      snapshotDir(target)
        .map(dir => GraftDeleteCommand(dir, cond): LogicalPlan)
        .getOrElse(d)

    case m: MergeIntoTable if m.resolved =>
      snapshotDir(m.targetTable).map { dir =>
        convertMerge(dir, m): LogicalPlan
      }.getOrElse(m)

    case u @ UpdateTable(target, assignments, condition) if u.resolved =>
      snapshotDir(target).map { dir =>
        val assigns = assignments.map {
          case Assignment(a: AttributeReference, v) => a.name -> v
          case other => sys.error(
            s"graft-snapshot UPDATE supports column assignments only: $other")
        }
        GraftUpdateCommand(dir, assigns, condition): LogicalPlan
      }.getOrElse(u)
  }

  private def convertMerge(dir: String, m: MergeIntoTable): GraftMergeCommand = {
    def refuse(what: String): Nothing = sys.error(
      s"graft-snapshot MERGE INTO supports exactly 'WHEN MATCHED THEN " +
        s"UPDATE SET *' + 'WHEN NOT MATCHED THEN INSERT *' on an equality " +
        s"key — $what")
    if (m.notMatchedBySourceActions.nonEmpty)
      refuse("WHEN NOT MATCHED BY SOURCE is not supported")
    val updateAssigns = m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) => assigns
      case other => refuse(s"unsupported matched actions: $other")
    }
    val insertAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) => assigns
      case other => refuse(s"unsupported not-matched actions: $other")
    }
    // both actions must build the SAME delta row (the star expansion
    // does): target column -> source-side expression
    val targetCols = m.targetTable.output
    def byTarget(assigns: Seq[Assignment]): Map[String, Expression] =
      assigns.map {
        case Assignment(a: AttributeReference, v) => a.name -> v
        case other => refuse(s"non-column assignment target: $other")
      }.toMap
    val upd = byTarget(updateAssigns)
    val ins = byTarget(insertAssigns)
    targetCols.foreach { c =>
      val (u, i) = (upd.get(c.name), ins.get(c.name))
      if (u.isEmpty || i.isEmpty)
        refuse(s"column ${c.name} lacks an assignment (SET * / INSERT * " +
          "cover every column)")
      if (!u.get.semanticEquals(i.get))
        refuse(s"column ${c.name} is assigned differently on the matched " +
          "and not-matched branches")
    }
    // merge keys: every ON conjunct must be target.col = <the same
    // expression the actions assign to that column> — then "same key"
    // in the store's merge means exactly what the ON clause says
    val targetAttrIds = targetCols.map(_.exprId).toSet
    val keys = conjuncts(m.mergeCondition).map {
      case EqualTo(a: AttributeReference, v) if targetAttrIds(a.exprId) =>
        if (!ins(a.name).semanticEquals(v))
          refuse(s"ON binds ${a.name} to an expression the actions do not " +
            "assign to it")
        a.name
      case EqualTo(v, a: AttributeReference) if targetAttrIds(a.exprId) =>
        if (!ins(a.name).semanticEquals(v))
          refuse(s"ON binds ${a.name} to an expression the actions do not " +
            "assign to it")
        a.name
      case other => refuse(s"non-equality ON conjunct: $other")
    }.distinct
    if (keys.isEmpty) refuse("no key equality in the ON clause")
    // the delta frame: the insert projection over the source, aliased to
    // the target's column names (and ordered like the target)
    val delta = Project(
      targetCols.map(c => Alias(ins(c.name), c.name)()), m.sourceTable)
    GraftMergeCommand(dir, delta, keys)
  }
}

/** SQL time travel for `graft-snapshot` tables (round 15):
  *
  * {{{
  *   SELECT ... FROM snap VERSION AS OF 3
  *   SELECT ... FROM snap TIMESTAMP AS OF '2026-08-15 10:00:00'
  * }}}
  *
  * The analyzer REFUSES time travel over v1 relations before any
  * injected resolution rule can run (measured: `ResolveRelations`
  * throws `UNSUPPORTED_FEATURE.TIME_TRAVEL` eagerly), so this hooks the
  * PARSER instead — the Delta `DeltaSqlParser` shape: delegate the
  * parse, then rewrite `RelationTimeTravel` nodes whose (catalog-looked-
  * up) table is a `graft-snapshot` table into the version-pinned
  * index-backed relation. Unknown tables, other providers, and every
  * other statement pass through untouched. Version = the literal;
  * timestamp = any expression castable to TIMESTAMP (micros → the
  * store's millis), with a bare integral literal read as epoch MILLIS
  * (the store's own unit). */
final class SnapshotTimeTravelParser(spark: SparkSession,
                                     delegate: ParserInterface)
    extends ParserInterface {

  private def snapshotDirOf(nameParts: Seq[String]): Option[String] = {
    // a temp view SHADOWS a same-named catalog table in every other
    // reference of the session — the rewrite must not resolve past it
    // (Spark's own time-travel refusal then fires on the view)
    if (spark.sessionState.catalog.isTempView(nameParts)) return None
    val ident = nameParts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    try {
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      if (meta.provider.exists(_.equalsIgnoreCase("graft-snapshot")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString))
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def resolveVersion(dir: String, ts: Option[Expression],
                             version: Option[String]): Long =
    version.map(_.toLong).getOrElse {
      val e = ts.getOrElse(sys.error(
        "time travel needs VERSION AS OF or TIMESTAMP AS OF"))
      val millis = e.dataType match {
        case LongType | IntegerType =>
          // integral literal: epoch millis, the store's own unit
          e.eval(null).asInstanceOf[Number].longValue()
        case _ =>
          val zone = spark.sessionState.conf.sessionLocalTimeZone
          val micros = Cast(e, TimestampType, Option(zone)).eval(null)
          require(micros != null, s"cannot read $e as a timestamp")
          micros.asInstanceOf[Long] / 1000L
      }
      SnapshotStore.versionAtTimestamp(spark, dir, millis)
    }

  private def rewrite(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
        snapshotDirOf(u.multipartIdentifier) match {
          case Some(dir) =>
            val v = resolveVersion(dir, ts, version)
            SnapshotFileIndex.readAsOfTable(spark, dir, v)
              .queryExecution.logical
          case None => tt
        }
    }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String)
      : org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String)
      : org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String)
      : org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Eagerly-run `DELETE FROM <graft-snapshot table> WHERE cond`: one
  * copy-on-write [[SnapshotStore.deleteCondition]] commit. The resolved
  * condition serves twice — lowered to a [[SnapshotStore.FilePredicate]]
  * for write-side file skipping, and re-anchored BY NAME onto the
  * store's own read of the touched files for the row-level filter. */
final case class GraftDeleteCommand(dir: String, cond: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val prune = SnapshotFileIndex.fromCatalyst(cond)
    val rowCond = ColumnBridge.column(cond.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    SnapshotStore.deleteCondition(spark, dir, rowCond, prune)
    Seq.empty
  }
}

/** Eagerly-run `UPDATE <graft-snapshot table> SET ... [WHERE cond]`: one
  * copy-on-write [[SnapshotStore.updateCondition]] commit — the WHERE
  * lowers to FilePredicates for write-side skipping, every assignment's
  * right-hand side is re-anchored BY NAME (and evaluates against the
  * pre-update row — the store's staging contract). */
final case class GraftUpdateCommand(dir: String,
                                    assignments: Seq[(String, Expression)],
                                    condition: Option[Expression])
    extends LeafRunnableCommand {
  private def byName(e: Expression): org.apache.spark.sql.Column =
    ColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    val prune = condition.flatMap(SnapshotFileIndex.fromCatalyst)
    val rowCond = condition.map(byName).getOrElse(lit(true))
    SnapshotStore.updateCondition(spark, dir, rowCond, prune,
      assignments.map { case (c, v) => c -> byName(v) })
    Seq.empty
  }
}

/** Eagerly-run canonical-upsert `MERGE INTO`: materializes the source
  * projection and hands it to [[SnapshotStore.merge]] — same-key rows
  * replaced, new keys appended, off-envelope files carried untouched. */
final case class GraftMergeCommand(dir: String, delta: LogicalPlan,
                                   keys: Seq[String])
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(delta)
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotStore.merge(spark, dir,
      DatasetBridge.ofRows(spark, delta), keys)
    Seq.empty
  }
}
