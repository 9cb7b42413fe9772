package graft.lake

import org.apache.spark.sql.{Column, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, Expression, Literal, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SQL `UPDATE` over [[SnapshotCatalog]] tables — the resolution rule
  * `graft.GraftExtensions` injects. Spark has no built-in UPDATE
  * execution for tables that don't implement the (heavyweight)
  * row-level-operation connector API; this rule routes a resolved
  * `UpdateTable` over a [[SnapshotParquetTable]] to
  * [[SnapshotLog.update]] instead — the merge-on-read form: ONE atomic
  * commit carrying deletion vectors for the matched rows plus their
  * updated copies as appends, O(matched rows) written, zero files
  * rewritten. Runs inside the analyzer's resolution fixed point, so it
  * fires before CheckAnalysis would reject the unrewritten command. */
case class ResolveSnapshotUpdate(spark: SparkSession) extends Rule[LogicalPlan] {

  /** The snapshot table under whatever aliasing the resolver wrapped
    * the target in (`UPDATE cat.t` resolves to SubqueryAlias(relation)). */
  private object SnapshotRel {
    def unapply(plan: LogicalPlan): Option[SnapshotParquetTable] = plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotParquetTable => Some(t)
        case _ => None
      }
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
        unapply(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u @ UpdateTable(SnapshotRel(tbl), assignments, condition)
        if u.childrenResolved &&
          assignments.forall(a => a.key.resolved && a.value.resolved) &&
          condition.forall(_.resolved) =>
      SnapshotUpdateCommand(tbl, assignments, condition)

    case m: MergeIntoTable if m.childrenResolved &&
        SnapshotRel.unapply(m.targetTable).isDefined &&
        m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++ m.notMatchedBySourceActions)
          .forall(actionResolved) =>
      val tbl = SnapshotRel.unapply(m.targetTable).get
      require(!m.withSchemaEvolution,
        "MERGE WITH SCHEMA EVOLUTION is not supported — evolve first via " +
          "SnapshotLog.write(mergeSchema = true)")
      SnapshotMergeCommand(tbl, m.targetTable, m.sourceTable, m.mergeCondition,
        m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions)
  }

  private def actionResolved(a: MergeAction): Boolean = a match {
    case UpdateAction(c, asg, _) => c.forall(_.resolved) &&
      asg.forall(x => x.key.resolved && x.value.resolved)
    case InsertAction(c, asg) => c.forall(_.resolved) &&
      asg.forall(x => x.key.resolved && x.value.resolved)
    case DeleteAction(c) => c.forall(_.resolved)
    case _ => false
  }
}

private[lake] object SnapshotDml {

  /** Fold every UNCORRELATED scalar subquery in `e` to the literal it
    * evaluates to — driver-side, BEFORE the command's own scan, so
    * `UPDATE t SET x = (SELECT max(y) FROM other)` works with standard
    * semantics (error on >1 row, NULL on 0 rows). The one SQL-snapshot
    * consistency caveat is documented loudly: the subquery reads the
    * state at evaluation time, the same behavior every
    * read-evaluate-commit engine gives an uncorrelated subquery.
    * CORRELATED subqueries (outer references into the target row) stay
    * refused — they would need a per-row join rewrite, a different
    * operator. */
  private[lake] def foldScalarSubqueries(session: SparkSession, e: Expression,
                                         stmt: String): Expression = {
    val folded = e.transform {
      case s: ScalarSubquery if s.outerAttrs.isEmpty =>
        val rows = GraftColumnBridge.ofRows(session, s.plan).limit(2).collect()
        if (rows.length > 1) throw new IllegalStateException(
          s"scalar subquery in $stmt returned more than one row")
        val value = if (rows.isEmpty) null else rows.head.get(0)
        Literal.create(value, s.dataType)
    }
    require(!SubqueryExpression.hasSubquery(folded),
      s"$stmt with a CORRELATED subquery is not supported on snapshot tables — " +
        "only uncorrelated scalar subqueries fold (rewrite the correlation as " +
        "a MERGE source join)")
    folded
  }
}

/** The driver-side command [[ResolveSnapshotUpdate]] plans: compiles
  * the resolved condition/assignments back to name-based Columns (the
  * update runs its own scan, so the original plan's attribute ids
  * would dangle) and delegates to [[SnapshotLog.update]]. Uncorrelated
  * scalar subqueries fold to literals first
  * ([[SnapshotDml.foldScalarSubqueries]]); correlated subqueries and
  * nested-field assignments are refused loudly. */
case class SnapshotUpdateCommand(table: SnapshotParquetTable,
                                 assignments: Seq[Assignment],
                                 condition: Option[Expression])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    require(table.writable,
      s"${table.name()} is a time-travel pin — UPDATE the table head (no AS OF)")
    def nameBased(e: Expression): Expression = {
      val folded = SnapshotDml.foldScalarSubqueries(session, e, "UPDATE")
      folded.transform { case a: AttributeReference => UnresolvedAttribute.quoted(a.name) }
    }
    val cond = condition.map(e => GraftColumnBridge.column(nameBased(e)))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val assigns = assignments.map { a =>
      val name = a.key match {
        case ar: AttributeReference => ar.name
        case other => throw new UnsupportedOperationException(
          s"UPDATE of nested field '$other' is not supported on snapshot tables")
      }
      name -> GraftColumnBridge.column(nameBased(a.value))
    }.toMap
    SnapshotLog.update(session, table.tablePath, cond, assigns)
    Nil
  }
}

/** The driver-side command for SQL `MERGE INTO` over a snapshot table:
  * compiles the resolved condition and action arms back to Columns over
  * the `_t`/`_s` aliases [[SnapshotLog.mergeInto]] exposes (attribute
  * OWNERSHIP — target vs source plan — decides the prefix, so shared
  * column names stay unambiguous), extracts the first equi-pair of the
  * merge condition as the zone-map prune key, and delegates. The
  * result is ONE atomic deletion-vector + append commit — SQL MERGE
  * with O(changed rows) written and zero files rewritten. */
case class SnapshotMergeCommand(table: SnapshotParquetTable,
                                targetPlan: LogicalPlan, sourcePlan: LogicalPlan,
                                mergeCondition: Expression,
                                matchedActions: Seq[MergeAction],
                                notMatchedActions: Seq[MergeAction],
                                notMatchedBySourceActions: Seq[MergeAction])
  extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    require(table.writable,
      s"${table.name()} is a time-travel pin — MERGE INTO the table head (no AS OF)")
    val tIds = AttributeSet(targetPlan.output)
    val sIds = AttributeSet(sourcePlan.output)
    def prefixed(e: Expression): Expression = {
      val folded = SnapshotDml.foldScalarSubqueries(session, e, "MERGE")
      folded.transform {
        case a: AttributeReference if tIds.contains(a) =>
          UnresolvedAttribute(Seq("_t", a.name))
        case a: AttributeReference if sIds.contains(a) =>
          UnresolvedAttribute(Seq("_s", a.name))
      }
    }
    def colOf(e: Expression): Column = GraftColumnBridge.column(prefixed(e))
    def asgMap(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"MERGE assignment to nested field '$other' is not supported")
        }
        name -> colOf(a.value)
      }.toMap
    val matched = matchedActions.map {
      case UpdateAction(c, asg, _) =>
        SnapshotLog.MatchedAction(c.map(colOf), Some(asgMap(asg)))
      case DeleteAction(c) => SnapshotLog.MatchedAction(c.map(colOf), None)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN MATCHED action: $other")
    }
    val notMatched = notMatchedActions.map {
      case InsertAction(c, asg) =>
        SnapshotLog.NotMatchedAction(c.map(colOf), asgMap(asg))
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED action: $other")
    }
    val notMatchedBySource = notMatchedBySourceActions.map {
      case UpdateAction(c, asg, _) =>
        SnapshotLog.MatchedAction(c.map(colOf), Some(asgMap(asg)))
      case DeleteAction(c) => SnapshotLog.MatchedAction(c.map(colOf), None)
      case other => throw new UnsupportedOperationException(
        s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
    }
    // first top-level equi-pair (t.k = s.k) of the condition = the
    // zone-map prune key for the target scan
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val pruneKey = conjuncts(mergeCondition).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tIds.contains(a) && sIds.contains(b) => (a.name, b.name)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if sIds.contains(b) && tIds.contains(a) => (a.name, b.name)
    }
    val source = GraftColumnBridge.ofRows(session, sourcePlan)
    SnapshotLog.mergeInto(session, table.tablePath, source,
      colOf(mergeCondition), matched, notMatched, pruneKey,
      notMatchedBySource = notMatchedBySource)
    Nil
  }
}
