package graft.lake

import org.apache.spark.sql.{Column, GraftColumnBridge, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, AttributeSet, EqualTo, Expression, Literal, OuterReference, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Assignment, DeleteAction, Filter, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
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
      // expressions ride in an OPAQUE holder: everything is fully
      // resolved by the guards above, and CheckAnalysis would otherwise
      // reject a correlated assignment subquery because this command is
      // not one of the blessed UPDATE/MERGE/DELETE node classes — the
      // command validates and executes the trees itself
      SnapshotUpdateCommand(tbl, new UpdateArgs(assignments, condition))

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

  /** Inline `With` common-expression wrappers (what `BETWEEN` resolves
    * to) by substituting each `CommonExpressionRef` with its def's
    * child. The DML commands re-compile expressions to NAME-based forms
    * (attribute → UnresolvedAttribute), and a `With` node's own
    * `withNewChildrenInternal` calls `dataType` on its defs — which
    * explodes once a def's child is unresolved. Inlining first keeps
    * the trees plain; semantics are identical (the sharing is a
    * codegen-dedup optimization, not a meaning change). */
  private[lake] def inlineWith(e: Expression): Expression = e.transformUp {
    case w: org.apache.spark.sql.catalyst.expressions.With =>
      val byId = w.defs.map(d => d.id -> d.child).toMap
      w.child.transform {
        case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
          byId.getOrElse(r.id, r)
      }
  }

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

/** Opaque (non-TreeNode-traversed) carrier for the UPDATE's resolved
  * expression trees — see the construction-site comment in
  * [[ResolveSnapshotUpdate]]. */
final class UpdateArgs(val assignments: Seq[Assignment],
                       val condition: Option[Expression]) extends Serializable

/** The driver-side command [[ResolveSnapshotUpdate]] plans: compiles
  * the resolved condition/assignments back to name-based Columns (the
  * update runs its own scan, so the original plan's attribute ids
  * would dangle) and delegates to [[SnapshotLog.update]]. Uncorrelated
  * scalar subqueries fold to literals first
  * ([[SnapshotDml.foldScalarSubqueries]]); a correlated ASSIGNMENT
  * subquery of the equality-join shape rewrites through
  * [[SnapshotLog.mergeInto]] ([[runCorrelated]]); every other
  * correlated shape and nested-field assignments refuse loudly. */
case class SnapshotUpdateCommand(table: SnapshotParquetTable,
                                 args: UpdateArgs)
  extends LeafRunnableCommand {

  // With-wrappers (BETWEEN) inlined once, up front — every downstream
  // consumer re-compiles these trees to name-based forms
  private lazy val assignments: Seq[Assignment] = args.assignments.map(a =>
    a.copy(value = SnapshotDml.inlineWith(a.value)))
  private lazy val condition: Option[Expression] =
    args.condition.map(SnapshotDml.inlineWith)

  override def run(session: SparkSession): Seq[Row] = {
    require(table.writable,
      s"${table.name()} is a time-travel pin — UPDATE the table head (no AS OF)")
    val corrInAssigns = assignments.flatMap(a => a.value.collect {
      case s: ScalarSubquery if s.outerAttrs.nonEmpty => s
    })
    val corrInCond = condition.toSeq.flatMap(_.collect {
      case s: ScalarSubquery if s.outerAttrs.nonEmpty => s
    })
    if (corrInAssigns.nonEmpty || corrInCond.nonEmpty)
      return runCorrelated(session, corrInAssigns, corrInCond)
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

  /** CORRELATED-subquery UPDATE via the MERGE-shaped join machinery:
    * `SET x = (SELECT <agg> FROM src WHERE src.k = t.k [AND …])`
    * rewrites to
    *
    * {{{
    *   MERGE INTO t USING (SELECT k…, <agg> AS _sq_val FROM src
    *                       [WHERE residual] GROUP BY k…) s
    *   ON t.k = s.k
    *   WHEN MATCHED [AND <where>]  THEN UPDATE SET x = s._sq_val, …
    *   WHEN NOT MATCHED BY SOURCE [AND <where>]
    *                               THEN UPDATE SET x = <empty-agg>, …
    * }}}
    *
    * — ONE atomic deletion-vector + append commit through
    * [[SnapshotLog.mergeInto]], O(matched rows) written. The
    * not-matched-by-source arm preserves SQL semantics for target rows
    * with NO source match: their subquery evaluates to the aggregate
    * over ZERO rows (NULL for max/min/sum/avg, 0 for count), computed
    * once as `<empty-agg>` — the aggregate run over the empty source —
    * and assigned as a literal. Correlation must be equality-only
    * conjuncts (`src.k = t.k`); residual source-only conjuncts stay on
    * the source scan. Unsupported shapes — correlation in WHERE,
    * multiple correlated subqueries, non-equality correlation, outer
    * references inside the aggregate, a non-aggregate subquery —
    * refuse loudly (a silent mis-rewrite would corrupt rows). */
  private def runCorrelated(session: SparkSession,
                            inAssigns: Seq[ScalarSubquery],
                            inCond: Seq[ScalarSubquery]): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    def refuse(why: String): Nothing = throw new UnsupportedOperationException(
      s"UPDATE with this correlated-subquery shape is not supported on snapshot " +
        s"tables ($why) — supported: ONE assignment subquery of the form " +
        "SET x = (SELECT <agg> FROM src WHERE src.k = t.k [AND source-only …])")
    if (inCond.nonEmpty) refuse("correlated subquery in the WHERE clause")
    if (inAssigns.size > 1) refuse("more than one correlated subquery")
    val sub = inAssigns.head
    val (aggAlias, fcond, srcPlan) = sub.plan match {
      case Aggregate(Seq(), Seq(a: Alias), Filter(fc, src), _) => (a, fc, src)
      case _ => refuse("subquery is not a single aggregate over a filtered source")
    }
    require(aggAlias.child.exists(_.isInstanceOf[AggregateExpression]),
      "correlated subquery must compute an aggregate")
    if (aggAlias.child.exists(_.isInstanceOf[OuterReference]))
      refuse("outer reference inside the aggregate expression")

    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val srcOut = AttributeSet(srcPlan.output)
    val pairs = Seq.newBuilder[(AttributeReference, AttributeReference)]
    val residual = Seq.newBuilder[Expression]
    conjuncts(fcond).foreach {
      case EqualTo(in: AttributeReference, OuterReference(out: AttributeReference))
          if srcOut.contains(in) => pairs += ((in, out))
      case EqualTo(OuterReference(out: AttributeReference), in: AttributeReference)
          if srcOut.contains(in) => pairs += ((in, out))
      case other if other.exists(_.isInstanceOf[OuterReference]) =>
        refuse("non-equality correlation predicate")
      case other => residual += other
    }
    val corrPairs = pairs.result()
    if (corrPairs.isEmpty) refuse("no equality correlation found")

    def nameBased(e: Expression): Column = GraftColumnBridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    val srcBase = GraftColumnBridge.ofRows(session,
      residual.result().foldLeft(srcPlan)((p, e) => Filter(e, p)))
    val aggCol = nameBased(aggAlias.child)
    val innerNames = corrPairs.map(_._1.name).distinct
    require(!innerNames.contains("_sq_val") &&
      !srcBase.columns.contains("_sq_val"),
      "source column '_sq_val' clashes with the rewrite's working column")
    val srcAgg = srcBase.groupBy(innerNames.map(col): _*).agg(aggCol.as("_sq_val"))
    // the empty-group value: the aggregate over ZERO rows (NULL for
    // max/min, 0 for count) — what SQL gives a target row with no match
    val emptyVal = srcBase.limit(0).agg(aggCol.as("_sq_val")).head().get(0)

    def targetPrefixed(e: Expression): Expression = e.transform {
      case a: AttributeReference => UnresolvedAttribute(Seq("_t", a.name))
    }
    def assignCols(subReplacement: Expression): Map[String, Column] =
      assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => throw new UnsupportedOperationException(
            s"UPDATE of nested field '$other' is not supported on snapshot tables")
        }
        val folded = SnapshotDml.foldScalarSubqueries(session,
          a.value.transform { case s: ScalarSubquery if s eq sub => subReplacement },
          "UPDATE")
        name -> GraftColumnBridge.column(targetPrefixed(folded))
      }.toMap
    val armCond: Option[Column] = condition.map { c =>
      val folded = SnapshotDml.foldScalarSubqueries(session, c, "UPDATE")
      GraftColumnBridge.column(targetPrefixed(folded))
    }
    val mergeCond = corrPairs.map { case (in, out) =>
      col(s"_t.${out.name}") === col(s"_s.${in.name}")
    }.reduce(_ && _)
    SnapshotLog.mergeInto(session, table.tablePath, srcAgg, mergeCond,
      matched = Seq(SnapshotLog.MatchedAction(armCond,
        Some(assignCols(UnresolvedAttribute(Seq("_s", "_sq_val")))))),
      notMatched = Nil,
      pruneKey = Some((corrPairs.head._2.name, corrPairs.head._1.name)),
      notMatchedBySource = Seq(SnapshotLog.MatchedAction(armCond,
        Some(assignCols(Literal.create(emptyVal, sub.dataType))))))
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
      val folded = SnapshotDml.foldScalarSubqueries(session,
        SnapshotDml.inlineWith(e), "MERGE")
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
