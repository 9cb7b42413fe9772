package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, col, count, lit, max, min, sum}
import org.apache.spark.sql.types._

/** FILTERED aggregate pushdown into footer statistics for SQL over
  * [[SnapshotCatalog]] tables — the resolution rule
  * `graft.GraftExtensions` injects.
  *
  * [[ManifestAgg]] (the DSv2 `SupportsPushDownAggregates` path) serves
  * `SELECT count(*)/min(c)/max(c) FROM snap.t` as a zero-job
  * `LocalTableScan`, but dies the moment ANY filter appears — and the
  * dominant maintenance aggregate at 100 TB is exactly
  * `SELECT count(*) … WHERE c BETWEEN lo AND hi`. The API layer
  * already solved that shape ([[StatsAgg.rangeAggFiles]],
  * oracle-verified as `lake_agg_pushdown`): classify each live file
  * against the range from cached footer stats, answer COVERED files
  * from their footers alone, scan ONLY the boundary files. This rule
  * surfaces the same machinery in SQL by rewriting
  *
  * {{{ Aggregate(Nil, aggs, Filter(range-on-c, snapshotRelation)) }}}
  *
  * into: driver-computed covered partials (a one-row LocalRelation)
  * UNION a pushed-predicate scan of the boundary files, then the final
  * fold — on a clustered table the range covers every interior file,
  * so the query costs a cached footer sweep plus ~2 boundary-file
  * scans instead of a full pass.
  *
  * SOUNDNESS GATES (any miss leaves the plan untouched — the stock
  * scan with zone-map pruning still runs, never a wrong answer):
  *  - the version carries NO deletion vectors (footer counts would
  *    count dead rows);
  *  - no GROUP BY, no DISTINCT, no FILTER clauses;
  *  - the predicate is a conjunction of `<,<=,>,>=,=` comparisons (and
  *    redundant IS NOT NULL) between ONE column and foldable literals
  *    — the parser's `BETWEEN` desugars to exactly this;
  *  - a file is `covered` only when its stats are complete and its
  *    interval lies inside the bounds; STRING columns are never
  *    covered (parquet truncates binary stats — sound for may-contain
  *    pruning, not for exact answers — the [[StatsAgg]] rule);
  *  - `count(*)` and `count(c)` answer from `rows − nulls_c`;
  *    `count(x)` for x ≠ c only when every covered file's footer
  *    declares ZERO x-nulls; `min/max` only on the FILTER column with
  *    integral/temporal types ([[ManifestAgg.exactMinMax]] — float
  *    ±0.0 widening and string truncation make footer extrema inexact);
  *  - at least one file must actually be covered — otherwise the
  *    rewrite buys nothing over the stock zone-map-pruned scan.
  *
  * Cost model at 100 TB: the classification is one CACHED footer sweep
  * over the version's files (shared with zone-map pruning —
  * [[SnapshotLog.cachedHarvest]]), the covered answer is driver
  * arithmetic, and the only distributed work is the boundary-file scan
  * with the predicate pushed into parquet. */
case class PushFilteredAggToManifest(spark: SparkSession) extends Rule[LogicalPlan] {

  private object SnapRel {
    def unapply(plan: LogicalPlan): Option[SnapshotParquetTable] = plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: SnapshotParquetTable => Some(t)
        case _ => None
      }
      case SubqueryAlias(_, child) => unapply(child)
      case _ => None
    }
  }

  /** One side of the range: value (catalyst form) + inclusivity. */
  private final case class Bound(v: Any, inclusive: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.aggPushdown.filtered", "true").toBoolean)
      return plan
    plan resolveOperatorsUp {
      case agg @ Aggregate(Seq(), aggExprs, Filter(cond, SnapRel(tbl)), _)
          if agg.resolved && tbl.dvFiles.isEmpty && tbl.filePaths.nonEmpty =>
        tryRewrite(agg, aggExprs, cond, tbl).getOrElse(agg)
    }
  }

  private def tryRewrite(orig: Aggregate,
                         aggExprs: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
                         cond: Expression,
                         tbl: SnapshotParquetTable): Option[LogicalPlan] = {
    val schema = tbl.schema()

    // ── predicate shape: conjuncts of comparisons on ONE column ──────
    // RuntimeReplaceable expands first: `x BETWEEN a AND b` survives
    // analysis as a `Between` node whose replacement is a `With`
    // common-expression wrapper over `a <= ref AND ref <= b` — inline
    // the refs so the matcher sees the plain conjunction
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case w: org.apache.spark.sql.catalyst.expressions.With =>
        val byId = w.defs.map(d => d.id -> d.child).toMap
        conjuncts(w.child.transform {
          case r: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef =>
            byId.getOrElse(r.id, r)
        })
      case rr: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        conjuncts(rr.replacement)
      case other => Seq(other)
    }
    def litOf(e: Expression): Option[Literal] = e match {
      case l: Literal => Some(l)
      case c if c.foldable => Some(Literal.create(c.eval(), c.dataType))
      case _ => None
    }
    var filterCol: Option[String] = None
    def sameCol(a: AttributeReference): Boolean = filterCol match {
      case None => filterCol = Some(a.name); true
      case Some(n) => n == a.name
    }
    var lo: Option[Bound] = None
    var hi: Option[Bound] = None
    val ordOf = scala.collection.mutable.Map.empty[String, Ordering[Any]]
    def ord: Ordering[Any] = ordOf.getOrElseUpdate(filterCol.get,
      TypeUtils.getInterpretedOrdering(schema(filterCol.get).dataType))
    def tightenLo(v: Any, incl: Boolean): Unit = lo = lo match {
      case Some(b) if ord.gt(b.v, v) || (ord.equiv(b.v, v) && !b.inclusive) => lo
      case _ => Some(Bound(v, incl))
    }
    def tightenHi(v: Any, incl: Boolean): Unit = hi = hi match {
      case Some(b) if ord.lt(b.v, v) || (ord.equiv(b.v, v) && !b.inclusive) => hi
      case _ => Some(Bound(v, incl))
    }
    // literal values arrive in CATALYST form but must be cast to the
    // COLUMN's type before comparing against (converted) footer stats
    def catVal(l: Literal, dt: DataType): Option[Any] =
      if (l.value == null) None
      else if (l.dataType == dt) Some(l.value)
      else {
        val c = org.apache.spark.sql.catalyst.expressions.Cast(l, dt,
          ansiEnabled = false)
        Option(c.eval())
      }
    for (c <- conjuncts(cond)) c match {
      case IsNotNull(a: AttributeReference) if sameCol(a) => // implied by any range
      case GreaterThan(a: AttributeReference, l) if litOf(l).isDefined && sameCol(a) =>
        tightenLo(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = false)
      case GreaterThanOrEqual(a: AttributeReference, l) if litOf(l).isDefined && sameCol(a) =>
        tightenLo(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = true)
      case LessThan(a: AttributeReference, l) if litOf(l).isDefined && sameCol(a) =>
        tightenHi(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = false)
      case LessThanOrEqual(a: AttributeReference, l) if litOf(l).isDefined && sameCol(a) =>
        tightenHi(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = true)
      case EqualTo(a: AttributeReference, l) if litOf(l).isDefined && sameCol(a) =>
        val v = catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None)
        tightenLo(v, incl = true); tightenHi(v, incl = true)
      // mirrored literal-first forms
      case GreaterThan(l, a: AttributeReference) if litOf(l).isDefined && sameCol(a) =>
        tightenHi(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = false)
      case GreaterThanOrEqual(l, a: AttributeReference) if litOf(l).isDefined && sameCol(a) =>
        tightenHi(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = true)
      case LessThan(l, a: AttributeReference) if litOf(l).isDefined && sameCol(a) =>
        tightenLo(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = false)
      case LessThanOrEqual(l, a: AttributeReference) if litOf(l).isDefined && sameCol(a) =>
        tightenLo(catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None), incl = true)
      case EqualTo(l, a: AttributeReference) if litOf(l).isDefined && sameCol(a) =>
        val v = catVal(litOf(l).get, schema(a.name).dataType).getOrElse(return None)
        tightenLo(v, incl = true); tightenHi(v, incl = true)
      case _ => return None // unknown conjunct shape: leave the plan alone
    }
    val c = filterCol.getOrElse(return None)
    if (lo.isEmpty && hi.isEmpty) return None // bare IS NOT NULL: stock path
    if (!schema.fieldNames.contains(c) || !Metastore.isOrderable(schema(c).dataType))
      return None
    val dt = schema(c).dataType

    // ── aggregate shape ──────────────────────────────────────────────
    sealed trait AggKind
    case object CountStar extends AggKind
    final case class CountCol(name: String) extends AggKind
    final case class MinC(name: String) extends AggKind
    final case class MaxC(name: String) extends AggKind
    def colName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    val kinds: Seq[AggKind] = aggExprs.map {
      case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
        case Count(Seq(l: Literal)) if l.value != null => CountStar
        case Count(Seq(e)) => CountCol(colName(e).getOrElse(return None))
        case Min(e) =>
          val n = colName(e).getOrElse(return None)
          // extrema only on the FILTER column (any other column's
          // extremum among matching rows is not footer-derivable) and
          // only exact-footer types
          if (n != c || !ManifestAgg.exactMinMaxType(dt)) return None
          MinC(n)
        case Max(e) =>
          val n = colName(e).getOrElse(return None)
          if (n != c || !ManifestAgg.exactMinMaxType(dt)) return None
          MaxC(n)
        case _ => return None
      }
      case _ => return None
    }

    // ── classification from the shared footer cache ──────────────────
    val ordC = TypeUtils.getInterpretedOrdering(dt)
    val toCat = CatalystTypeConverters.createToCatalystConverter(dt)
    val stats = SnapshotLog.cachedHarvest(spark, tbl.filePaths, c, dt)
    val stringCol = dt == StringType
    def belowLo(v: Any): Boolean = lo.exists(b =>
      ordC.lt(v, b.v) || (!b.inclusive && ordC.equiv(v, b.v)))
    def aboveHi(v: Any): Boolean = hi.exists(b =>
      ordC.gt(v, b.v) || (!b.inclusive && ordC.equiv(v, b.v)))
    val covered = Seq.newBuilder[StatsAgg.FileStats]
    val scanned = Seq.newBuilder[String]
    var skippedN = 0
    for (st <- stats) st match {
      case StatsAgg.FileStats(p, rows, Some(nulls), _, _) if rows >= 0 && nulls == rows =>
        skippedN += 1 // every row NULL: a range predicate matches none
      case StatsAgg.FileStats(p, rows, nullsOpt, Some(mnE), Some(mxE)) if rows >= 0 =>
        val mn = toCat(mnE); val mx = toCat(mxE)
        if (aboveHi(mn) || belowLo(mx)) skippedN += 1 // disjoint
        else if (nullsOpt.isDefined && !stringCol && !belowLo(mn) && !aboveHi(mx))
          covered += st
        else scanned += p
      case StatsAgg.FileStats(p, _, _, _, _) => scanned += p // stats-less: read
    }
    val cov = covered.result(); val scan = scanned.result()
    if (cov.isEmpty) return None // zone-map pruning already gives this plan

    // ── covered partials (driver arithmetic over footer facts) ───────
    // extra gate for count(x), x != c: x-nulls must be footer-zero in
    // every covered file, else the count among c-matching rows is
    // unknowable from footers
    for (k <- kinds) k match {
      case CountCol(x) if x != c =>
        val xs = SnapshotLog.cachedHarvest(spark, cov.map(_.path), x,
          schema.fields.find(_.name == x).getOrElse(return None).dataType)
        if (!xs.forall(s => s.rows >= 0 && s.nulls.contains(0L))) return None
      case _ => ()
    }
    val fromCat = CatalystTypeConverters.createToScalaConverter(dt)
    val coveredRows = cov.map(s => s.rows - s.nulls.get).sum
    val partialSchema = StructType(kinds.zipWithIndex.map {
      case (CountStar | CountCol(_), i) => StructField(s"_a$i", LongType)
      case (MinC(_) | MaxC(_), i) => StructField(s"_a$i", dt)
    })
    // covered files' footer extrema are inside [lo,hi] and exact for
    // the admitted types; all-null covered files cannot exist (the
    // all-null case classified as skipped above)
    val coveredRow = Row.fromSeq(kinds.map {
      case CountStar | CountCol(_) => coveredRows
      case MinC(_) => fromCat(cov.map(s => toCat(s.min.get)).min(ordC))
      case MaxC(_) => fromCat(cov.map(s => toCat(s.max.get)).max(ordC))
    })
    val coveredDf = spark.createDataFrame(
      java.util.Collections.singletonList(coveredRow), partialSchema)

    // ── boundary scan (pushed predicate over ONLY the scan files) ────
    val parts =
      if (scan.isEmpty) coveredDf
      else {
        // the predicate REBUILT from the extracted bounds (provably the
        // whole condition: every conjunct either folded into them or was
        // a redundant IS NOT NULL) — reusing `cond` verbatim would drag
        // RuntimeReplaceable/With wrappers through the name-based
        // transform and break resolution
        var pred = col(c).isNotNull
        lo.foreach(b => pred = pred && (
          if (b.inclusive) col(c) >= lit(fromCat(b.v)) else col(c) > lit(fromCat(b.v))))
        hi.foreach(b => pred = pred && (
          if (b.inclusive) col(c) <= lit(fromCat(b.v)) else col(c) < lit(fromCat(b.v))))
        val partials = kinds.zipWithIndex.map {
          case (CountStar, i) => count(lit(1)).as(s"_a$i")
          case (CountCol(x), i) => count(col(x)).as(s"_a$i")
          case (MinC(x), i) => min(col(x)).as(s"_a$i")
          case (MaxC(x), i) => max(col(x)).as(s"_a$i")
        }
        val scanDf = SnapshotLog.scanKnownFiles(spark, scan, schema)
          .where(pred)
          .agg(partials.head, partials.tail: _*)
        coveredDf.unionByName(scanDf)
      }
    val folds = kinds.zipWithIndex.map {
      case (CountStar | CountCol(_), i) => coalesce(sum(col(s"_a$i")), lit(0L)).as(s"_a$i")
      case (MinC(_), i) => min(col(s"_a$i")).as(s"_a$i")
      case (MaxC(_), i) => max(col(s"_a$i")).as(s"_a$i")
    }
    val finalDf = parts.agg(folds.head, folds.tail: _*)

    PushFilteredAggToManifest.served.incrementAndGet()
    PushFilteredAggToManifest.coveredFiles.addAndGet(cov.size.toLong)
    PushFilteredAggToManifest.scannedFiles.addAndGet(scan.size.toLong)
    logInfo(s"filtered manifest agg on $c: covered=${cov.size} " +
      s"scanned=${scan.size} skipped=$skippedN of ${stats.size} files")

    // substitute, re-aliased onto the ORIGINAL output ids so references
    // above the aggregate stay resolved (the VectorizeSnapshotDvRead
    // recipe); types match by construction (counts are LONG, extrema
    // carry the filter column's own type)
    val child = finalDf.queryExecution.analyzed
    Some(Project(orig.output.zip(child.output).map { case (o, r) =>
      Alias(r, o.name)(exprId = o.exprId)
    }, child))
  }
}

object PushFilteredAggToManifest {
  /** Specs and queries pin footer service + boundary volume with these. */
  val served = new java.util.concurrent.atomic.AtomicLong(0L)
  val coveredFiles = new java.util.concurrent.atomic.AtomicLong(0L)
  val scannedFiles = new java.util.concurrent.atomic.AtomicLong(0L)
}
