package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Geometric mean as a native DECLARATIVE aggregate: the buffer is two
  * columns (Σln x, n) and every phase — init, per-row update, partial
  * merge, final evaluate — is a Catalyst expression, so the aggregate
  * runs inside whole-stage-codegen'd HashAggregate with map-side
  * partial aggregation for free. This is the aggregate-side counterpart
  * of `CosineSimilarity` (the scalar custom-Expression surface): a
  * library aggregate Spark lacks, built the way Spark's own Average is,
  * not as a (slower, unfused) UDAF `Aggregator`.
  *
  * Semantics: rows that are NULL or ≤ 0 are skipped (ln is undefined
  * there — the same contract as `exp(avg(ln(x)))` over the positive
  * subset, which is the ANSI oracle twin); an all-skipped group yields
  * NULL, like Spark's own avg over an empty set.
  */
case class GeometricMean(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  // AbstractDataType (hence ImplicitCastInputTypes/ExpectsInputTypes) is
  // private[sql] in Spark 4, so input typing is checked explicitly and
  // the entry points (geoMean, GraftExtensions) insert the double cast
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geo_mean requires DOUBLE input, got ${child.dataType.simpleString}; cast the argument")
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "geo_mean"

  private lazy val sumLn = AttributeReference("sumLn", DoubleType, nullable = false)()
  private lazy val n = AttributeReference("n", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sumLn, n)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0L))

  override lazy val updateExpressions: Seq[Expression] = {
    val valid = And(IsNotNull(child), GreaterThan(child, Literal(0.0)))
    Seq(
      If(valid, Add(sumLn, Log(child)), sumLn),
      If(valid, Add(n, Literal(1L)), n))
  }

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumLn.left, sumLn.right),
    Add(n.left, n.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(n, Literal(0L)),
      Literal(null, DoubleType),
      Exp(Divide(sumLn, Cast(n, DoubleType))))

  override protected def withNewChildInternal(newChild: Expression): GeometricMean =
    copy(child = newChild)
}

object GeometricMean {
  /** DataFrame-side entry: `df.agg(GeometricMean.geoMean(col("x")))`. */
  def geoMean(c: Column): Column =
    GraftColumnBridge.column(
      GeometricMean(GraftColumnBridge.expression(c.cast("double"))).toAggregateExpression())
}
