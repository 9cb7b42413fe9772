package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql`-private Column↔Expression converters so graft's
  * native Catalyst expressions (graft.functions) can be used from the
  * public DataFrame API without requiring a session configured with
  * SparkSessionExtensions. The standard technique for Spark-native
  * libraries; uses only stable classic-mode converters.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a hand-built LogicalPlan (e.g. a LogicalRelation over
    * a custom FileIndex) — `Dataset.ofRows` is `private[sql]`. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
