package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: turning a hand-built
  * [[LogicalPlan]] into a DataFrame. `Dataset.ofRows` is the blessed
  * entry point every Spark-native library uses for custom logical
  * operators; it has no public equivalent, so this shim lives in the
  * `org.apache.spark.sql` package to reach it. Nothing else in graft
  * touches non-public Spark API.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Spark 4 `Column` wraps a ColumnNode, not an Expression; this is the
    * classic converter back to a resolved Catalyst expression.
    */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  /** ... and the converse: wrap a hand-built Catalyst expression as a
    * Column that resolves on any session (no FunctionRegistry needed) —
    * for context-free Column builders like TextOps.qualityCol.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
