package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal Column ↔ Expression bridge. Spark 4 made these conversions
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * extension libraries that define native Catalyst expressions expose
  * them through a shim in the sql namespace — the standard pattern for
  * Spark-extension projects.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Spark's internal bounded-heap top-k aggregate (`CollectTopK` is
    * `private[sql]` — same shim rationale as the conversions above):
    * keeps the k extreme values per group in an O(k) heap with
    * partial merge. `reverse=false` keeps the k LARGEST.
    */
  def collectTopK(c: Column, k: Int, reverse: Boolean): Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .CollectTopK(expression(c), k, reverse, 0, 0)
      .toAggregateExpression())

  /** A DataFrame over a hand-built logical plan (`Dataset.ofRows` is
    * `private[sql]` — the shim rationale above). Needed by custom
    * whole-operator nodes (graft.plans.AsOfJoin) whose construction
    * has no Column-API spelling.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan (same shim rationale). */
  def analyzed(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
}
