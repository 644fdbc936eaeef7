package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to the classic Dataset constructor for custom logical plans
  * (the standard pattern for extension libraries that build DataFrames
  * from injected plan nodes; lives under o.a.s.sql to see the
  * private[sql] constructor). */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a public Column (for expressions
    * with non-Expression constructor parameters that can't go through
    * the function registry). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression):
      org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Extract the catalyst Expression backing a classic Column. */
  def expression(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
