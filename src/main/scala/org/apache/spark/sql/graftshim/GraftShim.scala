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

  /** Spark's internal runtime-filter bloom aggregate as a Column:
    * one single-row BINARY result over `child` (must be an xxhash64
    * long — the same convention InjectRuntimeFilter uses). Not
    * SQL-registered upstream, hence the shim. */
  def bloomAggColumn(child: org.apache.spark.sql.Column,
      estItems: Long, numBits: Long): org.apache.spark.sql.Column =
    column(new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(expression(child),
        org.apache.spark.sql.catalyst.expressions.Literal(estItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
      .toAggregateExpression())

  /** Membership probe against a serialized bloom filter embedded as a
    * plan literal (the broadcast-as-literal shape runtime filtering
    * itself uses); `value` must be the same xxhash64 long form the
    * aggregate inserted. */
  def bloomMightContain(bloom: Array[Byte],
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal(bloom,
        org.apache.spark.sql.types.BinaryType),
      expression(value)))

  /** Membership probe whose bloom side is a SCALAR SUBQUERY over
    * `bloomDf` (a one-row, one-BINARY-column bloom aggregate) — the
    * exact shape InjectRuntimeFilter builds: the serialized filter
    * never round-trips through the driver as a collected value and is
    * shipped to executors once through the subquery result mechanism
    * instead of riding in every task's closure as a plan literal
    * (r11 ADVICE: at billion-shingle scale the literal form serializes
    * GB-range bloom bytes into every task). A NULL bloom (empty build
    * side) makes the probe NULL ⇒ the filter keeps nothing, which is
    * the correct "nothing to match" semantics. */
  def bloomMightContainSubquery(bloomDf: DataFrame,
      value: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val plan = bloomDf.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(plan),
      expression(value)))
  }
}
