package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building `Column`s from custom Catalyst expressions — the
  * converters are private[sql], so extension libraries provide this shim
  * (same pattern as connector packages in the wild).
  */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Same bridge for logical plans: rebuild a DataFrame from a transformed
  * analyzed plan (`Dataset.ofRows` is private[sql]).
  */
object GraftPlans {
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def functionRegistry(spark: SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
}
