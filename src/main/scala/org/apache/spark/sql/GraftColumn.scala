package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building `Column`s from custom Catalyst expressions — the
  * converters are private[sql], so extension libraries provide this shim
  * (same pattern as connector packages in the wild).
  */
object GraftColumn {
  def of(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Eager conversion of a Column tree to catalyst expressions.
    * [[expressionOf]] wraps the node in a LAZY `ColumnNodeExpression`,
    * which stays Unevaluable when returned from a function-registry
    * builder (the analyzer never looks inside it); this converter
    * produces the real `UnresolvedFunction` tree, which the fixed-point
    * analyzer then resolves like any parsed SQL.
    */
  def catalystOf(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
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
