package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Table}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Build a DataFrame directly over a DSv2 [[Table]] — how the engine API
  * serves a scan that must REPORT things to the planner (a
  * `KeyGroupedPartitioning`, stats) that the V1 `spark.read.parquet`
  * path flattens away. `catalog` carries the FunctionCatalog Spark needs
  * to resolve the partitioning's transform functions
  * (V2ExpressionUtils.loadV2FunctionOpt). Lives in this package because
  * `DataSourceV2Relation.create` / `Dataset.ofRows` are `private[sql]`.
  */
object V2Relation {
  def dataFrame(spark: SparkSession, table: Table,
      catalog: Option[CatalogPlugin]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic,
      DataSourceV2Relation.create(table, catalog, None))
  }

  /** Spark's own dynamic-partition-pruning planner rule, re-exported for
    * the late user-rule batch: `PkCollapseRule` substitutes a grouped
    * DSv2 scan AFTER the built-in PartitionPruning batch has run, so the
    * substituted scan's `SupportsRuntimeFiltering` surface would never
    * receive a DPP subquery on the catalog-SQL path — re-running the
    * (idempotent: it skips joins that already carry a
    * DynamicPruningSubquery) rule right after the substitution plants
    * it. Lives here because the `execution.dynamicpruning` package is
    * `private[sql]`.
    */
  def partitionPruningRule
      : org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
    org.apache.spark.sql.execution.dynamicpruning.PartitionPruning

  /** Run the session's FULL optimizer over a logical plan and return the
    * optimized plan — how a late-batch rule (experimental
    * extraOptimizations run after every built-in batch, including
    * V2ScanRelationPushDown) substitutes a subplan that still needs its
    * own scan pushdown: the subplan is optimized in its own pass first,
    * then grafted in fully planned.
    */
  def optimize(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    org.apache.spark.sql.classic.Dataset.ofRows(classic, plan)
      .queryExecution.optimizedPlan
  }
}
