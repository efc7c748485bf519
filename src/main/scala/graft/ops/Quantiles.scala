package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles.
  *
  * Spark's built-in exact `percentile` aggregate buffers every value of
  * the group in one task — for a GLOBAL quantile over 100 TB that is a
  * single-executor OOM. `approx_percentile` scales but its t-digest
  * output is engine-specific (not reproducible cross-engine, so not
  * oracle-checkable either).
  *
  * This computes exact order statistics with the two-level scan instead:
  * range-partition on the value, rank locally per partition, add the
  * broadcast prefix of partition row counts to get the global rank, and
  * pick the rows whose rank equals ceil(q·n) for each requested q. No
  * single task ever sees more than one partition's rows; the only
  * driver-size data is the per-partition count table. The result is the
  * discrete (type-1) quantile — the element at position ceil(q·n) of the
  * sorted multiset — which any engine reproduces exactly.
  */
object Quantiles {

  def exactQuantiles(df: DataFrame, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"quantile $q outside (0,1]"))
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // localCheckpoint before branching: the ranked subtree feeds both the
    // per-partition counts and the final rank filter, and __pid must not
    // be recomputed under a different AQE coalescing (same pitfall as
    // Sampling.packTokenShards)
    val local = df.select(col(valueCol).as("__v"))
      .repartitionByRange(n, col("__v"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrank",
        row_number().over(Window.partitionBy(col("__pid")).orderBy(col("__v")))
          .cast("long"))
      .localCheckpoint()
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lrank")).as("__pn"))
      .withColumn("__off", coalesce(sum(col("__pn")).over(wPrefix), lit(0L)))
    val total = offsets.agg(sum(col("__pn")).as("__n"))
    import spark.implicits._
    val targets = qs.toDF("q")
    local
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .crossJoin(broadcast(total))
      .crossJoin(broadcast(targets))
      .filter(col("__off") + col("__lrank") ===
        ceil(col("q") * col("__n").cast("double")).cast("long"))
      .select(col("q"), col("__v").as("value"))
  }

  /** Exact per-group quantiles: for every key, the discrete quantile of
    * `valueCol` at each requested q. One shuffle on the key; the rank and
    * group-count windows share the same partitioning (a single exchange +
    * sort in the plan). Per-key data must fit a task — the usual window
    * contract; for the GLOBAL quantile (one giant key) use
    * [[exactQuantiles]] instead.
    */
  def groupedQuantiles(df: DataFrame, keyCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    qs.foreach(q => require(q > 0.0 && q <= 1.0, s"quantile $q outside (0,1]"))
    import df.sparkSession.implicits._
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(valueCol))
    val wAll = Window.partitionBy(col(keyCol))
    df.select(col(keyCol), col(valueCol))
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .crossJoin(broadcast(qs.toDF("q")))
      .filter(col("__rn") ===
        ceil(col("q") * col("__n").cast("double")).cast("long"))
      .select(col(keyCol), col("q"), col(valueCol).as("value"))
  }
}
