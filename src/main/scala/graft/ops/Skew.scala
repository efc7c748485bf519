package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew handling (T8): the reference samples sink keys and rebalances
  * writes across buckets (fluss-flink/.../sink/shuffle/
  * DataStatisticsOperator.java:53, WeightedBucketIdAssignment). On Spark,
  * AQE's skew-join split covers the common case automatically; this is the
  * explicit salting form for when a hot key must be spread and the build
  * side cannot broadcast.
  */
object Skew {

  /** Salted equi-join: left rows get a deterministic salt in [0, factor),
    * right rows replicate across all salts, the join runs on
    * (keys..., salt) — a hot key's rows land in `factor` tasks instead of
    * one. Use for inner/left joins where `right` is too big to broadcast
    * but small enough to replicate `factor`×.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "factor must be positive")
    val l = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
