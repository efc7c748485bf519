package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` door a V1 streaming `Source` has to walk
  * through: `Source.getBatch` must return a DataFrame whose logical plan
  * is flagged `isStreaming = true` (MicroBatchExecution asserts it), and
  * the only constructor that sets the flag is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * Delta Lake's DeltaSource re-tags its batches the same way. This object
  * lives under `org.apache.spark.sql` solely to satisfy the access
  * modifier; it contains no other Spark-internal coupling.
  */
object StreamShims {

  /** Re-tag a batch DataFrame as a streaming micro-batch. The physical
    * plan is the frame's own (lazy — nothing executes here), so scan
    * pushdowns and codegen are untouched; only the streaming flag on the
    * re-wrapped logical plan changes.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }
}
