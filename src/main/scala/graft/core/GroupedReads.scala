package graft.core

import org.apache.spark.sql.SparkSession

/** Resolves `spark.sql.graft.read.preserve-data-grouping` — the
  * key-grouped (storage-partitioned-join) read opt-in — to a per-table
  * decision. Three values (SESSION > DYNAMIC > DEFAULT precedence, like
  * every dynamic config):
  *
  *   - `true`: always plan key-grouped scans on key-bucketed tables.
  *   - `false`: always plan the flat V1 scan.
  *   - `auto` (the default): group per TABLE, when grouping costs no
  *     parallelism — key-grouped planning caps an exploited scan's task
  *     count at the bucket count (same-bucket files merge into one
  *     task), so grouping a 16-bucket table on a 1000-core cluster would
  *     idle 984 cores on every plain scan. When the bucket count reaches
  *     the session's core count the cap is moot and the grouped plan is
  *     strictly better: the PK collapse, bucket-key joins and aggregates
  *     above the scan all drop their exchange — the plan a 100 TB table
  *     (bucketed in the hundreds-to-thousands) should get WITHOUT anyone
  *     remembering a flag. Under a storage-partitioned join, skew
  *     parallelism is recovered separately by
  *     `partiallyClusteredDistribution` splitting hot buckets across
  *     tasks — that only helps joins, so it does not loosen this
  *     threshold (a plain grouped scan still runs one task per bucket).
  *
  * The reference gates the same trade behind Iceberg's
  * `preserve-data-grouping` (always opt-in); `auto` keeps the 100 TB
  * plan the default without regressing small tables.
  */
object GroupedReads {

  val Key = "spark.sql.graft.read.preserve-data-grouping"

  def enabled(spark: SparkSession, tablePath: String,
      numBuckets: Int): Boolean =
    DynamicConfigs.effective(spark, WarehouseIO.warehouseOf(tablePath),
      Key, "auto").trim.toLowerCase match {
      case "true" => true
      case "false" => false
      case "auto" => numBuckets >= spark.sparkContext.defaultParallelism
      case other => throw new IllegalArgumentException(
        s"$Key must be 'true', 'false' or 'auto'; got '$other'")
    }
}
