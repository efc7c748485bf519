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
  *     idle 984 cores on every plain scan of a BIG table. Two cases make
  *     the cap provably (near-)free, and auto groups exactly those:
  *
  *       1. `numBuckets >= defaultParallelism` — the cap exceeds the
  *          core count; the plan a 100 TB table (bucketed at or above
  *          cluster cores, as it should be) gets WITHOUT a flag.
  *       2. per-bucket bytes `<= spark.sql.files.maxPartitionBytes` —
  *          the flat scan would cut at most ~one split per bucket's
  *          worth of data anyway, so bucket-count tasks IS the natural
  *          parallelism; meanwhile the grouped plan deletes the full
  *          exchange under the PK collapse and under every bucket-key
  *          join/aggregate above. This is why round-12 measurements had
  *          grouped reads FASTER at 4–16 buckets on 32 cores: saved
  *          shuffle > lost parallelism whenever buckets hold little
  *          data. (Bytes come from the same cached planner-stats
  *          listing the scans already report to CBO.)
  *
  *     Between the two (few buckets, lots of data per bucket) auto stays
  *     V1: there the cap is real and a shuffle is cheaper than idling
  *     the cluster. Under a storage-partitioned join, skew parallelism
  *     is recovered separately by `partiallyClusteredDistribution`
  *     splitting hot buckets — that only helps joins, so it does not
  *     loosen the thresholds; pin `true` for a big-table co-located
  *     join below the bucket threshold.
  *
  * The reference gates the same trade behind Iceberg's
  * `preserve-data-grouping` (always opt-in); `auto` keeps the scale
  * plan the default without regressing any shape.
  */
object GroupedReads {

  val Key = "spark.sql.graft.read.preserve-data-grouping"

  /** @param estBytes visible-data size, evaluated lazily (only the auto
    *   path between the thresholds needs it; callers pass a cached
    *   listing)
    */
  def enabled(spark: SparkSession, tablePath: String, numBuckets: Int,
      estBytes: => Long): Boolean =
    DynamicConfigs.effective(spark, WarehouseIO.warehouseOf(tablePath),
      Key, "auto").trim.toLowerCase match {
      case "true" => true
      case "false" => false
      case "auto" =>
        numBuckets >= spark.sparkContext.defaultParallelism || {
          val maxPartitionBytes = spark.conf
            .get("spark.sql.files.maxPartitionBytes",
              (128L << 20).toString).toLong
          estBytes <= numBuckets.toLong * maxPartitionBytes
        }
      case other => throw new IllegalArgumentException(
        s"$Key must be 'true', 'false' or 'auto'; got '$other'")
    }
}
