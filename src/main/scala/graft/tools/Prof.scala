package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the heavy bench queries: runs one named
  * SparkEntry query repeatedly (arg: name [sfDir] [reps]) with event-log
  * timings, so stage cost is attributable without re-running the whole
  * bench. Dev tool only — not part of the driver contract.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Fixtures.prebuild(spark, sfDir)
    for (r <- 1 to reps) {
      // fresh per-rep cache names so cachedDf doesn't hide the cost
      graft.ops.Fixtures.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[prof] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
