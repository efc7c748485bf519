// Timing harness for individual SparkEntry queries:
//   sbt "runMain graft.tools.TimeQuery <sfDir> <query> [query...]"
package graft.tools

import org.apache.spark.sql.SparkSession

object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // match Bench: hash path for the LatestRow PK collapse
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // mirror Bench/Verify: CBO on (fresh per-manifest-state stats)
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B extra confs, e.g. SPARK_GRAFT_TIME_CONFS=
    //   "spark.sql.graft.read.preserve-data-grouping=true,..."
    sys.env.get("SPARK_GRAFT_TIME_CONFS").foreach(_.split(',')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
