package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Engine counters (the reference's fluss-metrics registry analog):
  * commit/compaction/vacuum/rewrite/lookup/export counters tick on the
  * operations that coordinate them, and listeners observe increments.
  */
class GraftMetricsSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", IntegerType)))

  private def df(rows: (Long, Integer)*) = spark.createDataFrame(
    rows.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava,
    StructType(schema.fields :+ StructField("ord", LongType)))

  test("write+compact cycle ticks the per-table counters; listener observes") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-metrics").toString, spark)
    val t = cat.createTable("db", "m1",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2))
    val seen = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    val listener = new GraftMetrics.Listener {
      override def onIncrement(p: String, metric: String, delta: Long): Unit =
        if (p == t.path) seen.synchronized { seen += metric -> delta }
    }
    GraftMetrics.addListener(listener)
    try {
      t.upsert(df((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))
      t.upsert(df((1L, 10)), orderBy = Seq(col("ord")))
      t.compact()
      t.vacuumLog()
      t.lookup(Map("k" -> 1L)).collect()
      val out = Files.createTempDirectory("graft-metrics-exp").toString
      t.exportSnapshot(out)

      assert(GraftMetrics.counter(t.path, GraftMetrics.Commits) == 2)
      // committedRows counts LOG RECORDS: 2 inserts + the k=1 update's
      // UPDATE_BEFORE/UPDATE_AFTER pair (full-image changelog)
      assert(GraftMetrics.counter(t.path, GraftMetrics.CommittedRows) == 4)
      assert(GraftMetrics.counter(t.path, GraftMetrics.Compactions) == 1)
      assert(GraftMetrics.counter(t.path, GraftMetrics.Vacuums) == 1)
      assert(GraftMetrics.counter(t.path, GraftMetrics.Lookups) == 1)
      assert(GraftMetrics.counter(t.path, GraftMetrics.Exports) == 1)
      val snap = GraftMetrics.snapshot(t.path)
      assert(snap(GraftMetrics.Commits) == 2 && snap(GraftMetrics.Vacuums) == 1)
      // the listener saw the same increments the counters recorded
      val byMetric = seen.synchronized {
        seen.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
      assert(byMetric(GraftMetrics.Commits) == 2)
      assert(byMetric(GraftMetrics.CommittedRows) == 4)
    } finally GraftMetrics.removeListener(listener)
  }

  test("log-table appends and rewrites count too; unknown counters read 0") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-metrics2").toString, spark)
    val t = cat.createTable("db", "m2",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    t.append(df((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))
    t.rewriteLogFiles()
    assert(GraftMetrics.counter(t.path, GraftMetrics.Commits) == 1)
    assert(GraftMetrics.counter(t.path, GraftMetrics.CommittedRows) == 2)
    assert(GraftMetrics.counter(t.path, GraftMetrics.Rewrites) == 1)
    assert(GraftMetrics.counter(t.path, "nope") == 0)
    assert(GraftMetrics.counter("/no/such/table", GraftMetrics.Commits) == 0)
    // Prometheus exposition: typed counter families, table labels
    val prom = GraftMetrics.prometheusText()
    assert(prom.contains("# TYPE graft_commits_total counter"))
    assert(prom.contains(s"""graft_commits_total{table="${t.path}"} 1"""))
    assert(prom.contains(s"""graft_committed_rows_total{table="${t.path}"} 2"""))
    // exposition-format label escaping: backslash, quote AND newline — a
    // path with \n must not tear the scrape into an invalid raw line
    GraftMetrics.inc("/odd\\pa\"th\nwith-newline", GraftMetrics.Lookups)
    val prom2 = GraftMetrics.prometheusText()
    assert(prom2.contains("""graft_lookups_total{table="/odd\\pa\"th\nwith-newline"} 1"""))
    // warehouseOf: a table directly under the FS root resolves to "/"
    assert(WarehouseIO.warehouseOf("/db/t") == "/")
    assert(WarehouseIO.warehouseOf("/wh/db/t") == "/wh")
    assert(WarehouseIO.warehouseOf("db/t") == "")
  }
}
