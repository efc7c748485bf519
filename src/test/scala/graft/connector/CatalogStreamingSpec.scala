package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Streaming through the DSv2 catalog table — the API surface the
  * reference documents (website/docs/engine-spark/structured-streaming.md):
  * `df.writeStream.toTable("cat.db.t")` and
  * `spark.readStream.table("cat.db.t")`, routed over the V1 fallback
  * bridge (GraftDsTable.v1Table) onto the format("graft") source/sink.
  * Plus the read-optimized batch mode (engine-spark/options.md:
  * spark.sql.fluss.read.optimized analog).
  */
class CatalogStreamingSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-cstr").toString
    spark.conf.set("spark.sql.catalog.gstr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gstr.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstr.db")
    dir
  }

  test("writeStream.toTable upserts into a PK table with exactly-once dedup") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.spk (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2')""")
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Int)](spark)
    val df = mem.toDF().select(col("_1").as("k"), col("_2").as("v"))
    val ckpt = Files.createTempDirectory("graft-cstr-ck").toString
    mem.addData((1L, 1), (2L, 2))
    // only checkpointLocation — the sink id derives from it (reference
    // usage shape: no graft-specific options on the writer)
    val q = df.writeStream.option("checkpointLocation", ckpt)
      .toTable("gstr.db.spk")
    q.processAllAvailable()
    mem.addData((1L, 10))
    q.processAllAvailable()
    q.stop()
    val rows = spark.sql("SELECT k, v FROM gstr.db.spk ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 10), (2L, 2)))
  }

  test("readStream.table streams a log table with the declared data schema") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.slog (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.slog VALUES (1, 1), (2, 2), (3, 3)")
    val in = spark.readStream.table("gstr.db.slog")
    // fallback contract: streamed schema == catalog table columns (no
    // __change_type/__offset system columns on this surface)
    assert(in.schema.fieldNames.toSeq == Seq("k", "v"))
    val q = in.writeStream.format("memory").queryName("slog_mem")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstr-rck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("slog_mem").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1), (2L, 2), (3L, 3)))
  }

  test("conf maxOffsetsPerTrigger paces catalog-table streams") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.paced (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.paced VALUES (1,1),(2,2),(3,3),(4,4),(5,5)")
    spark.conf.set("spark.sql.graft.maxOffsetsPerTrigger", "2")
    try {
      val tablePath =
        spark.conf.get("spark.sql.catalog.gstr.warehouse") + "/db/paced"
      var batches = 0
      val lags = scala.collection.mutable.ArrayBuffer[Long]()
      val q = spark.readStream.table("gstr.db.paced")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          if (df.count() > 0) batches += 1
          graft.core.GraftMetrics.gauge(tablePath,
            graft.core.GraftMetrics.StreamLag).foreach(lags += _)
          ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cstr-pck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // 5 rows at <=2 per trigger: at least 3 non-empty batches, lossless
      assert(batches >= 3, s"admission control must chunk batches: $batches")
      // lag observability: the throttled stream is visibly backlogged
      // mid-drain and caught up at the end
      assert(lags.nonEmpty && lags.max > 0L,
        s"expected a positive stream-lag gauge mid-drain, saw $lags")
      assert(graft.core.GraftMetrics.gauge(tablePath,
        graft.core.GraftMetrics.StreamLag).contains(0L),
        s"expected lag 0 after a full drain, saw $lags")
    } finally spark.conf.unset("spark.sql.graft.maxOffsetsPerTrigger")
  }

  test("read-optimized mode serves the snapshot tier only") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.ropt (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.ropt VALUES (1, 1), (2, 2)")
    try {
      // no snapshot yet: read-optimized is empty, normal read is merged
      spark.conf.set("spark.sql.graft.read.optimized", "true")
      assert(spark.sql("SELECT * FROM gstr.db.ropt").count() == 0)
      spark.conf.set("spark.sql.graft.read.optimized", "false")
      assert(spark.sql("SELECT * FROM gstr.db.ropt").count() == 2)

      spark.sql("CALL gstr.system.compact('db.ropt')")
      spark.sql("INSERT INTO gstr.db.ropt VALUES (1, 10), (3, 3)")
      // read-optimized: snapshot state (stale — pre-upsert values)
      spark.conf.set("spark.sql.graft.read.optimized", "true")
      val ro = spark.sql("SELECT k, v FROM gstr.db.ropt ORDER BY k").collect()
      assert(ro.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 1), (2L, 2)))
      // normal: fully merged current state
      spark.conf.set("spark.sql.graft.read.optimized", "false")
      val full = spark.sql("SELECT k, v FROM gstr.db.ropt ORDER BY k").collect()
      assert(full.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
        Seq((1L, 10), (2L, 2), (3L, 3)))
    } finally spark.conf.unset("spark.sql.graft.read.optimized")
  }

  test("session conf scan.startup.mode=latest skips history on readStream.table") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.slat (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.slat VALUES (1, 1), (2, 2)")
    try {
      // the reference's SET spark.sql.fluss.scan.startup.mode=latest —
      // the only startup channel .table() has (reader options are
      // dropped by the V1-fallback resolution)
      spark.conf.set("spark.sql.graft.scan.startup.mode", "latest")
      val q = spark.readStream.table("gstr.db.slat")
        .writeStream.format("memory").queryName("slat_mem")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cstr-lck").toString)
        .start()
      q.processAllAvailable()
      assert(spark.table("slat_mem").count() == 0) // history skipped
      spark.sql("INSERT INTO gstr.db.slat VALUES (3, 3)")
      q.processAllAvailable()
      q.stop()
      val got = spark.table("slat_mem").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(got.toSeq == Seq((3L, 3)))
    } finally spark.conf.unset("spark.sql.graft.scan.startup.mode")
  }

  test("get_configs reports defaults and session overrides") {
    wh
    try {
      spark.conf.unset("spark.sql.graft.read.optimized")
      val d = spark.sql("CALL gstr.system.get_configs()").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(d.contains(("spark.sql.graft.read.optimized", "false", "DEFAULT")))

      spark.conf.set("spark.sql.graft.read.optimized", "true")
      val s = spark.sql(
        "CALL gstr.system.get_configs('spark.sql.graft.read.optimized')")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      assert(s.toSeq == Seq(("spark.sql.graft.read.optimized", "true", "SESSION")))
    } finally spark.conf.unset("spark.sql.graft.read.optimized")
  }
}
