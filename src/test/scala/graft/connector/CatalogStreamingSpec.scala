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

  test("full startup seeds a catalog stream from the tiered lake across expiry") {
    val lakeDir = s"$wh/_lakes/ltier"
    spark.sql(s"""
      CREATE TABLE gstr.db.ltier (k BIGINT, v INT, dt STRING)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2',
        'table.datalake.enabled' = 'true',
        'table.datalake.dir' = '$lakeDir',
        'table.datalake.format' = 'iceberg')""")
    spark.sql("""INSERT INTO gstr.db.ltier VALUES
      (1, 1, '2024-01-01'), (2, 2, '2024-01-02'), (3, 3, '2024-01-01')""")
    val t = new graft.core.Catalog(wh, spark).getTable("db", "ltier")
    t.tierSnapshot(lakeDir)
    // vacuum the log up to the lake's pinned offsets: history now lives
    // ONLY in the lake — the cold start the reference's lake-seeded
    // hybrid split exists for
    assert(t.expireLog(1L, System.currentTimeMillis() + 60000L) == 3L)
    spark.sql("""INSERT INTO gstr.db.ltier VALUES
      (4, 4, '2024-01-02'), (5, 5, '2024-01-03')""")

    val ckpt = Files.createTempDirectory("graft-cstr-full").toString
    def drain(): Seq[(Long, Int, String)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
      val q = spark.readStream.option("scan.startup.mode", "full")
        .table("gstr.db.ltier")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          buf ++= df.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getString(2))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.toSeq
    }
    val got = drain()
    assert(got.toSet == Set((1L, 1, "2024-01-01"), (2L, 2, "2024-01-02"),
      (3L, 3, "2024-01-01"), (4L, 4, "2024-01-02"), (5L, 5, "2024-01-03")),
      s"lake seed + log tail: $got")
    assert(got.size == 5, s"exactly-once across the lake/log seam: $got")

    // checkpoint resume across the seam: the seed batch is committed, so
    // a second run delivers ONLY the new tail — no re-seed, no loss
    spark.sql("INSERT INTO gstr.db.ltier VALUES (6, 6, '2024-01-01')")
    val more = drain()
    assert(more.toSet == Set((6L, 6, "2024-01-01")),
      s"resume must deliver only the new tail: $more")
  }

  test("full startup seeds a catalog PK stream from the KV snapshot after vacuum") {
    spark.sql("""
      CREATE TABLE gstr.db.fullpk (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.fullpk VALUES (1, 1), (2, 2), (3, 3)")
    val t = new graft.core.Catalog(wh, spark).getTable("db", "fullpk")
    t.compact()
    t.vacuumLog()
    spark.sql("INSERT INTO gstr.db.fullpk VALUES (4, 4), (5, 5)")
    val q = spark.readStream.option("scan.startup.mode", "full")
      .table("gstr.db.fullpk")
      .writeStream.format("memory").queryName("fullpk_mem")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstr-fpk").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("fullpk_mem").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSet == Set(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5),
      s"snapshot seed + log tail: ${got.toSeq}")
    assert(got.length == 5, s"exactly-once: ${got.toSeq}")
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

  test("progress events carry native source lag metrics under throttle") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.smet (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql(
      "INSERT INTO gstr.db.smet VALUES (1,1),(2,2),(3,3),(4,4),(5,5),(6,6)")
    spark.conf.set("spark.sql.graft.maxOffsetsPerTrigger", "2")
    try {
      val q = spark.readStream.table("gstr.db.smet")
        .writeStream.format("memory").queryName("smet_mem")
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-cstr-mck").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // ReportsSourceMetrics surface: every StreamingQueryProgress carries
      // the source's lag in sources[].metrics — the standard operator
      // signal (no engine-specific registry needed on this path)
      val perEvent = q.recentProgress.toSeq.map(p =>
        p.sources(0).metrics.get("numRecordsBehindLatest"))
      assert(perEvent.nonEmpty && perEvent.forall(_ != null),
        s"every progress event must carry the metric, saw $perEvent")
      val lags = perEvent.map(_.toLong)
      // 6 rows at <=2/trigger: visibly backlogged mid-drain, 0 at the end
      assert(lags.max > 0L, s"expected positive mid-drain lag, saw $lags")
      assert(lags.last == 0L, s"expected lag 0 after the drain, saw $lags")
      val last = q.recentProgress.last.sources(0).metrics
      assert(last.get("maxRecordsBehindLatest") == "0" &&
        last.get("minRecordsBehindLatest") == "0")
    } finally spark.conf.unset("spark.sql.graft.maxOffsetsPerTrigger")
  }

  test("a stopped stream resumes from its checkpoint without replay") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.sres (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.sres VALUES (1, 1), (2, 2)")
    val ckpt = Files.createTempDirectory("graft-cstr-res").toString
    // foreachBatch (checkpoint-recoverable, unlike the memory sink);
    // the buffer is fresh per run, so its contents are exactly what
    // that run delivered
    def run(): Seq[(Long, Int)] = {
      val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Int)]
      val q = spark.readStream.table("gstr.db.sres")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add((r.getLong(0), r.getInt(1))))
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSeq.sortBy(_._1)
    }
    assert(run() == Seq((1L, 1), (2L, 2)))
    // the durable offset log is the plain per-bucket JSON map — the
    // contract an engine upgrade must keep honoring for old checkpoints
    val offsetsDir = new java.io.File(s"$ckpt/offsets")
    val lastBatch = offsetsDir.listFiles().map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toLong).max
    val offsetLine = scala.io.Source
      .fromFile(s"$ckpt/offsets/$lastBatch").getLines().toSeq.last
    assert(graft.streaming.GraftSourceOffset.parse(offsetLine)
      .values.sum == 2, s"unexpected offset-log format: $offsetLine")
    spark.sql("INSERT INTO gstr.db.sres VALUES (3, 3)")
    // restart on the SAME checkpoint: only the new row, no replay of the
    // committed prefix
    val resumed = run()
    assert(resumed == Seq((3L, 3)),
      s"resume must deliver exactly the post-checkpoint rows, got $resumed")
  }

  test("partitioned tables stream with dir-encoded columns re-attached; " +
      "reader options reach the DSv2 stream directly") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.spart (k BIGINT, v INT, dt STRING)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql(
      "INSERT INTO gstr.db.spart VALUES (1, 1, 'a'), (2, 2, 'b'), (3, 3, 'a')")
    // dt lives in the log's hive dirs, not the parquet files — the
    // stream must re-attach it (the V1 bridge got this from Spark's
    // file index; the native MicroBatchStream plans it per file)
    val q = spark.readStream.table("gstr.db.spart")
      .writeStream.format("memory").queryName("spart_mem")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstr-sp").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("spart_mem").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1, "a"), (2L, 2, "b"), (3L, 3, "a")))
    // reader options now reach the stream (the V1 fallback dropped
    // them): scan.startup.mode=latest as an OPTION, no session conf
    val q2 = spark.readStream.option("scan.startup.mode", "latest")
      .table("gstr.db.spart")
      .writeStream.format("memory").queryName("spart_mem2")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstr-sp2").toString)
      .start()
    q2.processAllAvailable()
    assert(spark.table("spart_mem2").count() == 0) // history skipped
    spark.sql("INSERT INTO gstr.db.spart VALUES (4, 4, 'b')")
    q2.processAllAvailable()
    q2.stop()
    val fresh = spark.table("spart_mem2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(fresh.toSeq == Seq((4L, 4, "b")))
  }

  test("timestamp partition keys stream: hive dir values take the same " +
      "string cast the V1 bridge applied") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.tspart (k BIGINT, v INT, ts TIMESTAMP)
      USING graft PARTITIONED BY (ts)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("""
      INSERT INTO gstr.db.tspart VALUES
        (1, 1, TIMESTAMP '2026-01-01 00:00:00'),
        (2, 2, TIMESTAMP '2026-01-02 12:30:00')""")
    val q = spark.readStream.table("gstr.db.tspart")
      .writeStream.format("memory").queryName("tspart_mem")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-cstr-ts").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("tspart_mem").collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toString)).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "2026-01-01 00:00:00.0"),
      (2L, "2026-01-02 12:30:00.0")))
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

  test("readStream.table resuming across CALL sys.rebucket refuses " +
      "loudly (DSv2 transport carries the timeline stamp too)") {
    wh
    spark.sql("""
      CREATE TABLE gstr.db.rbs (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gstr.db.rbs VALUES (1, 1), (2, 2), (3, 3)")
    val ckpt = Files.createTempDirectory("graft-cstr-rbk").toString
    var seen = 0L
    def drainOnce(): Unit = {
      val q = spark.readStream.table("gstr.db.rbs")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen += df.count(); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainOnce()
    assert(seen == 3)
    spark.sql("CALL gstr.system.rebucket('db.rbs', 8)")
    spark.sql("INSERT INTO gstr.db.rbs VALUES (4, 4)")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drainOnce()
    }
    val msg = e.getCause.getMessage
    assert(msg.contains("numBuckets"), msg)
    assert(msg.contains("fresh checkpoint"), msg)
  }
}
