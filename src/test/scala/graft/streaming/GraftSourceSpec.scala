package graft.streaming

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core._

/** The `format("graft")` streaming source: manifest-offset tracking,
  * startup modes, admission control, and the properties file-discovery
  * streams cannot give — compaction immunity and loud vacuum-gap errors.
  */
class GraftSourceSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("ord", LongType)))

  private def newTable(name: String, buckets: Int = 2): GraftTable =
    new Catalog(Files.createTempDirectory("graft-src-wh").toString, spark)
      .createTable("db", name, TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        bucketKeys = Seq("k"), numBuckets = buckets))

  private def rows(kv: (Long, Int)*) = spark.createDataFrame(
    kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)

  /** Drain the source with AvailableNow into a buffer; returns (rows,
    * non-empty batch count). Same checkpoint ⇒ resumes where it left off.
    */
  private def drain(table: GraftTable, ckpt: String,
      options: Map[String, String] = Map.empty): (Seq[(Long, Int)], Int) = {
    val buf = ArrayBuffer.empty[(Long, Int)]
    var batches = 0
    val reader = spark.readStream.format("graft").option("path", table.path)
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .select(col("k"), col("v"))
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val got = df.collect().map(r => (r.getLong(0), r.getInt(1)))
        if (got.nonEmpty) batches += 1
        buf ++= got; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (buf.toSeq, batches)
  }

  test("new hive partitions are discovered mid-stream (partition discovery)") {
    // the reference polls for new partitions (scan.partition.discovery
    // .interval); here discovery is free — offsets are per-bucket in the
    // manifest, partition dirs are just file layout — but the property
    // must hold: rows landing in a PARTITION THAT DID NOT EXIST when the
    // stream started are still delivered on resume
    val cat = new Catalog(Files.createTempDirectory("graft-src-wh").toString, spark)
    val pschema = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType),
      StructField("dt", StringType)))
    val t = cat.createTable("db", "pdisc", TableDescriptor(
      pschema, bucketKeys = Seq("k"), numBuckets = 2,
      partitionKeys = Seq("dt")))
    def prows(kvd: (Long, Int, String)*) = spark.createDataFrame(
      kvd.zipWithIndex.map { case ((k, v, d), i) => Row(k, v, d, i.toLong) }.asJava,
      StructType(pschema.fields :+ StructField("ord", LongType)))
    t.append(prows((1L, 1, "2024-01-01")), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ck").toString
    val buf = ArrayBuffer.empty[(Long, Int, String)]
    def drainP(): Unit = {
      val q = spark.readStream.format("graft").option("path", t.path).load()
        .select(col("k"), col("v"), col("dt"))
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          buf ++= df.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getString(2))); ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainP()
    assert(buf.toSet == Set((1L, 1, "2024-01-01")))
    // a partition that did not exist at stream start
    t.append(prows((2L, 2, "2024-01-02"), (3L, 3, "2024-01-03")),
      orderBy = Seq(col("ord")))
    drainP()
    assert(buf.toSet == Set((1L, 1, "2024-01-01"), (2L, 2, "2024-01-02"),
      (3L, 3, "2024-01-03")), s"new partitions must be discovered: $buf")
  }

  test("earliest: drains the log once; resume delivers only new commits") {
    val t = newTable("src1")
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    t.append(rows(3L -> 3), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString

    val (b1, _) = drain(t, ckpt)
    assert(b1.toSet == Set(1L -> 1, 2L -> 2, 3L -> 3))

    // nothing new: zero rows, not a re-read
    assert(drain(t, ckpt)._1.isEmpty)

    t.append(rows(4L -> 4, 5L -> 5), orderBy = Seq(col("ord")))
    val (b2, _) = drain(t, ckpt)
    assert(b2.toSet == Set(4L -> 4, 5L -> 5))
  }

  test("version startup: stream continues a batch changesBetween read") {
    val t = newTable("srcv")
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord"))) // version 1
    t.append(rows(3L -> 3), orderBy = Seq(col("ord")))          // version 2
    t.append(rows(4L -> 4), orderBy = Seq(col("ord")))          // version 3
    val (got, _) = drain(t, Files.createTempDirectory("graft-src-ckpt").toString,
      Map("scan.startup.mode" -> "version", "scan.startup.version" -> "1"))
    assert(got.toSet == Set(3L -> 3, 4L -> 4), s"expected commits after v1: $got")
    // unknown version fails loudly at source construction
    val bad = intercept[Exception] {
      drain(t, Files.createTempDirectory("graft-src-ckpt").toString,
        Map("scan.startup.mode" -> "version", "scan.startup.version" -> "9"))
    }
    assert(Option(bad.getMessage).exists(_.contains("not recorded")) ||
      Option(bad.getCause).exists(_.getMessage.contains("not recorded")))
  }

  test("offset tracking is immune to small-file compaction (file streams are not)") {
    val t = newTable("src2")
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    assert(drain(t, ckpt)._1.toSet == Set(1L -> 1, 2L -> 2))

    // rewrite containers (same records, new files), then commit new rows:
    // a file-discovery stream would re-deliver everything in the new files
    t.append(rows(3L -> 3), orderBy = Seq(col("ord")))
    t.rewriteLogFiles()
    t.append(rows(4L -> 4), orderBy = Seq(col("ord")))
    val (b2, _) = drain(t, ckpt)
    assert(b2.toSet == Set(3L -> 3, 4L -> 4), s"duplicates or loss: $b2")
  }

  test("maxOffsetsPerTrigger paces batches without losing records") {
    val t = newTable("src3", buckets = 2)
    t.append(rows((1L to 10L).map(k => k -> k.toInt): _*), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    val (got, batches) = drain(t, ckpt, Map("maxOffsetsPerTrigger" -> "3"))
    assert(got.toSet == (1L to 10L).map(k => k -> k.toInt).toSet)
    assert(batches >= 4, s"expected >=4 rate-limited batches, got $batches")
  }

  test("timestamp startup skips commits before the cutover") {
    val t = newTable("src4")
    t.append(rows(1L -> 1), orderBy = Seq(col("ord")))
    Thread.sleep(15)
    val cut = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(rows(2L -> 2), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    val (got, _) = drain(t, ckpt, Map(
      "scan.startup.mode" -> "timestamp",
      "scan.startup.timestamp-millis" -> cut.toString))
    assert(got.toSet == Set(2L -> 2))
  }

  test("latest startup sees only post-start commits across resumes") {
    val t = newTable("src5")
    t.append(rows(1L -> 1), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    assert(drain(t, ckpt, Map("scan.startup.mode" -> "latest"))._1.isEmpty)
    t.append(rows(2L -> 2), orderBy = Seq(col("ord")))
    // the checkpointed position, not the startup mode, governs the resume
    assert(drain(t, ckpt, Map("scan.startup.mode" -> "latest"))._1.toSet ==
      Set(2L -> 2))
  }

  test("resume below the vacuumed log start fails loudly, not silently") {
    val t = newTable("src6")
    // PK table so compact() builds a snapshot and vacuum moves the floor
    val pk = new Catalog(Files.createTempDirectory("graft-src-wh").toString, spark)
      .createTable("db", "src6pk", TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        primaryKey = Seq("k"), numBuckets = 2))
    pk.upsert(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    // position the checkpoint at offset 0 by draining an empty prefix:
    // start the stream BEFORE any processing? simplest: drain fully, then
    // vacuum AND upsert, then hand-rot the checkpoint is overkill — instead
    // drain nothing (latest on empty), vacuum, and restart from scratch in
    // earliest mode which starts AT the floor (no error), so the loud path
    // needs a checkpoint that predates the vacuum:
    assert(drain(pk, ckpt)._1.size == 2) // checkpoint now at tail offset 2
    pk.upsert(rows(1L -> 10), orderBy = Seq(col("ord"))) // offsets 2..3 (change pair)
    pk.compact()
    pk.vacuumLog() // floor moves past the checkpointed position
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(pk, ckpt)
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("below the retained log start")), ex.toString)
  }

  test("fresh earliest stream after vacuum starts at the floor cleanly") {
    val pk = new Catalog(Files.createTempDirectory("graft-src-wh").toString, spark)
      .createTable("db", "src7pk", TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        primaryKey = Seq("k"), numBuckets = 2))
    pk.upsert(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    pk.compact()
    pk.vacuumLog()
    pk.upsert(rows(3L -> 3), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    val (got, _) = drain(pk, ckpt)
    assert(got.toSet == Set(3L -> 3))
  }

  // ----- scan.startup.mode=full: lake/snapshot-seeded cold start ---------

  test("full startup seeds from the tiered lake when the log is expired up to it") {
    val wh = Files.createTempDirectory("graft-src-wh").toString
    val lakeDir = s"$wh/_lakes/lakeseed"
    val t = new Catalog(wh, spark).createTable("db", "lakeseed",
      TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        bucketKeys = Seq("k"), numBuckets = 2,
        properties = Map(
          "table.datalake.enabled" -> "true",
          "table.datalake.dir" -> lakeDir,
          "table.datalake.format" -> "iceberg")))
    t.append(rows(1L -> 1, 2L -> 2, 3L -> 3), orderBy = Seq(col("ord")))
    t.tierSnapshot(lakeDir)
    // history now lives ONLY in the lake: expire the whole retained log
    assert(t.expireLog(1L, System.currentTimeMillis() + 60000L) == 3L)
    // the fresh tail, committed after the tier
    t.append(rows(4L -> 4, 5L -> 5), orderBy = Seq(col("ord")))

    val ckpt = Files.createTempDirectory("graft-src-ckpt").toString
    val (got, _) = drain(t, ckpt, Map("scan.startup.mode" -> "full"))
    assert(got.toSet == Set(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4, 5L -> 5),
      s"lake seed + log tail: $got")
    assert(got.size == 5, s"exactly-once across the lake/log seam: $got")

    // checkpoint resume across the seam: the seed is NOT replayed
    t.append(rows(6L -> 6), orderBy = Seq(col("ord")))
    val (more, _) = drain(t, ckpt, Map("scan.startup.mode" -> "full"))
    assert(more.toSet == Set(6L -> 6),
      s"resume must deliver only the new tail: $more")
  }

  test("full startup falls back to the KV snapshot and merges the tail") {
    val t = new Catalog(Files.createTempDirectory("graft-src-wh").toString, spark)
      .createTable("db", "fullsnap", TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        primaryKey = Seq("k"), numBuckets = 2))
    t.upsert(rows(1L -> 1, 2L -> 2, 3L -> 3), orderBy = Seq(col("ord")))
    t.compact()
    t.vacuumLog() // history below the snapshot is gone from the log
    t.upsert(rows(2L -> 20, 4L -> 40), orderBy = Seq(col("ord")))

    val buf = ArrayBuffer.empty[(Long, Int, String, Long)]
    val q = spark.readStream.format("graft").option("path", t.path)
      .option("scan.startup.mode", "full").load()
      .select(col("k"), col("v"), col(Meta.ChangeTypeCol), col(Meta.Offset))
      .writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        buf ++= df.collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-src-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // seed rows ride at offset -1, below every tail offset: last change
    // per key wins — the consumer-side fold full mode is designed for
    val state = buf.groupBy(_._1).view.mapValues(_.maxBy(_._4)).toMap
      .filter(!_._2._3.startsWith("-")).map { case (k, x) => k -> x._2 }
    assert(state == Map(1L -> 1, 2L -> 20, 3L -> 3, 4L -> 40), s"got $buf")
    assert(buf.count(_._4 == -1L) == 3, s"3 snapshot seed rows: $buf")
  }

  test("full startup with nothing to seed degenerates to earliest") {
    val t = newTable("fullplain")
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    val (got, _) = drain(t,
      Files.createTempDirectory("graft-src-ckpt").toString,
      Map("scan.startup.mode" -> "full"))
    assert(got.toSet == Set(1L -> 1, 2L -> 2))
  }

  test("a replaying seed batch fails loudly when the lake re-tiered under it") {
    val wh = Files.createTempDirectory("graft-src-wh").toString
    val lakeDir = s"$wh/_lakes/retier"
    val t = new Catalog(wh, spark).createTable("db", "retier",
      TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        bucketKeys = Seq("k"), numBuckets = 2,
        properties = Map(
          "table.datalake.enabled" -> "true",
          "table.datalake.dir" -> lakeDir,
          "table.datalake.format" -> "iceberg")))
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    t.tierSnapshot(lakeDir)
    val pinnedAtCheckpoint = t.latestOffsets
    // the lake moves between the (simulated) crash and the batch-0 replay
    t.append(rows(3L -> 3), orderBy = Seq(col("ord")))
    t.tierSnapshot(lakeDir)
    val e = intercept[IllegalStateException] {
      t.seedFrame(GraftTable.SeedSource.Lake(lakeDir, "iceberg"),
        pinnedAtCheckpoint)
    }
    assert(e.getMessage.contains("re-tiered"), e.getMessage)
    // the matching pinned offsets still read fine
    assert(t.seedFrame(GraftTable.SeedSource.Lake(lakeDir, "iceberg"),
      t.latestOffsets).count() == 3L)
  }

  test("the seed PIN survives a restart: re-tier across a crash fails loudly") {
    val wh = Files.createTempDirectory("graft-src-wh").toString
    val lakeDir = s"$wh/_lakes/pinned"
    val t = new Catalog(wh, spark).createTable("db", "pinned",
      TableDescriptor(
        StructType(schema.fields.filterNot(_.name == "ord")),
        bucketKeys = Seq("k"), numBuckets = 2,
        properties = Map(
          "table.datalake.enabled" -> "true",
          "table.datalake.dir" -> lakeDir,
          "table.datalake.format" -> "iceberg")))
    t.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))
    t.tierSnapshot(lakeDir)
    t.append(rows(3L -> 3), orderBy = Seq(col("ord")))
    val meta = Files.createTempDirectory("graft-src-meta").toString
    // source #1 resolves and PERSISTS the pin (batch 0 planned here,
    // "crash" before any commit)
    val s1 = new GraftSource(t, Map("scan.startup.mode" -> "full"), Some(meta))
    val end1 = s1.latestOffset(s1.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    // batch 0 plans cleanly against the pin (the guard runs inside
    // getBatch, driver-side; content delivery is covered by the drain
    // tests)
    s1.getBatch(None, end1.asInstanceOf[GraftSourceOffset])
    // while the stream is down, the tail grows and the lake RE-TIERS
    t.append(rows(4L -> 4), orderBy = Seq(col("ord")))
    t.tierSnapshot(lakeDir)
    // source #2 = the restart replaying batch 0: it must read the
    // CHECKPOINTED pin (not re-resolve to the fresh one) and refuse —
    // a fresh resolution would re-deliver [old pin, new pin) silently
    val s2 = new GraftSource(t, Map("scan.startup.mode" -> "full"), Some(meta))
    val e = intercept[IllegalStateException] {
      s2.getBatch(None, end1.asInstanceOf[GraftSourceOffset])
    }
    assert(e.getMessage.contains("re-tiered"), e.getMessage)
    // a restart with NO re-tier in between replays batch 0 cleanly
    val meta2 = Files.createTempDirectory("graft-src-meta").toString
    val s3 = new GraftSource(t, Map("scan.startup.mode" -> "full"), Some(meta2))
    val end3 = s3.latestOffset(s3.initialOffset(),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    val s4 = new GraftSource(t, Map("scan.startup.mode" -> "full"), Some(meta2))
    s4.getBatch(None, end3.asInstanceOf[GraftSourceOffset])
    // and the pinned file records the LAKE seed with its offsets
    val pin = graft.core.WarehouseIO
      .readStringIfExists(s"$meta2/graft-seed-pin.json")
    assert(pin.exists(_.contains("\"kind\":\"lake\"")), pin)
  }

  test("the seed marker round-trips through offset JSON") {
    val seeded = GraftSourceOffset(Map(0 -> 5L, 1 -> 7L), seedPending = true)
    assert(GraftSourceOffset.fromJson(seeded.json) == seeded)
    val plain = GraftSourceOffset(Map(0 -> 5L, 1 -> 7L))
    assert(GraftSourceOffset.fromJson(plain.json) == plain)
    // batch 0's start and end differ even on an empty tail, so the seed
    // batch is always planned
    assert(seeded.json != plain.json)
    assert(GraftSourceOffset.parse(seeded.json) == plain.buckets)
  }

  test("the timeline stamp round-trips through offset JSON; a pre-stamp " +
      "checkpoint parses to no stamp") {
    val stamped = GraftSourceOffset(Map(0 -> 5L, 1 -> 7L),
      stamp = Some((3L, 8)))
    assert(GraftSourceOffset.fromJson(stamped.json) == stamped)
    assert(GraftSourceOffset.parse(stamped.json) == stamped.buckets)
    // legacy checkpoint JSON (no _epoch/_nb): accepted, stamp None —
    // stamp-on-first-contact, the next planned offset carries one
    assert(GraftSourceOffset.fromJson("""{"0":5,"1":7}""").stamp.isEmpty)
  }

  test("resume across rollback_to_version refuses loudly (offsets are " +
      "reusable after a rollback — the checkpoint ABA)") {
    val t = newTable("roll")
    t.append(rows(1L -> 10, 2L -> 20), orderBy = Seq(col("ord")))
    val v = t.latestVersion.get
    t.append(rows(3L -> 30, 4L -> 40), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ck").toString
    val (got, _) = drain(t, ckpt)
    assert(got.toSet == Set(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40))
    // the stream is down; the table is rolled back — undone offsets are
    // now REUSED by a different append
    t.rollbackTo(v)
    t.append(rows(5L -> 50, 6L -> 60), orderBy = Seq(col("ord")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t, ckpt)
    }
    val msg = e.getCause.getMessage
    assert(msg.contains("rollbackEpoch"), msg)
    assert(msg.contains("fresh checkpoint"), msg)
    // a fresh checkpoint reads the post-rollback timeline cleanly
    val ckpt2 = Files.createTempDirectory("graft-src-ck").toString
    val (got2, _) = drain(t, ckpt2)
    assert(got2.toSet == Set(1L -> 10, 2L -> 20, 5L -> 50, 6L -> 60))
  }

  test("resume across sys.rebucket refuses loudly (old offsets are " +
      "coordinates in a vanished bucket numbering)") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-src-wh").toString, spark)
    val t = cat.createTable("db", "rbk", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    t.append(rows(1L -> 10, 2L -> 20, 3L -> 30), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-src-ck").toString
    val (got, _) = drain(t, ckpt)
    assert(got.toSet == Set(1L -> 10, 2L -> 20, 3L -> 30))
    val t8 = cat.rebucket("db", "rbk", 8)
    t8.append(rows(4L -> 40), orderBy = Seq(col("ord")))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(t8, ckpt)
    }
    val msg = e.getCause.getMessage
    assert(msg.contains("numBuckets"), msg)
    assert(msg.contains("fresh checkpoint"), msg)
  }
}
