package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core._

/** Streaming semantics (SURVEY §2.9): startup modes, exactly-once upsert
  * sink, hybrid snapshot+log read, stream-static lookup join.
  */
class StreamingSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("ord", LongType)))

  private def writeSrc(dir: String, rows: Seq[(Long, Int, Long)], file: String): Unit =
    spark.createDataFrame(rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
      .coalesce(1).write.mode("append").parquet(dir)

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-stream-wh").toString, spark)

  private def tmp() = Files.createTempDirectory("graft-s").toString

  test("log poller: poll/commit/resume covers the log exactly once") {
    val cat = newCatalog()
    val t = cat.createTable("db", "poll1", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    def rows(kv: (Long, Int)*) = spark.createDataFrame(
      kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)
    t.append(rows((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))

    val p = new LogPoller(t, "grp")
    val b1 = p.poll().select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(b1.toSet == Set((1L, 1), (2L, 2)))
    assert(p.poll().count() == 0) // position advanced; nothing new
    p.commit()

    t.append(rows((3L, 3)), orderBy = Seq(col("ord")))
    // a fresh poller for the same group resumes from the commit
    val p2 = new LogPoller(t, "grp")
    val b2 = p2.poll().select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(b2.toSeq == Seq((3L, 3)))

    // an uncommitted group starts over per its startup mode
    assert(new LogPoller(t, "grp2").poll().count() == 3)
    // Latest mode sees only post-construction commits
    val pl = new LogPoller(t, "grp3", GraftStream.StartupMode.Latest)
    assert(pl.poll().count() == 0)
    t.append(rows((4L, 4)), orderBy = Seq(col("ord")))
    assert(pl.poll().select("k").collect().map(_.getLong(0)).toSeq == Seq(4L))

    // seek rewinds explicitly
    p2.seek(Map.empty)
    assert(p2.poll().count() == 4)

    // a polled frame is immutable under later commits (offset-gated):
    val frozen = p2.poll() // empty window at current tail
    t.append(rows((5L, 5)), orderBy = Seq(col("ord")))
    assert(frozen.count() == 0)

    // max-poll-records admission control: each poll returns at most the
    // cap and resumes exactly where the previous one stopped
    val capped = new LogPoller(t, "cap", maxPollRecords = Some(2L))
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    var batch = capped.poll()
    while (batch.count() > 0) {
      assert(batch.count() <= 2, "poll must respect max-poll-records")
      seen ++= batch.select("k").collect().map(_.getLong(0))
      batch = capped.poll()
    }
    assert(seen.sorted == Seq(1L, 2L, 3L, 4L, 5L), s"lossless chunked drain: $seen")
  }

  test("log poller: position below the vacuumed log start fails loudly") {
    val cat = newCatalog()
    val t = cat.createTable("db", "poll2", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      primaryKey = Seq("k"), numBuckets = 2))
    def rows(kv: (Long, Int)*) = spark.createDataFrame(
      kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)
    t.upsert(rows((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))
    val lagging = new LogPoller(t, "lag")
    lagging.poll() // reads commit 1; never commits
    t.upsert(rows((3L, 3)), orderBy = Seq(col("ord")))
    t.compact()
    t.vacuumLog() // log below the snapshot cutoff is purged

    // a group committed at 0 (or an explicit seek below the floor) has
    // unreadable records ahead -> OFFSET_OUT_OF_RANGE analog
    val stale = new LogPoller(t, "stale")
    stale.seek(Map.empty)
    intercept[IllegalStateException](stale.poll())

    // a FRESH Earliest group starts at the retained floor: no throw,
    // and it sees only post-vacuum records (none yet)
    assert(new LogPoller(t, "fresh").poll().count() == 0)
    t.upsert(rows((4L, 4)), orderBy = Seq(col("ord")))
    // a LATER compact (no vacuum) advances snapshot meta but NOT the log
    // start: the floor must stay pinned at the vacuum-time cutoff, so a
    // fresh Earliest group still sees the retained post-vacuum records
    t.compact()
    assert(new LogPoller(t, "fresh2").poll().select("k").collect()
      .map(_.getLong(0)).toSet == Set(4L))
    // a bucket-subscribed poller checks the floor only for ITS buckets
    (0 until 2).foreach { b =>
      new LogPoller(t, s"sub$b", buckets = Some(Set(b))).poll()
    }
  }

  test("stream upsert sink: multi-batch LWW ingest equals batch merge") {
    val src = tmp()
    writeSrc(src, Seq((1L, 1, 0L), (2L, 2, 1L)), "a")
    writeSrc(src, Seq((1L, 10, 2L), (3L, 3, 3L)), "b")
    val t = newCatalog().createTable("db", "s1", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    GraftStream.upsertSink(stream, t, "sink1", "ord", tmp()).awaitTermination()
    // files may arrive in either order; keys 2 and 3 are unambiguous
    val got = t.scan().collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(2L) == 2 && got(3L) == 3 && Set(1, 10).contains(got(1L)))
    assert(GraftStream.committedBatches(t, "sink1").size == 2)
  }

  test("exactly-once: replayed batches are skipped via the commit log") {
    val src = tmp()
    writeSrc(src, Seq((1L, 5, 0L)), "a")
    val t = newCatalog().createTable("db", "s2", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k"),
      mergeEngine = MergeEngine.Aggregation(Map("v" -> AggFunction.Sum))))
    val mk = () => spark.readStream.schema(schema).parquet(src)
    val ckptA = tmp()
    GraftStream.upsertSink(mk(), t, "sinkX", "ord", ckptA).awaitTermination()
    // fresh checkpoint -> Spark replays the same data as batch 0; the
    // sink's commit log must dedupe it
    GraftStream.upsertSink(mk(), t, "sinkX", "ord", tmp()).awaitTermination()
    assertSameRows(t.scan().collect(), Seq(Row(1L, 5)))
    // a genuinely new batch (same checkpoint, new file -> batch 1) applies
    writeSrc(src, Seq((1L, 7, 1L)), "b")
    GraftStream.upsertSink(mk(), t, "sinkX", "ord", ckptA).awaitTermination()
    assertSameRows(t.scan().collect(), Seq(Row(1L, 12)))
  }

  test("hybrid snapshot+log: snapshot batch then tail only") {
    val cat = newCatalog()
    val t = cat.createTable("db", "s3", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    t.upsert(df((1L, 1, 0L), (2L, 2, 1L)), orderBy = Seq(col("ord")))
    t.upsert(df((3L, 3, 2L)), orderBy = Seq(col("ord")))

    var snapshotRows = 0L
    var tailRows = 0L
    val q = GraftStream.hybrid(spark, t) { (batch, id) =>
      if (id == -1L) snapshotRows = batch.count()
      else tailRows += batch.count()
    }
    q.awaitTermination()
    // snapshot = full state at hybrid() call; nothing was appended after
    // the snapshot offsets were captured, so the tail replays nothing —
    // exactly-once across the snapshot/log switch
    assert(snapshotRows == 3)
    assert(tailRows == 0)
  }

  test("startup mode timestamp filters older commits") {
    val cat = newCatalog()
    val t = cat.createTable("db", "s4", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    t.upsert(df((1L, 1, 0L)), orderBy = Seq(col("ord")))
    Thread.sleep(5)
    val cut = System.currentTimeMillis()
    Thread.sleep(5)
    t.upsert(df((2L, 2, 1L)), orderBy = Seq(col("ord")))

    var seen = Vector.empty[Long]
    val q = GraftStream.readLog(spark, t, GraftStream.StartupMode.Timestamp(cut))
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen = seen ++ b.select("k").collect().map(_.getLong(0))
      }.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    assert(seen.toSet == Set(2L))
  }

  test("stream-static lookup join enriches against current state") {
    val cat = newCatalog()
    val dim = cat.createTable("db", "s5dim", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    dim.upsert(df((1L, 100, 0L), (2L, 200, 1L)), orderBy = Seq(col("ord")))

    val src = tmp()
    writeSrc(src, Seq((1L, 0, 0L), (2L, 0, 1L), (9L, 0, 2L)), "a")
    val stream = spark.readStream.schema(schema).parquet(src)
      .select(col("k"), col("ord"))
    var out = Vector.empty[(Long, Any)]
    val q = GraftStream.lookupJoin(stream, dim, Seq("k"))
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out = out ++ b.select("k", "v").collect().map(r => (r.getLong(0), r.get(1)))
      }.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    assert(out.toMap == Map(1L -> 100, 2L -> 200, 9L -> null))
  }

  test("cached lookup join: one materialization across micro-batches, TTL refresh sees new commits") {
    val cat = newCatalog()
    val dim = cat.createTable("db", "s5dimc", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    dim.upsert(df((1L, 100, 0L), (2L, 200, 1L)), orderBy = Seq(col("ord")))

    val src = tmp()
    writeSrc(src, Seq((1L, 0, 0L)), "a")
    writeSrc(src, Seq((2L, 0, 1L)), "b")
    writeSrc(src, Seq((9L, 0, 2L)), "c")
    var fakeNow = 0L
    val cache = GraftStream.cachedLookup(dim,
      java.time.Duration.ofMinutes(10), () => fakeNow)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
      .select(col("k"), col("ord"))
    var out = Vector.empty[(Long, Any)]
    var batches = 0
    val q = stream.writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          batches += 1
          out = out ++ cache.join(b, Seq("k"))
            .select("k", "v").collect().map(r => (r.getLong(0), r.get(1)))
      }.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    assert(batches >= 3, s"expected >=3 micro-batches, got $batches")
    assert(cache.materializations == 1,
      s"state materialized ${cache.materializations} times for $batches batches")
    // same answer as the uncached per-batch path
    assert(out.toMap == Map(1L -> 100, 2L -> 200, 9L -> null))
    // a commit after stream start is invisible inside the TTL window …
    dim.upsert(df((9L, 900, 2L)), orderBy = Seq(col("ord")))
    assert(cache.join(spark.createDataFrame(Seq(Row(9L, 9L)).asJava,
        StructType(Seq(StructField("k", LongType), StructField("ord", LongType)))),
      Seq("k")).select("v").collect().head.get(0) == null)
    assert(cache.materializations == 1)
    // … and visible after the TTL expires (expire-after-write refresh)
    fakeNow += java.time.Duration.ofMinutes(11).toMillis
    assert(cache.join(spark.createDataFrame(Seq(Row(9L, 9L)).asJava,
        StructType(Seq(StructField("k", LongType), StructField("ord", LongType)))),
      Seq("k")).select("v").collect().head.get(0) == 900)
    assert(cache.materializations == 2)
    cache.close()
  }

  test("FULL cached lookup: eager load, interval reload sees new commits, " +
      "matches the uncached join") {
    val cat = newCatalog()
    val dim = cat.createTable("db", "s5dimf", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k")))
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    dim.upsert(df((1L, 100, 0L), (2L, 200, 1L)), orderBy = Seq(col("ord")))
    var fakeNow = 0L
    val cache = GraftStream.fullCachedLookup(dim,
      java.time.Duration.ofMinutes(5), () => fakeNow)
    def probe(k: Long): Any = cache.join(spark.createDataFrame(
        Seq(Row(k, 0L)).asJava,
        StructType(Seq(StructField("k", LongType), StructField("ord", LongType)))),
      Seq("k")).select("v").collect().head.get(0)
    // eager initial snapshot serves immediately, matching the uncached join
    assert(probe(1L) == 100 && probe(9L) == null)
    assert(cache.reloads == 0)
    // a commit inside the interval is invisible …
    dim.upsert(df((9L, 900, 2L)), orderBy = Seq(col("ord")))
    assert(probe(9L) == null && cache.reloads == 0)
    // … and visible after the boundary (one reload, not one per access)
    fakeNow += java.time.Duration.ofMinutes(6).toMillis
    assert(probe(9L) == 900 && probe(2L) == 200)
    assert(cache.reloads == 1)
    // idle across MANY intervals → still exactly one further reload
    dim.upsert(df((2L, 222, 3L)), orderBy = Seq(col("ord")))
    fakeNow += java.time.Duration.ofMinutes(60).toMillis
    assert(probe(2L) == 222)
    assert(cache.reloads == 2)
    // reload result equals the uncached lookup on current state
    val want = dim.currentState().select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(1L, 2L, 9L).map(k => k -> probe(k)).toMap ==
      want.map { case (k, v) => k -> (v: Any) })
    cache.close()
  }

  test("changelogStream: state-store materializer emits the same changelog as the batch path") {
    val src = tmp()
    writeSrc(src, Seq((1L, 1, 0L), (2L, 2, 1L)), "a")
    Thread.sleep(20) // file-source order is by modification time
    writeSrc(src, Seq((1L, 10, 2L), (3L, 3, 3L)), "b")
    val desc = TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")), primaryKey = Seq("k"))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src)
    val q = GraftStream.changelogStream(stream, desc, "ord")
      .writeStream.format("memory").queryName("cs1")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT _change_type, k, v FROM cs1").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // batch-path reference: same ops through a table
    val t = newCatalog().createTable("db", "cs_ref", desc)
    def df(rows: (Long, Int, Long)*) = spark.createDataFrame(
      rows.map { case (k, v, o) => Row(k, v, o) }.asJava, schema)
    t.upsert(df((1L, 1, 0L), (2L, 2, 1L)), orderBy = Seq(col("ord")))
    t.upsert(df((1L, 10, 2L), (3L, 3, 3L)), orderBy = Seq(col("ord")))
    val exp = t.changelog().collect()
      .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("k"), r.getAs[Int]("v")))
      .sorted.toSeq
    assert(got == exp)
  }

  test("delta join: stream-stream equi-join with watermark-bounded state") {
    val tsSchema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("v", IntegerType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def rows(vs: (Long, Int)*) = vs.zipWithIndex.map { case ((k, v), i) =>
      Row(k, new java.sql.Timestamp(base.getTime + i * 1000L), v)
    }
    val (srcL, srcR) = (tmp(), tmp())
    spark.createDataFrame(rows(1L -> 10, 2L -> 20, 3L -> 30).asJava, tsSchema)
      .coalesce(1).write.mode("overwrite").parquet(srcL)
    spark.createDataFrame(rows(2L -> 200, 3L -> 300, 4L -> 400).asJava, tsSchema)
      .coalesce(1).write.mode("overwrite").parquet(srcR)
    val l = spark.readStream.schema(tsSchema).parquet(srcL)
      .select(col("k"), col("ts").as("lts"), col("v").as("lv"))
    val r = spark.readStream.schema(tsSchema).parquet(srcR)
      .select(col("k"), col("ts").as("rts"), col("v").as("rv"))
    val joined = GraftStream.deltaJoin(l, "lts", r, "rts", Seq("k"), "1 minute")
    val q = joined.writeStream.format("memory").queryName("dj1")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT k, lv, rv FROM dj1").collect()
      .map(r0 => (r0.getLong(0), r0.getInt(1), r0.getInt(2))).sorted.toSeq
    assert(got == Seq((2L, 20, 200), (3L, 30, 300)))
  }

  test("delta join: time-range condition joins only rows within the bound") {
    val tsSchema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("v", IntegerType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val (srcL, srcR) = (tmp(), tmp())
    // left rows at t=60 and t=120; right rows at t=50 (within 30 min of
    // t=60), t=115 (within 30 min of t=120), and t=10 (too early for both)
    spark.createDataFrame(Seq(
      Row(1L, at(60), 1), Row(1L, at(120), 2)).asJava, tsSchema)
      .coalesce(1).write.mode("overwrite").parquet(srcL)
    spark.createDataFrame(Seq(
      Row(1L, at(50), 100), Row(1L, at(115), 200), Row(1L, at(10), 300),
      Row(2L, at(55), 400)).asJava, tsSchema)
      .coalesce(1).write.mode("overwrite").parquet(srcR)
    val l = spark.readStream.schema(tsSchema).parquet(srcL)
      .select(col("k"), col("ts").as("lts"), col("v").as("lv"))
    val r = spark.readStream.schema(tsSchema).parquet(srcR)
      .select(col("k").as("rk"), col("ts").as("rts"), col("v").as("rv"))
    val joined = GraftStream.deltaJoin(l, "lts", r, "rts",
      l("k") === r("rk") &&
        r("rts") >= l("lts") - expr("INTERVAL 30 MINUTES") &&
        r("rts") <= l("lts"),
      "1 hour")
    val q = joined.writeStream.format("memory").queryName("dj2")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT lv, rv FROM dj2").collect()
      .map(r0 => (r0.getInt(0), r0.getInt(1))).sorted.toSeq
    assert(got == Seq((1, 100), (2, 200)))

    // state-boundedness regression: the analyzed Join condition must carry
    // the watermark-delay metadata on its event-time attributes — that is
    // what StreamingJoinHelper reads to derive state-eviction bounds from
    // the time range (DSL conditions resolve against the pre-watermark
    // plans and lose it; deltaJoin rewrites them)
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val conds = joined.queryExecution.analyzed.collect {
      case j: Join => j.condition.get
    }
    assert(conds.nonEmpty)
    val tsAttrs = conds.flatMap(_.collect {
      case a: AttributeReference if a.name == "lts" || a.name == "rts" => a
    })
    assert(tsAttrs.nonEmpty &&
      tsAttrs.forall(_.metadata.contains("spark.watermarkDelayMs")),
      tsAttrs.map(a => s"${a.name}:${a.metadata}").mkString(", "))
  }

  test("dedupStream: duplicates across micro-batches collapse to one row per key") {
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("ts", TimestampType), StructField("v", IntegerType)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Long) = new java.sql.Timestamp(base.getTime + mins * 60000L)
    val src = tmp()
    // two files = two micro-batches; key 1 duplicated within AND across
    // batches, key 2 once, key 3 only in batch 2
    spark.createDataFrame(Seq(
      Row(1L, at(0), 1), Row(1L, at(1), 2), Row(2L, at(2), 3)).asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(src + "/f1")
    spark.createDataFrame(Seq(
      Row(1L, at(3), 4), Row(3L, at(4), 5)).asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(src + "/f2")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src + "/f*")
    val q = GraftStream.dedupStream(stream, "ts", "1 hour", Seq("k"))
      .select(col("k"))
      .writeStream.format("memory").queryName("sdq")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT k FROM sdq").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("aggView: derived aggregate equals batch agg of source state, incl. retractions") {
    val cat = newCatalog()
    val src = cat.createTable("av", "src", TableDescriptor(
      StructType(Seq(
        StructField("k", LongType), StructField("grp", StringType),
        StructField("v", IntegerType))),
      primaryKey = Seq("k")))
    val tgt = cat.createTable("av", "view", TableDescriptor(
      StructType(Seq(
        StructField("grp", StringType, nullable = false),
        StructField("n", LongType), StructField("total", LongType))),
      primaryKey = Seq("grp"),
      mergeEngine = MergeEngine.Aggregation(Map(
        "n" -> AggFunction.Sum, "total" -> AggFunction.Sum))))
    val ckpt = tmp()
    import spark.implicits._
    def sync(): Unit = {
      val q = graft.streaming.GraftStream.aggView(spark, src, tgt, Seq("grp"),
        Map("total" -> col("v").cast("long")), Some("n"), "t", ckpt)
      q.awaitTermination()
    }
    // commit 1: keys 1,2 in group a; key 3 in group b
    src.upsert(Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 5))
      .toDF("k", "grp", "v"), orderBy = Seq(col("k")))
    sync()
    assert(tgt.scan().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet == Set(("a", 2L, 30L), ("b", 1L, 5L)))
    // commit 2: key 2 MOVES a->b (retract from a, add to b); key 3 value bumps
    src.upsert(Seq((2L, "b", 21), (3L, "b", 7)).toDF("k", "grp", "v"),
      orderBy = Seq(col("k")))
    sync()
    val got = tgt.scan().filter(col("n") > 0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val exp = src.scan().groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("v").cast("long")).as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp && got == Set(("a", 1L, 10L), ("b", 2L, 28L)))
    // replay safety: a third sync with no new commits changes nothing
    sync()
    assert(tgt.scan().filter(col("n") > 0).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet == exp)
  }

  test("watermarked tumbling window over an event stream") {
    val src = tmp()
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val tsSchema = StructType(Seq(StructField("ts", TimestampType),
      StructField("v", IntegerType)))
    val rows = (0 until 100).map { i =>
      Row(new java.sql.Timestamp(base.getTime + i * 60000L), i)
    }
    spark.createDataFrame(rows.asJava, tsSchema)
      .coalesce(1).write.mode("overwrite").parquet(src)
    val agg = spark.readStream.schema(tsSchema).parquet(src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("win1")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmp()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT n FROM win1").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(40L, 60L))) // 100 minutes -> 60 + 40
  }

  test("log poller: a group resuming across rollback_to_version refuses " +
      "loudly; seek() re-pins and recovers") {
    val cat = newCatalog()
    val t = cat.createTable("db", "pepoch", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    def rows(kv: (Long, Int)*) = spark.createDataFrame(
      kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)
    t.append(rows((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))
    val v = t.latestVersion.get
    t.append(rows((3L, 3), (4L, 4)), orderBy = Seq(col("ord")))
    val p = new LogPoller(t, "geo")
    assert(p.poll().count() == 4)
    p.commit()
    // group is idle; the rollback REUSES the undone offsets for new rows
    t.rollbackTo(v)
    t.append(rows((5L, 5), (6L, 6)), orderBy = Seq(col("ord")))
    val e = intercept[IllegalStateException](new LogPoller(t, "geo"))
    assert(e.getMessage.contains("rollbackEpoch"), e.getMessage)
    // recovery: an uncommitted fresh group reads the current timeline,
    // and the refused group can seek() to an explicit position
    val p2 = new LogPoller(t, "geo2")
    assert(p2.poll().count() == 4) // 1,2 + 5,6
    val p3 = intercept[IllegalStateException](new LogPoller(t, "geo"))
    assert(p3.getMessage.contains("seek()"), p3.getMessage)
  }

  test("log poller: a LIVE poller across sys.rebucket refuses at the " +
      "next poll (bucket numbering vanished under it)") {
    val cat = newCatalog()
    val t = cat.createTable("db", "prbk", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    def rows(kv: (Long, Int)*) = spark.createDataFrame(
      kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)
    t.append(rows((1L, 1), (2L, 2), (3L, 3)), orderBy = Seq(col("ord")))
    val p = new LogPoller(t, "live")
    assert(p.poll().count() == 3)
    cat.rebucket("db", "prbk", 8)
    val e = intercept[IllegalStateException](p.poll())
    assert(e.getMessage.contains("numBuckets"), e.getMessage)
    // seek() asserts a position in the NEW numbering and recovers
    val t8 = cat.getTable("db", "prbk")
    p.seek(t8.latestOffsets)
    assert(p.poll().count() == 0)
    t8.append(rows((4L, 4)), orderBy = Seq(col("ord")))
    assert(p.poll().select("k").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }
}
