package graft.streaming


import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => ConnectorOffset, ReadLimit, ReadMaxRows, ReportsSourceMetrics, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.graftshim.StreamShims
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{CatalogJson, GraftTable}

/** Structured Streaming source over a graft table's log, tracked by
  * per-bucket MANIFEST offsets — the reference's Flink source in Spark
  * form (`FlussSource` / `FlussSourceOffset`: per-bucket next offsets in
  * checkpoint state, fluss-flink/.../source/FlussSource.java). Usage:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("path", "/warehouse/db/events")
  *     .option("scan.startup.mode", "timestamp")           // earliest|latest|timestamp
  *     .option("scan.startup.timestamp-millis", "1700000000000")
  *     .option("maxOffsetsPerTrigger", "100000")           // admission control
  *     .load()
  * }}}
  *
  * Why offsets and not file discovery ([[GraftStream.readLog]]'s file
  * stream): offsets name RECORDS, files are just containers. Maintenance
  * that rewrites containers without touching records —
  * [[GraftTable.rewriteLogFiles]] small-file compaction — is invisible to
  * an offset range but double-delivers under file discovery (the rewritten
  * files look new). The offset gates also make every planned batch
  * immutable under concurrent commits, and a batch below the vacuumed
  * log-start floor fails loudly (the reference's OFFSET_OUT_OF_RANGE)
  * instead of silently skipping purged records.
  *
  * Scale posture: planning is manifest-file reads (≤numBuckets entries) on
  * the driver; each micro-batch is an ordinary offset-gated parquet scan —
  * distributed, codegen'd, partition-pruned like any batch read of the
  * same range. Nothing data-scale ever sits in the source or checkpoint.
  */
final class GraftSource(table: GraftTable, parameters: Map[String, String],
    metadataPath: Option[String] = None)
    extends Source with SupportsTriggerAvailableNow with ReportsSourceMetrics {

  private val params = parameters.map { case (k, v) => k.toLowerCase -> v }

  // the table path is <warehouse>/<db>/<table>: the dynamic-config store
  // (sys.set_cluster_configs) sits two levels up
  private val warehouse: String = graft.core.WarehouseIO.warehouseOf(table.path)

  /** Mode resolution: reader option first, else the conf
    * `spark.sql.graft.scan.startup.mode` (the reference's SET-able
    * `spark.sql.fluss.scan.startup.mode`, engine-spark/options.md:15 —
    * and the only channel `readStream.table(...)` has, since Spark's
    * V1-fallback resolution drops reader options) with SESSION > DYNAMIC
    * precedence (so `sys.set_cluster_configs` steers streams too), else
    * earliest. The table path is `<warehouse>/<db>/<table>`, so the
    * dynamic store sits two levels up.
    */
  private val startup: GraftStream.StartupMode =
    params.get("scan.startup.mode")
      .orElse(Some(graft.core.DynamicConfigs.effective(table.sparkSession,
        warehouse, "spark.sql.graft.scan.startup.mode", "earliest")))
      .map(_.toLowerCase) match {
      case None | Some("earliest") => GraftStream.StartupMode.Earliest
      case Some("latest") => GraftStream.StartupMode.Latest
      case Some("full") => GraftStream.StartupMode.Full
      case Some("timestamp") => GraftStream.StartupMode.Timestamp(
        params.getOrElse("scan.startup.timestamp-millis",
          throw new IllegalArgumentException(
            "scan.startup.mode=timestamp requires scan.startup.timestamp-millis")).toLong)
      case Some("version") => GraftStream.StartupMode.FromVersion(
        params.getOrElse("scan.startup.version",
          throw new IllegalArgumentException(
            "scan.startup.mode=version requires scan.startup.version")).toLong)
      case Some(other) => throw new IllegalArgumentException(
        s"unknown scan.startup.mode '$other' " +
          "(earliest/latest/full/timestamp/version)")
    }

  /** `full` startup (T2 hybrid snapshot+log, the reference's
    * HybridSnapshotLogSplit in micro-batch form): the seed — the tiered
    * LAKE at its pinned tier offsets for a `table.datalake.*`-enabled
    * table, else the KV snapshot — resolved ONCE at source construction.
    * None = nothing to seed yet; full then degenerates to earliest. The
    * seed is delivered WHOLE in the first planned batch (admission
    * control paces the log tail only): it is one consistent snapshot, and
    * splitting it across rate-limited batches would publish a state no
    * commit ever produced.
    */
  private val fullSeed: Option[(GraftTable.SeedSource, Map[Int, Long])] =
    startup match {
      case GraftStream.StartupMode.Full => pinnedFullSeed()
      case _ => None
    }

  /** Resolve the full-startup seed ONCE PER CHECKPOINT, not once per
    * source instance: the first resolution is persisted under the
    * stream's metadata dir, and every later instance — including a
    * crash-restart replaying batch 0 — reads the PINNED seed back
    * instead of re-resolving. That is what makes the replay guard real
    * across restarts: [[GraftTable.requireSeedCurrent]] then compares
    * the CURRENT seed surface against what the checkpoint actually
    * consumed, so a re-tier/re-compact while the stream was down fails
    * loudly instead of silently double-delivering the window between
    * the old and new pins. Resolving-to-nothing is pinned too (batch 0
    * already ran seedless; a later compact must not grow a seed into a
    * replay). No metadata dir (embedded use) = in-session pin only.
    */
  private def pinnedFullSeed()
      : Option[(GraftTable.SeedSource, Map[Int, Long])] = metadataPath match {
    case None => table.resolveFullStartup()
    case Some(dir) =>
      val f = s"$dir/graft-seed-pin.json"
      graft.core.WarehouseIO.readStringIfExists(f) match {
        case Some(json) => GraftSource.parseSeedPin(json)
        case None =>
          val resolved = table.resolveFullStartup()
          graft.core.WarehouseIO.mkdirs(dir)
          graft.core.CatalogJson.atomicWrite(f,
            GraftSource.writeSeedPin(resolved))
          // the file is the source of truth (covers a concurrent-start
          // race: whoever published first wins)
          GraftSource.parseSeedPin(
            graft.core.WarehouseIO.readStringIfExists(f).getOrElse(
              GraftSource.writeSeedPin(resolved)))
      }
  }

  // reader option first, then the session/dynamic conf — the only
  // channel `readStream.table(...)` has (V1-fallback resolution drops
  // reader options), mirroring the startup-mode resolution above
  private val maxOffsetsPerTrigger: Option[Long] =
    params.get("maxoffsetspertrigger")
      .orElse(Option(graft.core.DynamicConfigs.effective(table.sparkSession,
        warehouse, "spark.sql.graft.maxOffsetsPerTrigger", ""))
        .filter(_.nonEmpty))
      .map(_.toLong)

  /** `stream.data-columns=true`: emit only the table's data columns, no
    * `__change_type`/`__offset`/... system columns. Set by the catalog's
    * streaming fallback ([[graft.connector.GraftDsTable.v1Table]]) so
    * `spark.readStream.table("cat.db.t")` streams with exactly the
    * table's declared schema — the V1↔V2 fallback requires the V1
    * source's schema to match the catalog table's columns, and it is
    * also what the reference's Spark streaming read returns
    * (website/docs/engine-spark/structured-streaming.md:61-88).
    */
  private val dataColumnsOnly: Boolean =
    params.get("stream.data-columns").exists(_.toBoolean)

  /** Where an uncheckpointed stream starts, resolved ONCE at source
    * construction (latest/timestamp are start-time decisions, like the
    * reference's startup modes).
    */
  private val startOffsets: Map[Int, Long] = startup match {
    // earliest = first RETAINED offset: 0 until a vacuum moves the floor
    case GraftStream.StartupMode.Earliest =>
      table.retainedFloorOffsets.getOrElse(Map.empty)
    case GraftStream.StartupMode.Latest => table.latestOffsets
    case GraftStream.StartupMode.Timestamp(ms) =>
      table.offsetsForTimestamp(new java.sql.Timestamp(ms))
    case GraftStream.StartupMode.FromVersion(v) => table.offsetsAtVersion(v)
    // full = log tail from the seed's pinned offsets; the seed itself
    // rides the first batch (seedPending marker on the initial offset)
    case GraftStream.StartupMode.Full => fullSeed.map(_._2)
      .getOrElse(table.retainedFloorOffsets.getOrElse(Map.empty))
  }

  override def schema: StructType =
    if (dataColumnsOnly) table.desc.schema else table.logSchema

  /** Advance `from` toward `avail`, spending at most `budget` records
    * (offsets are dense per bucket, so offset delta = record count).
    * Buckets drain in id order — deterministic, and a hot bucket cannot
    * starve later ones forever because its backlog is finite per call.
    */
  private def capped(from: Map[Int, Long], avail: Map[Int, Long],
      budget: Long): Map[Int, Long] = {
    var left = budget
    avail.toSeq.sortBy(_._1).map { case (b, hi) =>
      val lo = from.getOrElse(b, 0L)
      val adv = math.max(0L, math.min(hi - lo, left))
      left -= adv
      b -> (lo + adv)
    }.toMap
  }

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())

  /** The timeline these offsets are coordinates in: (rollbackEpoch,
    * PUBLISHED bucket count). Read fresh each time it is consulted — the
    * source's table handle pins construction-time state, but a rollback
    * or rebucket lands while the stream runs or sleeps, and the check
    * must see it. Two tiny driver-side file reads (`_rollbacks.json`,
    * `meta.json`), the same order of work as the per-trigger manifest
    * read; non-catalog dirs (no meta.json) fall back to the descriptor.
    */
  private[streaming] def currentStamp: (Long, Int) =
    (table.rollbackEpoch, table.currentHandle().desc.numBuckets)

  override def initialOffset(): ConnectorOffset =
    GraftSourceOffset(startOffsets, seedPending = fullSeed.isDefined,
      stamp = Some(currentStamp))

  /** Trigger.AvailableNow: pin the tail ONCE at trigger start; rate-limited
    * batches then run up to exactly that tail and stop, even while writers
    * keep committing (their records belong to the next trigger).
    */
  @volatile private var availableNowCap: Option[Map[Int, Long]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.latestOffsets)

  // Availability snapshot from this trigger's planning call, reused by
  // getBatch's lag gauge — one manifest read per trigger, not two. Only
  // an optimization cache: getBatch re-reads when absent (first batch
  // after checkpoint recovery replays with no planning call).
  @volatile private var lastAvail: Option[Map[Int, Long]] = None

  override def latestOffset(start: ConnectorOffset, limit: ReadLimit): ConnectorOffset = {
    val from = Option(start).map(GraftSourceOffset.from).getOrElse(startOffsets)
    // offsets only grow, so the AvailableNow cap is simply the availability
    // snapshot taken at trigger start
    val avail = availableNowCap.getOrElse(table.latestOffsets)
    lastAvail = Some(avail)
    val st = Some(currentStamp)
    limit match {
      case r: ReadMaxRows =>
        GraftSourceOffset(capped(from, avail, r.maxRows()), stamp = st)
      case _ => GraftSourceOffset(avail, stamp = st)
    }
  }

  override def reportLatestOffset(): ConnectorOffset =
    GraftSourceOffset(table.latestOffsets, stamp = Some(currentStamp))

  // legacy no-admission-control planning path
  override def getOffset: Option[V1Offset] = {
    val avail = table.latestOffsets
    lastAvail = Some(avail)
    if (avail.isEmpty) None
    else Some(GraftSourceOffset(avail, stamp = Some(currentStamp)))
  }

  /** Per-batch bookkeeping shared by this V1 `getBatch` and the DSv2
    * [[GraftMicroBatchStream.planInputPartitions]]: the
    * OFFSET_OUT_OF_RANGE guard and the stream-lag gauge.
    *
    * OFFSET_OUT_OF_RANGE: records in [from, floor) were vacuumed away —
    * that replay (e.g. a restart from an old checkpoint) cannot be
    * exactly-once, so fail instead of silently skipping the gap.
    *
    * Lag observability: records committed beyond this batch's end — an
    * operator watching a backlogged stream reads it from the metrics
    * registry / `metrics` meta table / Prometheus text instead of
    * diffing the `offsets` meta table by hand. Availability comes from
    * this trigger's own planning call (no second manifest read), EXCEPT
    * under Trigger.AvailableNow, whose planning snapshot is pinned at
    * trigger start — records committed while the run drains must still
    * count as lag, so that path reads the true tail. A checkpoint-
    * recovery REPLAY also re-reads (no planning call yet), where the
    * gauge momentarily reports lag relative to the replayed batch's old
    * end — accurate: those records genuinely remain unprocessed.
    */
  private[streaming] def noteBatchWindow(fromOff: GraftSourceOffset,
      until: Map[Int, Long]): Unit = {
    val from = fromOff.buckets
    // Timeline pin FIRST (before the vacuum-floor check — a rollback can
    // leave the floor satisfied while the offsets mean different rows):
    // a checkpoint stamped under one (rollbackEpoch, numBuckets) must
    // not replay under another. rollback_to_version REUSES the undone
    // offset range for later commits — same numbers, other rows — and
    // sys.rebucket replaces the whole bucket numbering; both would
    // double-deliver / skip / cross-deliver silently. Unstamped (legacy)
    // checkpoints skip the check once; every offset planned from here on
    // carries a stamp.
    fromOff.stamp.foreach { case (e, n) =>
      val (ce, cn) = currentStamp
      if (e != ce || n != cn) throw new IllegalStateException(
        s"checkpoint for ${table.path} was written under " +
          s"(rollbackEpoch=$e, numBuckets=$n) but the table is now at " +
          s"(rollbackEpoch=$ce, numBuckets=$cn) — a rollback_to_version/" +
          "undo or sys.rebucket re-made what these offsets mean, so " +
          "resuming would deliver wrong rows; restart the stream from a " +
          "fresh checkpoint (full/earliest startup re-reads current state)")
    }
    table.retainedFloorOffsets.foreach { floor =>
      val lost = floor.filter { case (b, f) =>
        from.getOrElse(b, 0L) < math.min(f, until.getOrElse(b, 0L))
      }
      if (lost.nonEmpty) throw new IllegalStateException(
        s"stream position $from is below the retained log start $lost " +
          "(log vacuumed); records in between are gone — restart the " +
          "stream from a fresh checkpoint or the table snapshot")
    }
    val latest =
      if (availableNowCap.isDefined) table.latestOffsets
      else lastAvail.getOrElse(table.latestOffsets)
    graft.core.GraftMetrics.setGauge(table.path,
      graft.core.GraftMetrics.StreamLag,
      latest.map { case (b, hi) =>
        math.max(0L, hi - until.getOrElse(b, 0L))
      }.sum)
  }

  /** Where an uncheckpointed stream starts ([[GraftMicroBatchStream]]
    * reads it for its own planning).
    */
  private[streaming] def resolvedStartOffsets: Map[Int, Long] = startOffsets

  /** The full-startup seed, if this source has one pending
    * ([[GraftMicroBatchStream]] reads it for its own planning).
    */
  private[streaming] def resolvedSeed
      : Option[(GraftTable.SeedSource, Map[Int, Long])] = fullSeed

  /** The seed a batch whose start offset carries the pending marker must
    * deliver. A marker without a resolvable seed means the table's seed
    * surface was removed between the checkpoint and this restart — fail
    * loudly rather than silently dropping batch 0's cold state.
    */
  private[streaming] def seedToDeliver(fromOff: GraftSourceOffset)
      : Option[GraftTable.SeedSource] =
    if (!fromOff.seedPending) None
    else Some(fullSeed.getOrElse(throw new IllegalStateException(
      s"checkpoint for ${table.path} expects a full-startup seed batch " +
        "but the table no longer resolves one (datalake properties " +
        "removed / snapshot gone); restart from a fresh checkpoint"))._1)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // V1 passes start = None for the very first batch (replays included):
    // that IS the initial offset, so a configured seed is still pending
    val fromOff = start.map(o => GraftSourceOffset.offsetOf(o)).getOrElse(
      GraftSourceOffset(startOffsets, seedPending = fullSeed.isDefined))
    val from = fromOff.buckets
    val until = GraftSourceOffset.from(end)
    noteBatchWindow(fromOff, until)
    val range = table.scanRange(from, until)
    val batch = seedToDeliver(fromOff) match {
      case Some(seed) => table.seedFrame(seed, from).unionByName(range)
      case None => range
    }
    StreamShims.asStreaming(
      if (dataColumnsOnly)
        batch.select(table.desc.schema.fieldNames.toIndexedSeq.map(
          org.apache.spark.sql.functions.col): _*)
      else batch)
  }

  /** Native progress metrics ([[ReportsSourceMetrics]]) — the standard
    * surface operators watch: `StreamingQueryProgress.sources[].metrics`.
    * Spark's progress reporter consults the mixin on any
    * `SparkDataStream` — a V1 `Source` included — so the lag the engine
    * already publishes to its own registry also lands in every progress
    * event / `StreamingQueryListener` natively (the reference reserves
    * the same surface via `ReportsSourceMetrics` on
    * fluss-spark/.../read/FlussMicroBatchStream.scala:51,158; its
    * `metrics()` body is still a TODO). Names follow the Kafka source's
    * `*OffsetsBehindLatest` convention, adapted to records (offsets are
    * dense per bucket, so offset delta = record count):
    *
    *  - `numRecordsBehindLatest`: total backlog across buckets
    *  - `maxRecordsBehindLatest` / `minRecordsBehindLatest`: worst /
    *    best per-bucket backlog — max≫min signals a hot bucket.
    *
    * `latestConsumedOffset` is the last COMMITTED batch end (what the
    * checkpoint durably covers); an unstarted stream measures from the
    * startup offsets. One manifest read per progress event, driver-side.
    */
  override def metrics(latestConsumedOffset: java.util.Optional[ConnectorOffset])
      : java.util.Map[String, String] = {
    val consumed: Map[Int, Long] =
      if (latestConsumedOffset.isPresent)
        GraftSourceOffset.from(latestConsumedOffset.get)
      else startOffsets
    val latest = table.latestOffsets
    val lags = latest.toSeq.map { case (b, hi) =>
      math.max(0L, hi - consumed.getOrElse(b, 0L))
    }
    val m = new java.util.HashMap[String, String]
    m.put("numRecordsBehindLatest", lags.sum.toString)
    m.put("maxRecordsBehindLatest",
      (if (lags.isEmpty) 0L else lags.max).toString)
    m.put("minRecordsBehindLatest",
      (if (lags.isEmpty) 0L else lags.min).toString)
    m
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftSource[${table.path}]"
}

object GraftSource {

  /** Seed-pin file codec (`<metadataDir>/graft-seed-pin.json`): which
    * seed surface batch 0 consumed and the per-bucket tail-start
    * offsets it pinned. `kind: none` records a seedless full startup.
    */
  private[streaming] def writeSeedPin(
      seed: Option[(GraftTable.SeedSource, Map[Int, Long])]): String = {
    def offs(m: Map[Int, Long]): JValue = JObject(m.toList.sortBy(_._1)
      .map { case (b, o) => b.toString -> (JInt(o): JValue) })
    JsonMethods.compact(JsonMethods.render(seed match {
      case None => JObject("kind" -> JString("none"))
      case Some((GraftTable.SeedSource.Lake(dir, format), m)) =>
        JObject("kind" -> JString("lake"), "dir" -> JString(dir),
          "format" -> JString(format), "offsets" -> offs(m))
      case Some((GraftTable.SeedSource.Snapshot, m)) =>
        JObject("kind" -> JString("snapshot"), "offsets" -> offs(m))
    }))
  }

  private[streaming] def parseSeedPin(json: String)
      : Option[(GraftTable.SeedSource, Map[Int, Long])] = {
    val obj = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    def str(k: String): String = obj(k).asInstanceOf[JString].s
    def offs: Map[Int, Long] = obj("offsets").asInstanceOf[JObject].obj
      .map { case (k, v) => k.toInt -> v.asInstanceOf[JInt].num.toLong }
      .toMap
    str("kind") match {
      case "none" => None
      case "lake" =>
        Some((GraftTable.SeedSource.Lake(str("dir"), str("format")), offs))
      case "snapshot" => Some((GraftTable.SeedSource.Snapshot, offs))
      case other => throw new IllegalStateException(
        s"corrupt graft-seed-pin.json: unknown kind '$other'")
    }
  }
}

/** Per-bucket next-offset map as the stream offset (FlussSourceOffset
  * analog), serialized as a stable-ordered JSON object. `seedPending`
  * marks a `full`-startup stream whose hybrid seed (lake / KV snapshot)
  * has not been delivered yet: it rides ONLY the initial offset — the
  * first planned batch consumes it, so its end offset (and every later
  * one) serializes without the marker, and a checkpoint replay of that
  * first batch re-reads the seed exactly once.
  *
  * `stamp = (rollbackEpoch, numBuckets)`: the TIMELINE these offsets are
  * coordinates in. `rollback_to_version` physically truncates, so undone
  * offsets are REUSED by later commits; `sys.rebucket` replaces the
  * whole bucket numbering. Either makes a bare offset map silently mean
  * different rows — the checkpoint ABA the DML scans close with
  * epoch-first pinning and derived indexes close with refuse-then-
  * rebuild. Offsets checkpointed before the stamp existed parse to
  * `None` and are accepted once (stamp-on-first-contact: the next
  * planned offset carries one); thereafter any epoch/bucket-count change
  * refuses loudly at batch planning (the reference guards fetches with
  * the tablet leader epoch, fluss-client/.../LogFetcher.java — this is
  * the checkpointed-offset form).
  */
final case class GraftSourceOffset(buckets: Map[Int, Long],
    seedPending: Boolean = false,
    stamp: Option[(Long, Int)] = None) extends V1Offset {
  override val json: String = JsonMethods.compact(JsonMethods.render(
    JObject(
      (if (seedPending) List(GraftSourceOffset.SeedKey -> (JInt(1): JValue))
       else Nil) ++
        stamp.toList.flatMap { case (e, n) => List(
          GraftSourceOffset.EpochKey -> (JInt(e): JValue),
          GraftSourceOffset.NumBucketsKey -> (JInt(n): JValue)) } ++
        buckets.toList.sortBy(_._1)
          .map { case (b, o) => b.toString -> (JInt(o): JValue) })))
}

object GraftSourceOffset {
  /** Reserved JSON key carrying the seed-pending marker (underscore-
    * prefixed keys can never collide with bucket ids).
    */
  private val SeedKey = "_seed"
  private val EpochKey = "_epoch"
  private val NumBucketsKey = "_nb"

  def parse(json: String): Map[Int, Long] = fromJson(json).buckets

  def fromJson(json: String): GraftSourceOffset = {
    val obj = JsonMethods.parse(json).asInstanceOf[JObject].obj
    def longOf(k: String): Option[Long] = obj.collectFirst {
      case (`k`, v: JInt) => v.num.toLong }
    GraftSourceOffset(
      obj.filterNot(_._1.startsWith("_"))
        .map { case (k, v) => k.toInt -> v.asInstanceOf[JInt].num.toLong }
        .toMap,
      obj.exists(_._1 == SeedKey),
      for (e <- longOf(EpochKey); n <- longOf(NumBucketsKey))
        yield (e, n.toInt))
  }

  /** Accept our own offset or any serialized form round-tripped through
    * the checkpoint log.
    */
  def from(o: AnyRef): Map[Int, Long] = offsetOf(o).buckets

  /** Like [[from]] but keeping the seed marker. */
  def offsetOf(o: AnyRef): GraftSourceOffset = o match {
    case g: GraftSourceOffset => g
    case c: ConnectorOffset => fromJson(c.json())
    case other => fromJson(other.toString)
  }
}

/** `format("graft")` registration: a V1 `StreamSourceProvider` — the same
  * architecture Delta Lake streams through. The scan stays in the
  * DataFrame API (distributed, pushdown-friendly); V2's MicroBatchStream
  * would force hand-rolled per-file parquet readers for no semantic gain.
  *
  * The V1/V2 split is narrower than the class names suggest: Spark 4's
  * `Source` IS a `SparkDataStream`, so every V2 streaming capability this
  * source needs rides the unified interfaces directly —
  * `SupportsAdmissionControl.latestOffset(start, limit)` for
  * `maxOffsetsPerTrigger`, `SupportsTriggerAvailableNow` for pinned
  * drain-and-stop, `ReportsSourceMetrics` for native progress-event lag.
  * The only V1-ism left is `getBatch` returning a DataFrame (the
  * micro-batch as an ordinary offset-gated codegen'd parquet scan).
  * `readStream.table(...)` rides the native DSv2 path instead —
  * [[GraftMicroBatchStream]], which DELEGATES its offset semantics to
  * an embedded instance of this class, so the two transports share one
  * definition of startup, admission control, and lag.
  */
final class GraftSourceProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink =
    GraftSink.create(sqlContext, parameters, outputMode)

  private def open(sqlContext: SQLContext, parameters: Map[String, String]): GraftTable = {
    val path = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("path") => v
    }.getOrElse(throw new IllegalArgumentException(
      "the graft source needs a table directory: .format(\"graft\").load(path)"))
    GraftSourceProvider.openTable(sqlContext.sparkSession, path)
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) = {
    val t = open(sqlContext, parameters)
    val dataOnly = parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("stream.data-columns") && v.toBoolean }
    ("graft", if (dataOnly) t.desc.schema else t.logSchema)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new GraftSource(open(sqlContext, parameters), parameters,
      Option(metadataPath).filter(_.nonEmpty))
}

object GraftSourceProvider {
  /** Open a table straight from its directory (the catalog keeps
    * `meta.json` inside the table dir, so no warehouse context is needed).
    */
  def openTable(spark: SparkSession, path: String): GraftTable = {
    // the catalog's streaming fallback hands the table LOCATION as a URI
    // ("file:/wh/db/t", possibly trailing-slashed) — normalize to the
    // plain filesystem path the engine uses everywhere else
    val p0 = if (path.startsWith("file:")) new java.net.URI(path).getPath else path
    val p = if (p0.length > 1 && p0.endsWith("/")) p0.dropRight(1) else p0
    val meta = graft.core.WarehouseIO.readStringIfExists(s"$p/meta.json")
    require(meta.isDefined, s"no graft table at $path (missing meta.json)")
    new GraftTable(p, CatalogJson.read(meta.get), spark)
  }
}
