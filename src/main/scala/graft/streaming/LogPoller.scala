package graft.streaming


import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.core.{CatalogJson, GraftTable}

/** Poll-based log consumer — the reference's client scanner surface
  * (LogScannerImpl.java:55: `subscribe(bucket, offset)` + `poll()`), with
  * named, durably committed positions (the offsets a Flink source would
  * keep in checkpoint state, FlussSourceOffset; materialized here as a
  * consumer-group file so independent processes resume where the group
  * left off).
  *
  * Contract: [[poll]] returns every record in `[position, latest)` per
  * bucket and advances the in-memory position to `latest`; [[commit]]
  * makes the current position durable; a NEW poller for the same group
  * resumes from the committed position (or the startup mode when the
  * group has never committed). Positions move only forward via poll —
  * [[seek]] rewinds/skips explicitly, exactly like the reference's
  * per-bucket subscribe offsets.
  *
  * Scale posture: a poll is one manifest read (≤numBuckets entries)
  * plus a lazily-planned offset-gated scan — the offset gates make the
  * returned frame immutable under later commits, so callers can process
  * it whenever they like. Nothing data-scale touches the driver, and
  * bucket subscription prunes the scan to the subscribed buckets'
  * partition directories.
  */
final class LogPoller(table: GraftTable, group: String,
    mode: GraftStream.StartupMode = GraftStream.StartupMode.Earliest,
    buckets: Option[Set[Int]] = None,
    maxPollRecords: Option[Long] = None) {

  maxPollRecords.foreach(n =>
    require(n > 0, s"max-poll-records $n must be positive"))

  private val offsetsFile =
    s"${table.path}/_consumer_offsets/$group.json"

  private def sub(m: Map[Int, Long]): Map[Int, Long] =
    buckets.map(bs => m.filter { case (b, _) => bs.contains(b) }).getOrElse(m)

  /** The timeline the group's offsets are coordinates in — same pin as
    * the streaming checkpoint ([[GraftSourceOffset]] scaladoc): rollback
    * REUSES undone offsets, rebucket replaces the bucket numbering, and
    * a bare (bucket → offset) map survives both meaning different rows.
    */
  private def tableStamp: (Long, Int) =
    (table.rollbackEpoch, table.currentHandle().desc.numBuckets)

  private def refuseStamp(stored: (Long, Int), now: (Long, Int)): Nothing =
    throw new IllegalStateException(
      s"group '$group' committed its position under (rollbackEpoch=" +
        s"${stored._1}, numBuckets=${stored._2}) but ${table.path} is " +
        s"now at (rollbackEpoch=${now._1}, numBuckets=${now._2}) — a " +
        "rollback_to_version/undo or sys.rebucket re-made what these " +
        "offsets mean, so resuming would deliver wrong rows; seek() to " +
        "an explicit position or restart the group from scratch")

  // pinned at first resolution; committed groups restore their stamp and
  // refuse up front when the table moved timelines while they were down.
  // Pre-stamp (legacy) group files restore with the CURRENT stamp —
  // stamp-on-first-contact, refusal starts at the next detected change.
  private var pinnedStamp: (Long, Int) = {
    val now = tableStamp
    LogPoller.committedStamp(table, group).foreach { stored =>
      if (stored != now) refuseStamp(stored, now)
    }
    now
  }

  private var pos: Map[Int, Long] = committed.map(sub).getOrElse(sub(mode match {
    // Earliest = first RETAINED offset (post-vacuum, the log start moved)
    case GraftStream.StartupMode.Earliest =>
      table.retainedFloorOffsets.getOrElse(Map.empty)
    case GraftStream.StartupMode.Latest => table.latestOffsets
    case GraftStream.StartupMode.Timestamp(ms) =>
      table.offsetsForTimestamp(new java.sql.Timestamp(ms))
    case GraftStream.StartupMode.FromVersion(v) => table.offsetsAtVersion(v)
    // a poller is an offset-range consumer with no batch to carry a seed
    // in: full-mode cold starts belong to the streaming source
    case GraftStream.StartupMode.Full => throw new IllegalArgumentException(
      "LogPoller cannot deliver a full-startup seed; poll from Earliest " +
        "or stream with scan.startup.mode=full instead")
  }))

  /** Per-bucket next offset this poller will read from. */
  def position: Map[Int, Long] = pos

  /** The group's durably committed position, if it ever committed. */
  def committed: Option[Map[Int, Long]] =
    LogPoller.committedOffsets(table, group)

  /** Explicit reposition (LogScanner.subscribe with an offset) — also
    * re-pins the timeline stamp: a seek is the caller ASSERTING a
    * position in the table as it is now (it is the documented recovery
    * from a stamp refusal).
    */
  def seek(offsets: Map[Int, Long]): Unit = {
    pos = sub(offsets)
    pinnedStamp = tableStamp
  }

  /** All records committed since the last poll: `[position, latest)` per
    * subscribed bucket, with system columns (the ScanRecord view). The
    * in-memory position advances to the polled bound immediately; call
    * [[commit]] to make it durable for the group.
    *
    * With `maxPollRecords` set (the reference's
    * `client.scanner.log.max-poll-records` admission control), a poll
    * returns at most that many records: the quota is dealt to lagging
    * buckets in ascending bucket order — offsets are per-bucket
    * contiguous, so `min(lag, quota)` IS the record count, no data read
    * needed to plan the cut — and the position only advances to the
    * capped bound, so the next poll resumes exactly where this one
    * stopped.
    */
  def poll(): DataFrame = {
    // timeline pin FIRST (a live poller across a rollback/rebucket has
    // the same ABA as a restored group — and a rollback can leave the
    // vacuum floor satisfied while the offsets mean different rows)
    val now = tableStamp
    if (now != pinnedStamp) refuseStamp(pinnedStamp, now)
    // OFFSET_OUT_OF_RANGE (the reference's fetch error for a position
    // below the log start): a vacuum may have purged records this group
    // never consumed — failing loudly beats silently skipping them.
    table.retainedFloorOffsets.map(sub).foreach { floor =>
      val behind = floor.filter { case (b, f) => pos.getOrElse(b, 0L) < f }
      if (behind.nonEmpty) throw new IllegalStateException(
        s"group '$group' position $pos is below the retained log start " +
          s"$behind (log vacuumed); records in between are gone — " +
          "seek() past the floor or rebuild from the table snapshot")
    }
    val latest = sub(table.latestOffsets)
    val target = maxPollRecords match {
      case None => latest
      case Some(cap) =>
        var remaining = cap
        latest.toSeq.sortBy(_._1).map { case (b, l) =>
          val p = pos.getOrElse(b, 0L)
          val take = math.min(math.max(0L, l - p), remaining)
          remaining -= take
          b -> (p + take)
        }.toMap
    }
    val batch = table.scanRange(pos, target)
    pos = target
    batch
  }

  /** Durably commit the current position for the group (atomic rename,
    * same discipline as the table manifest).
    */
  def commit(): Unit = {
    graft.core.WarehouseIO.mkdirs(s"${table.path}/_consumer_offsets")
    CatalogJson.atomicWrite(offsetsFile,
      JsonMethods.compact(JsonMethods.render(JObject(
        List(LogPoller.EpochKey -> (JInt(pinnedStamp._1): JValue),
          LogPoller.NumBucketsKey -> (JInt(pinnedStamp._2): JValue)) ++
        pos.toList.sortBy(_._1).map { case (k, v) => k.toString -> (JInt(v): JValue) }))))
  }
}

object LogPoller {

  // reserved keys in the group file (underscore-prefixed keys can never
  // collide with bucket ids): the (rollbackEpoch, numBuckets) the
  // committed offsets are coordinates in
  private val EpochKey = "_epoch"
  private val NumBucketsKey = "_nb"

  /** Consumer groups with a durably committed position on `table` (the
    * Kafka-admin listConsumerGroups analog for the poll surface) — one
    * directory listing, names only.
    */
  def listGroups(table: graft.core.GraftTable): Seq[String] =
    graft.core.WarehouseIO.listDir(s"${table.path}/_consumer_offsets")
      .filter(e => !e.isDir && e.name.endsWith(".json"))
      .map(_.name.stripSuffix(".json")).sorted

  private def groupFields(table: graft.core.GraftTable,
      group: String): Option[List[(String, org.json4s.JValue)]] =
    graft.core.WarehouseIO.readStringIfExists(
        s"${table.path}/_consumer_offsets/$group.json")
      .map(posJson => org.json4s.jackson.JsonMethods.parse(posJson)
        .asInstanceOf[org.json4s.JObject].obj)

  /** The committed per-bucket position of one group, if it ever
    * committed (offset-admin surface; a poller resumes from this).
    */
  def committedOffsets(table: graft.core.GraftTable,
      group: String): Option[Map[Int, Long]] =
    groupFields(table, group).map(_.filterNot(_._1.startsWith("_"))
      .map { case (k, v) =>
        k.toInt -> v.asInstanceOf[org.json4s.JInt].num.toLong }.toMap)

  /** The (rollbackEpoch, numBuckets) stamp of a group's committed
    * position; `None` for a never-committed group or a pre-stamp file.
    */
  private[streaming] def committedStamp(table: graft.core.GraftTable,
      group: String): Option[(Long, Int)] =
    groupFields(table, group).flatMap { obj =>
      def longOf(k: String): Option[Long] = obj.collectFirst {
        case (`k`, v: org.json4s.JInt) => v.num.toLong }
      for (e <- longOf(EpochKey); n <- longOf(NumBucketsKey))
        yield (e, n.toInt)
    }
}
