package graft.core

import java.time.{Instant, ZoneId, ZonedDateTime}
import java.time.format.DateTimeFormatter

/** Time granularity for auto-created partitions, with the reference's
  * default per-unit value formats (fluss-common/.../config/ConfigOptions
  * .java:1745-1764: HOUR=yyyyMMddHH, DAY=yyyyMMdd, MONTH=yyyyMM,
  * QUARTER=yyyyQ, YEAR=yyyy).
  */
sealed abstract class AutoPartitionUnit(val defaultFormat: String) {
  def plus(t: ZonedDateTime, n: Int): ZonedDateTime
}
object AutoPartitionUnit {
  case object Hour extends AutoPartitionUnit("yyyyMMddHH") {
    def plus(t: ZonedDateTime, n: Int): ZonedDateTime = t.plusHours(n.toLong)
  }
  case object Day extends AutoPartitionUnit("yyyyMMdd") {
    def plus(t: ZonedDateTime, n: Int): ZonedDateTime = t.plusDays(n.toLong)
  }
  case object Month extends AutoPartitionUnit("yyyyMM") {
    def plus(t: ZonedDateTime, n: Int): ZonedDateTime = t.plusMonths(n.toLong)
  }
  case object Quarter extends AutoPartitionUnit("yyyyQ") {
    def plus(t: ZonedDateTime, n: Int): ZonedDateTime = t.plusMonths(3L * n)
  }
  case object Year extends AutoPartitionUnit("yyyy") {
    def plus(t: ZonedDateTime, n: Int): ZonedDateTime = t.plusYears(n.toLong)
  }
}

/** Auto-partitioning policy — the engine-side analog of the reference's
  * per-table auto-partition options (ConfigOptions.java:1726-1817) driven
  * by a maintenance tick ([[GraftTable.maintainPartitions]], the
  * coordinator's AutoPartitionManager.java:86 periodic task).
  *
  * Each tick pre-creates the partitions for now .. now+numPreCreate-1 time
  * units and expires every partition strictly older than the newest
  * `numToRetain` history units (numToRetain < 0 disables expiry, matching
  * TABLE_AUTO_PARTITION_NUM_RETENTION). `timeFormat` overrides the unit's
  * default pattern; like the reference it must order fields largest→
  * smallest with fixed-width numerics so that lexicographic order on the
  * formatted value equals time order — expiry compares strings.
  *
  * @param key   the time-based partition key driving decisions; required
  *              when the table has multiple partition keys
  *              (TABLE_AUTO_PARTITION_KEY). Pre-create is skipped for
  *              multi-key tables (ConfigOptions.java:1803 forces it to 0).
  */
final case class AutoPartitionPolicy(
    timeUnit: AutoPartitionUnit = AutoPartitionUnit.Day,
    key: Option[String] = None,
    numPreCreate: Int = 2,
    numToRetain: Int = 7,
    timeFormat: Option[String] = None,
    timeZone: ZoneId = ZoneId.of("UTC")) {

  private val formatter: DateTimeFormatter =
    DateTimeFormatter.ofPattern(timeFormat.getOrElse(timeUnit.defaultFormat))

  /** The partition value `offset` time units away from `now` (PartitionUtils
    * .generateAutoPartition's time arithmetic + format).
    */
  def partitionValue(now: Instant, offset: Int): String =
    formatter.format(timeUnit.plus(now.atZone(timeZone), offset))

  /** Oldest retained partition value, or None when expiry is disabled. */
  def retentionCutoff(now: Instant): Option[String] =
    if (numToRetain < 0) None else Some(partitionValue(now, -numToRetain))
}

object AutoPartitionPolicy {

  /** Policy from table properties, under the reference's option names
    * (ConfigOptions.java:1726-1817): `table.auto-partition.enabled`,
    * `.time-unit`, `.num-precreate`, `.num-retention`, `.key`,
    * `.time-zone`. None unless enabled=true — the maintenance tick then
    * skips the table, like AutoPartitionManager does.
    */
  def fromProperties(props: Map[String, String]): Option[AutoPartitionPolicy] = {
    val p = "table.auto-partition."
    if (!props.get(p + "enabled").exists(_.equalsIgnoreCase("true"))) None
    else Some(AutoPartitionPolicy(
      timeUnit = unitOf(props.getOrElse(p + "time-unit", "day")),
      key = props.get(p + "key"),
      numPreCreate = props.get(p + "num-precreate").map(_.toInt).getOrElse(2),
      numToRetain = props.get(p + "num-retention").map(_.toInt).getOrElse(7),
      timeZone = props.get(p + "time-zone").map(ZoneId.of)
        .getOrElse(ZoneId.of("UTC"))))
  }

  def unitOf(s: String): AutoPartitionUnit = s.toLowerCase match {
    case "hour" => AutoPartitionUnit.Hour
    case "day" => AutoPartitionUnit.Day
    case "month" => AutoPartitionUnit.Month
    case "quarter" => AutoPartitionUnit.Quarter
    case "year" => AutoPartitionUnit.Year
    case other => throw new IllegalArgumentException(
      s"unknown time unit '$other' (hour/day/month/quarter/year)")
  }
}
