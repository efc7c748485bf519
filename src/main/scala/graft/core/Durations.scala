package graft.core

/** Duration-string parsing shared by procedures and property-driven
  * policies — '7d' / '12h' / '30m' / '45s' / plain milliseconds → millis
  * (the reference's Duration-typed options, e.g. `table.log.ttl` and
  * `table.datalake.freshness`, ConfigOptions.java:1814,1866).
  */
object Durations {

  def parseMillis(s: String): Long = {
    val t = s.trim.toLowerCase
    require(t.nonEmpty, "empty duration")
    val (num, unit) = t.last match {
      case 'd' => (t.dropRight(1), 86400000L)
      case 'h' => (t.dropRight(1), 3600000L)
      case 'm' => (t.dropRight(1), 60000L)
      case 's' => (t.dropRight(1), 1000L)
      case _ => (t, 1L)
    }
    val n = try num.trim.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"bad duration '$s' (expected <n>[d|h|m|s] or milliseconds)")
    }
    require(n >= 0, s"duration '$s' must be non-negative")
    n * unit
  }
}
