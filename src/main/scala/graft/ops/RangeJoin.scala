package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Bin-packed range joins — inequality joins Spark plans as a broadcast
  * nested loop (O(n·m) compares, full build-side broadcast), turned into
  * equi-joins on a bucketed domain so they shuffle-partition like any
  * other join and survive 100 TB.
  *
  * The trick (the classic interval-binning range-join optimization): carve
  * the value domain into fixed-width bins; an interval registers in every
  * bin it overlaps, a point in exactly one; a bin-equi join then produces
  * only candidates whose bins collide, and the original range predicate
  * runs as a cheap post-filter. Candidate volume is |pairs within a bin of
  * each other| — data-proportional when `binWidth` is chosen near the
  * typical interval length — instead of |points|×|intervals|. Replication
  * is bounded: an interval of length L lands in at most L/binWidth + 1
  * bins. Optional equi-`keys` ride along in the join condition, and AQE
  * handles bin skew like any other shuffle join.
  *
  * The reference has no range-join operator (its joins are the Flink-side
  * lookup/delta joins, SURVEY §2.3); this is part of the beyond-reference
  * analytics surface, same family as [[AsOfJoin]] — AS OF is the
  * carry-forward special case, these are the general containment and
  * overlap forms.
  */
object RangeJoin {

  /** Bin id of a point value: works for numeric and timestamp columns
    * (timestamps bin on microseconds; pass `binWidth` in micros).
    */
  private def binOf(df: DataFrame, c: String, binWidth: Long): Column = {
    val v = df.schema(c).dataType match {
      case TimestampType => unix_micros(col(c))
      case _             => col(c).cast("long")
    }
    floor(v / lit(binWidth))
  }

  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val collide = a.columns.toSeq.intersect(b.columns.toSeq)
    require(collide.isEmpty, s"column names collide across sides: $collide")
  }

  /** Point-in-interval join: every (point, interval) pair with
    * `start <= point <= end` (and equal `keys`, when given). Inner join;
    * output = point columns ++ interval columns (names must not collide).
    *
    * One shuffle on (bin, keys…); the interval side is exploded to its
    * covered bins first, so pick `binWidth` near the typical interval
    * length — smaller bins mean more interval replicas, larger bins mean
    * more post-filtered candidates.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, binWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireDisjoint(points.drop(keys: _*), intervals.drop(keys: _*))
    val p = points.withColumn("__bin", binOf(points, pointCol, binWidth))
    // end < start yields no bins (empty interval), matching BETWEEN's
    // empty result rather than sequence()'s negative-step error
    val i = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__ibin", explode(sequence(
        binOf(intervals, startCol, binWidth),
        binOf(intervals, endCol, binWidth))))
    val iRenamedKeys = keys.foldLeft(i)((d, k) => d.withColumnRenamed(k, s"__rk_$k"))
    val cond = (col(pointCol) >= col(startCol)) && (col(pointCol) <= col(endCol)) &&
      keys.map(k => col(k) === col(s"__rk_$k"))
        .foldLeft(col("__bin") === col("__ibin"))(_ && _)
    p.join(iRenamedKeys, cond, "inner")
      .drop("__bin", "__ibin").drop(keys.map(k => s"__rk_$k"): _*)
  }

  /** Interval-overlap join: every (a, b) pair whose ranges intersect —
    * `aStart <= bEnd && bStart <= aEnd` (and equal `keys`). Inner join;
    * output = a's columns ++ b's columns.
    *
    * Both sides explode to covered bins; a pair overlapping k shared bins
    * would match k times, so the match is kept only in the FIRST shared
    * bin — `max(bin(aStart), bin(bStart))` — an exact dedup without a
    * distinct (no second shuffle).
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      binWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    requireDisjoint(a.drop(keys: _*), b.drop(keys: _*))
    def binned(df: DataFrame, s: String, e: String, bin: String, sb: String) = df
      .filter(col(e) >= col(s))
      .withColumn(sb, binOf(df, s, binWidth))
      .withColumn(bin, explode(sequence(col(sb), binOf(df, e, binWidth))))
    val aB = binned(a, aStart, aEnd, "__abin", "__asb")
    val bB0 = binned(b, bStart, bEnd, "__bbin", "__bsb")
    val bB = keys.foldLeft(bB0)((d, k) => d.withColumnRenamed(k, s"__rk_$k"))
    val cond = (col(aStart) <= col(bEnd)) && (col(bStart) <= col(aEnd)) &&
      (col("__abin") === greatest(col("__asb"), col("__bsb"))) &&
      keys.map(k => col(k) === col(s"__rk_$k"))
        .foldLeft(col("__abin") === col("__bbin"))(_ && _)
    aB.join(bB, cond, "inner")
      .drop("__abin", "__bbin", "__asb", "__bsb")
      .drop(keys.map(k => s"__rk_$k"): _*)
  }
}
