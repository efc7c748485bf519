package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering key for data skipping.
  *
  * Sorting a rewrite by the interleaved-bit key gives every parquet row
  * group (and, with `maxRecordsPerFile`, every file) a NARROW min/max
  * range on EVERY clustered column simultaneously — so batch-stats
  * skipping (P3) and parquet row-group pruning work for predicates on
  * any clustered dimension, not just a single sort leader. This is the
  * standard lakehouse layout trick (Delta/Iceberg `ZORDER BY` /
  * `sort_order`); at 100 TB it is the difference between scanning one
  * dimension's worth of files and scanning everything for the second
  * predicate column.
  *
  * Everything is plain `Column` arithmetic (codegen'd, no UDF): each
  * column is min/max-scaled to a `bits`-bit integer rank, then the bit
  * planes are interleaved round-robin. Scaling constants come from one
  * tiny aggregate of the input (2 doubles per column to the driver).
  */
object Zorder {

  /** Interleaved z-value over already-scaled non-negative int columns in
    * [0, 2^bits). Bit b of column i lands at output bit `b * k + i`.
    */
  private def interleave(scaled: Seq[Column], bits: Int): Column = {
    val k = scaled.size
    val terms = for {
      b <- 0 until bits
      i <- 0 until k
    } yield shiftleft(
      shiftright(scaled(i), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-value from explicit per-column [min, max] scaling bounds (use
    * [[zvalueFor]] to derive the bounds from the data). Nulls and values
    * at/below min scale to rank 0; values at/above max to 2^bits - 1; a
    * constant column (min == max) contributes nothing.
    */
  def zvalue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size == mins.size && cols.size == maxs.size,
      "one [min,max] per column")
    require(bits > 0 && cols.size * bits <= 62,
      s"k*bits must fit a long: ${cols.size} cols * $bits bits")
    val top = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val span = maxs(i) - mins(i)
      val rank =
        if (span <= 0) lit(0L)
        else least(greatest(
          floor((c.cast("double") - lit(mins(i))) / lit(span) * lit((1L << bits).toDouble))
            .cast("long"), lit(0L)), lit(top))
      coalesce(rank, lit(0L))
    }
    interleave(scaled, bits)
  }

  /** Z-value with scaling bounds computed from `df` (one aggregate job;
    * 2 doubles per column reach the driver).
    */
  def zvalueFor(df: DataFrame, colNames: Seq[String], bits: Int = 16): Column = {
    require(colNames.nonEmpty, "zorder needs at least one column")
    val aggs = colNames.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = colNames.indices.map(i =>
      if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i))
    val maxs = colNames.indices.map(i =>
      if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1))
    zvalue(colNames.map(col), mins, maxs, bits)
  }
}
