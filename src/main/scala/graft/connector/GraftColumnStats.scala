package graft.connector

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.colstats.ColumnStatistics

import graft.core.GraftTable

/** [[graft.core.FooterStats]] → the DSv2 `Statistics.columnStats()` map.
  * Spark's `transformV2Stats` feeds min/max verbatim into catalyst
  * `ColumnStat`, so values must be catalyst-internal — which footer
  * int/long stats already are (see FooterStats' coverage note).
  */
private[connector] object GraftColumnStats {

  def of(table: GraftTable)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val m = new java.util.HashMap[NamedReference, ColumnStatistics]()
    table.columnPlannerStats().foreach { case (name, cs) =>
      // NDV bound — footers carry none, but FilterEstimation requires a
      // distinctCount before it ranges over min/max at all. min(value
      // span, non-null rows) is the tight sound upper bound for the
      // integral types FooterStats covers (exact for dense surrogate
      // keys, the join-key shape that matters)
      val span: Long = (cs.min, cs.max) match {
        case (mn: java.lang.Integer, mx: java.lang.Integer) =>
          mx.longValue - mn.longValue + 1L
        case (mn: java.lang.Long, mx: java.lang.Long) =>
          val d = mx - mn // overflow -> negative -> fall back to rows
          if (d < 0 || d == Long.MaxValue) Long.MaxValue else d + 1L
        case _ => Long.MaxValue
      }
      val ndv = math.max(1L, math.min(span, cs.nonNullCount))
      m.put(Expressions.column(name), new ColumnStatistics {
        override def min(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(cs.min.asInstanceOf[Object])
        override def max(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(cs.max.asInstanceOf[Object])
        override def nullCount(): java.util.OptionalLong =
          java.util.OptionalLong.of(cs.nullCount)
        override def distinctCount(): java.util.OptionalLong =
          java.util.OptionalLong.of(ndv)
      })
    }
    m
  }
}
