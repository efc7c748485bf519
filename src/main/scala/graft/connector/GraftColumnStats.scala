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

  /** A span-derived NDV bound is only CREDIBLE when the value range is
    * within this factor of the row count — a wide-span low-cardinality
    * column (an int status spanning 0..500 with 3 values, a timestamp)
    * would otherwise overestimate NDV by orders of magnitude, making
    * equality-filter selectivity underestimate and a large filtered side
    * wrongly plan as broadcast. Key columns (PK / bucket keys) are exempt:
    * dense surrogate keys are exactly the shape the bound is tight for.
    *
    * Documented cost of the gate: FilterEstimation only ranges over
    * min/max when a distinctCount is present, so a non-key wide-span
    * column that fails the gate (typically a TIMESTAMP on a table whose
    * manifest blob is incomplete — footer-swept stats carry no HLL NDV)
    * loses RANGE-predicate selectivity estimation too, not just
    * equality. That is the chosen trade — a confident wrong equality
    * estimate flips joins to broadcast, while default range selectivity
    * merely under-prunes — and the escape hatch is measured NDV:
    * `CALL sys.analyze_column_stats(...)` (or any write on a
    * stats-armed table) re-arms the manifest sketch, after which
    * `cs.ndv` is present and the gate never fires.
    */
  private val SpanCredibilityFactor = 8L

  def of(table: GraftTable)
      : java.util.Map[NamedReference, ColumnStatistics] = {
    val keyCols =
      (table.desc.primaryKey ++ table.desc.effectiveBucketKeys).toSet
    val m = new java.util.HashMap[NamedReference, ColumnStatistics]()
    table.columnPlannerStats().foreach { case (name, cs) =>
      // NDV — sketch-measured when the manifest carries one
      // ([[graft.core.ManifestColStats]]); otherwise the span bound
      // min(value span, non-null rows), reported only when credibly
      // tight (FilterEstimation requires a distinctCount before it
      // ranges over min/max at all, so omitting it falls back to
      // default selectivity — better than a confident wrong estimate)
      val span: Long = (cs.min, cs.max) match {
        case (mn: java.lang.Integer, mx: java.lang.Integer) =>
          mx.longValue - mn.longValue + 1L
        case (mn: java.lang.Long, mx: java.lang.Long) =>
          val d = mx - mn // overflow -> negative -> fall back to rows
          if (d < 0 || d == Long.MaxValue) Long.MaxValue else d + 1L
        case _ => Long.MaxValue
      }
      val spanCredible = keyCols.contains(name) ||
        span / SpanCredibilityFactor <= cs.nonNullCount
      val ndv: Option[Long] = cs.ndv
        .orElse(if (spanCredible)
          Some(math.max(1L, math.min(span, cs.nonNullCount))) else None)
      m.put(Expressions.column(name), new ColumnStatistics {
        override def min(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(cs.min.asInstanceOf[Object])
        override def max(): java.util.Optional[Object] =
          java.util.Optional.ofNullable(cs.max.asInstanceOf[Object])
        override def nullCount(): java.util.OptionalLong =
          java.util.OptionalLong.of(cs.nullCount)
        override def distinctCount(): java.util.OptionalLong =
          ndv.map(java.util.OptionalLong.of)
            .getOrElse(java.util.OptionalLong.empty())
      })
    }
    m
  }
}
