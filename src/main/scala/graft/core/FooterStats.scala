package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.types._

/** Per-column planner statistics from parquet FOOTERS — min/max/null
  * counts the DSv2 scans report through `Statistics.columnStats()` so
  * Spark's CBO can estimate FILTER selectivity at plan time (a selective
  * predicate on a graft dimension then flips its join to broadcast in
  * the initial plan, not AQE-late after the first map stage — the
  * reference serves the analogous role through its lake formats' file
  * statistics, e.g. the Iceberg column bounds [[IcebergExport]] writes).
  *
  * Planning-latency posture: DRIVER-side footer reads, never a Spark
  * job (`estimateStatistics` runs inside every optimization pass, EXPLAIN
  * included), capped at [[MaxFiles]] visible files — past that the table
  * is big enough that row count + size already steer CBO, and reading
  * thousands of footers per plan would not be flat. Results cache per
  * (table, manifest mtime, snapshot mtime): one footer sweep per table
  * STATE, not per query.
  *
  * Column coverage: int/long/date/timestamp only. Their footer min/max
  * ARE the catalyst-internal values (INT32 days for dates, INT64 micros
  * for timestamps), so they feed `ColumnStat` verbatim; float/double are
  * excluded for the same NaN-ordering reason as
  * [[GraftTable.fastMinMax]], strings because estimation never ranges
  * over them. PK tables report file-level bounds over snapshot ∪ log —
  * an over-approximation (overwritten rows widen the range), which is
  * sound for ESTIMATES (never for results).
  */
private[graft] object FooterStats {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `min`/`max` are catalyst-internal values (or null when unknown —
    * NDV-only entries for string columns); `ndv` is a MEASURED distinct
    * count (manifest HLL sketch, [[ManifestColStats]]) — absent for
    * footer-swept stats, where the consumer derives a span bound instead.
    */
  final case class ColStats(min: Any, max: Any, nullCount: Long,
      nonNullCount: Long, ndv: Option[Long] = None)

  val MaxFiles = 64

  /** Footer files opened by [[collect]], cumulative — observability for
    * the plan-time contract that manifest-persisted stats
    * ([[ManifestColStats]]) make planning footer-free (CboStatsSpec
    * asserts this stays flat across plans of a stats-armed table).
    */
  val filesOpened = new java.util.concurrent.atomic.AtomicLong(0L)

  // (table path, manifest (mtime,len), snapshot (mtime,len)) -> stats;
  // bounded — a long-lived session over many temp tables must not grow it
  private val cache = new ConcurrentHashMap[
    (String, (Long, Long), (Long, Long)), Map[String, ColStats]]()

  def cached(key: (String, (Long, Long), (Long, Long)))(
      compute: => Map[String, ColStats]): Map[String, ColStats] = {
    if (cache.size > 512) cache.clear()
    cache.computeIfAbsent(key, _ => compute)
  }

  /** Columns whose footer stats are estimation-usable, with their
    * declared types.
    */
  def statableColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType == IntegerType || f.dataType == LongType ||
        f.dataType == DateType || f.dataType == TimestampType => f.name
    }.toIndexedSeq

  /** One driver-side footer sweep: per requested column, (min, max,
    * nullCount) across every row group of every file, or absent when any
    * non-empty chunk lacks stats for it. Files listing columns only in
    * some files (schema evolution, dir-encoded elsewhere) still
    * contribute what they have — bounds stay over-approximate, never
    * under.
    */
  def collect(files: Seq[String],
      columns: Seq[String]): Map[String, ColStats] = {
    var currentFile: String = "" // names the culprit in the WARN below
    try {
    if (files.isEmpty || columns.isEmpty) return Map.empty
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import scala.jdk.CollectionConverters._
    val wanted = columns.toSet
    // per column: (min, max, nulls, nonNulls, statsComplete)
    val acc = scala.collection.mutable.HashMap
      .empty[String, (Any, Any, Long, Long, Boolean)]
    // the SESSION's conf, not a bare Configuration: footer reads must see
    // the same fs.* bindings (credentials, scheme registrations) as every
    // other metadata read or a remote warehouse fails at plan time
    val conf = WarehouseIO.hadoopConf
    files.foreach { f =>
      currentFile = f
      filesOpened.incrementAndGet()
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(f), conf))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        block.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          if (wanted(name)) {
            val st = c.getStatistics
            val prev = acc.getOrElse(name, (null, null, 0L, 0L, true))
            val allNull = st != null && !st.hasNonNullValue &&
              st.isNumNullsSet && st.getNumNulls == c.getValueCount
            if (allNull)
              acc(name) = (prev._1, prev._2,
                prev._3 + st.getNumNulls, prev._4, prev._5)
            else if (st == null || !st.hasNonNullValue || !st.isNumNullsSet)
              acc(name) = (prev._1, prev._2, prev._3, prev._4, false)
            else c.getPrimitiveType.getPrimitiveTypeName match {
              case INT32 | INT64 =>
                val (mn, mx) = (st.genericGetMin, st.genericGetMax)
                def lt(a: Any, b: Any): Boolean =
                  a.asInstanceOf[Comparable[Any]].compareTo(b) < 0
                acc(name) = (
                  if (prev._1 == null || lt(mn, prev._1)) mn else prev._1,
                  if (prev._2 == null || lt(prev._2, mx)) mx else prev._2,
                  prev._3 + st.getNumNulls,
                  prev._4 + (c.getValueCount - st.getNumNulls), prev._5)
              case _ =>
                acc(name) = (prev._1, prev._2, prev._3, prev._4, false)
            }
          }
        }
      } finally reader.close()
    }
    acc.collect { case (name, (mn, mx, nulls, nonNulls, true))
        if mn != null =>
      name -> ColStats(mn, mx, nulls, nonNulls)
    }.toMap
  } catch {
    // stats are ESTIMATES — an unreadable footer (permissions, a
    // concurrent vacuum, a flaky store) must degrade to "no column
    // stats", never fail the planning pass that asked for them. The
    // degradation is LOUD (a silently stats-less CBO plan is
    // undebuggable) and deliberately drops EVERY column, not just the
    // failing file's contribution: min/max missing one file's range
    // would be an UNDER-approximation, and the consumer's span gate
    // assumes bounds that cover all visible rows.
    case scala.util.control.NonFatal(e) =>
      log.warn(s"footer stats sweep failed at '$currentFile' — CBO " +
        s"column stats dropped for this table state: " +
        s"${e.getClass.getName}: ${e.getMessage}")
      Map.empty
    }
  }
}
