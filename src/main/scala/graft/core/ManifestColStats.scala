package graft.core

import java.util.Base64

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s.{JBool, JInt, JObject, JString, JValue}

/** Column statistics persisted in the COMMIT MANIFEST (`_offsets.json`),
  * maintained incrementally at write time — so plan-time CBO stats are
  * one manifest read at ANY table size, where the footer sweep
  * ([[FooterStats]]) must cap at [[FooterStats.MaxFiles]] files and goes
  * dark exactly in the 100 TB regime the stats matter most for. The
  * reference collects the analogous per-batch statistics at write time
  * (fluss-common/.../record/LogRecordBatchFormat.java:142-145), as do
  * the lake formats this engine exports to (Iceberg manifest column
  * bounds, [[IcebergExport]]).
  *
  * Mechanics: every commit's write job carries an `observe()` with
  * per-column min/max (catalyst-internal longs), null/non-null counts
  * and an HLL sketch (`hll_sketch_agg`, the Datasketches HLL Spark
  * bundles) — ZERO extra passes over the data and zero extra IO. The
  * publish step merges that commit's entry into the persisted blob
  * (min of mins / max of maxes / count sums / HLL union) under the
  * commit lock, atomically with the offsets.
  *
  * Soundness: the blob is a MONOTONE OVER-APPROXIMATION of everything
  * ever committed. Row-removing operations (TTL, vacuum, rollback,
  * DELETE) keep it an over-approximation of the live state — sound for
  * estimates (bounds contain all live values; NDV and counts may
  * overcount on heavily-overwritten PK tables, documented like the
  * footer path's snapshot∪log posture). The `complete` flag is the
  * under-approximation guard: it is true only when accumulation started
  * from an EMPTY table (or an [[GraftTable.analyzeColumnStats]] rebuild)
  * and no commit since has skipped stats — an incomplete blob is never
  * served, the footer sweep remains the fallback for pre-existing
  * tables.
  *
  * Column coverage: int/long/date/timestamp get min/max + NDV (their
  * observed min/max ARE catalyst-internal via unix_date/unix_micros);
  * strings get NDV + null counts only (estimation never ranges over
  * them, but join estimation uses their distinct counts);
  * float/double are excluded for the same NaN-ordering reason as
  * [[FooterStats]].
  */
object ManifestColStats {

  /** One column's accumulated stats. `min`/`max` are catalyst-internal
    * longs (days for DATE, micros for TIMESTAMP), absent for NDV-only
    * (string) columns; `hll` is a serialized Datasketches HLL sketch.
    */
  final case class Entry(min: Option[Long], max: Option[Long],
      nullCount: Long, nonNullCount: Long, hll: Option[Array[Byte]]) {

    def merge(o: Entry): Entry = Entry(
      (min.toSeq ++ o.min.toSeq).reduceOption(math.min(_: Long, _: Long)),
      (max.toSeq ++ o.max.toSeq).reduceOption(math.max(_: Long, _: Long)),
      nullCount + o.nullCount, nonNullCount + o.nonNullCount,
      unionHll(hll, o.hll))

    def ndv: Option[Long] = hll.map(estimate)
  }

  final case class Blob(complete: Boolean, cols: Map[String, Entry]) {
    def merge(commit: Map[String, Entry]): Blob = Blob(complete,
      commit.foldLeft(cols) { case (acc, (c, e)) =>
        acc.updated(c, acc.get(c).map(_.merge(e)).getOrElse(e))
      })
  }

  val Incomplete: Blob = Blob(complete = false, Map.empty)

  /** Matches Spark's `hll_sketch_agg` default lgConfigK: ±~1.6% NDV
    * error at ~2.5 KB saturated per column — manifest-resident scale.
    */
  val LgK = 12

  private def estimate(bytes: Array[Byte]): Long =
    math.round(org.apache.datasketches.hll.HllSketch
      .heapify(org.apache.datasketches.memory.Memory.wrap(bytes))
      .getEstimate)

  private def unionHll(a: Option[Array[Byte]],
      b: Option[Array[Byte]]): Option[Array[Byte]] = (a, b) match {
    case (Some(x), Some(y)) =>
      val u = new org.apache.datasketches.hll.Union(LgK)
      u.update(org.apache.datasketches.hll.HllSketch
        .heapify(org.apache.datasketches.memory.Memory.wrap(x)))
      u.update(org.apache.datasketches.hll.HllSketch
        .heapify(org.apache.datasketches.memory.Memory.wrap(y)))
      Some(u.getResult(org.apache.datasketches.hll.TgtHllType.HLL_4)
        .toCompactByteArray)
    case _ => a.orElse(b)
  }

  // ----- which columns, and how each observes ---------------------------

  /** (column, internal-long projection or None) for every stats-bearing
    * column: Some(expr) = ranged types (min/max + NDV), None = NDV-only
    * (strings). Partition keys are dir-encoded and excluded — their
    * exact stats come from [[GraftTable.partitionKeyStats]].
    */
  private[core] def sketchable(schema: StructType,
      partitionKeys: Seq[String]): Seq[(String, Option[Column])] =
    schema.fields.toSeq
      .filterNot(f => partitionKeys.contains(f.name))
      .flatMap { f =>
        f.dataType match {
          case IntegerType | LongType =>
            Some(f.name -> Some(col(f.name).cast(LongType)))
          case DateType => Some(f.name -> Some(unix_date(col(f.name))
            .cast(LongType)))
          case TimestampType => Some(f.name -> Some(unix_micros(col(f.name))))
          case StringType => Some(f.name -> None)
          case _ => None
        }
      }

  /** Attach the stats observation to a commit's write DataFrame. Returns
    * the instrumented frame and a fetch that — called AFTER the write
    * job completes — yields this commit's per-column entries (None when
    * nothing is sketchable or retrieval failed; the caller then marks
    * the blob incomplete rather than failing the commit).
    */
  def observe(df: DataFrame, schema: StructType,
      partitionKeys: Seq[String])
      : (DataFrame, () => Option[Map[String, Entry]]) = {
    val cols = sketchable(schema, partitionKeys)
    if (cols.isEmpty) return (df, () => Some(Map.empty))
    val obs = Observation()
    val exprs: Seq[Column] = cols.flatMap { case (c, ranged) =>
      val sketchIn = ranged.getOrElse(col(c))
      Seq(
        hll_sketch_agg(sketchIn, lit(LgK)).as(s"__hll:$c"),
        count(col(c)).as(s"__nn:$c"),
        count(when(col(c).isNull, 1)).as(s"__nc:$c")) ++
        ranged.toSeq.flatMap(e =>
          Seq(min(e).as(s"__mn:$c"), max(e).as(s"__mx:$c")))
    }
    val instrumented = df.observe(obs, exprs.head, exprs.tail: _*)
    val fetch = () => try {
      val row = obs.get
      Some(cols.map { case (c, ranged) =>
        val hll = Option(row(s"__hll:$c")).map(_.asInstanceOf[Array[Byte]])
        val mn = if (ranged.isDefined)
          Option(row.getOrElse(s"__mn:$c", null)).map(toLong) else None
        val mx = if (ranged.isDefined)
          Option(row.getOrElse(s"__mx:$c", null)).map(toLong) else None
        c -> Entry(mn, mx, row(s"__nc:$c").asInstanceOf[Long],
          row(s"__nn:$c").asInstanceOf[Long], hll)
      }.toMap)
    } catch { case scala.util.control.NonFatal(_) => None }
    (instrumented, fetch)
  }

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.longValue
    case other => other.toString.toLong
  }

  /** The blob's entries as plan-time [[FooterStats.ColStats]] (catalyst-
    * internal min/max per the declared type, measured NDV from the
    * sketch). NDV-only entries surface with null bounds — Spark's
    * `ColumnStatistics` treats every field as optional.
    */
  def toColStats(blob: Blob,
      schema: StructType): Map[String, FooterStats.ColStats] =
    blob.cols.flatMap { case (name, e) =>
      schema.fields.find(_.name == name).flatMap { f =>
        def boxed(l: Long): Any = f.dataType match {
          case IntegerType | DateType => Int.box(l.toInt)
          case LongType | TimestampType => Long.box(l)
          case _ => null
        }
        f.dataType match {
          case IntegerType | LongType | DateType | TimestampType =>
            Some(name -> FooterStats.ColStats(
              e.min.map(boxed).orNull, e.max.map(boxed).orNull,
              e.nullCount, e.nonNullCount, e.ndv))
          case StringType => Some(name -> FooterStats.ColStats(
            null, null, e.nullCount, e.nonNullCount, e.ndv))
          case _ => None
        }
      }
    }

  // ----- manifest JSON ---------------------------------------------------

  def toJson(blob: Blob): JValue = JObject(List(
    "complete" -> (JBool(blob.complete): JValue),
    "cols" -> (JObject(blob.cols.toList.sortBy(_._1).map { case (c, e) =>
      c -> (JObject(
        e.min.map(v => "mn" -> (JInt(v): JValue)).toList ++
          e.max.map(v => "mx" -> (JInt(v): JValue)).toList ++ List(
          "nc" -> (JInt(e.nullCount): JValue),
          "nn" -> (JInt(e.nonNullCount): JValue)) ++
          e.hll.map(b => "hll" ->
            (JString(Base64.getEncoder.encodeToString(b)): JValue)).toList
      ): JValue)
    }): JValue)))

  def fromJson(j: JValue): Blob = {
    val fields = j.asInstanceOf[JObject].obj.toMap
    val complete = fields.get("complete").collect {
      case JBool(b) => b }.getOrElse(false)
    val cols = fields.get("cols").collect { case o: JObject =>
      o.obj.map { case (c, ev) =>
        val e = ev.asInstanceOf[JObject].obj.toMap
        def long(k: String): Option[Long] =
          e.get(k).collect { case JInt(n) => n.toLong }
        c -> Entry(long("mn"), long("mx"),
          long("nc").getOrElse(0L), long("nn").getOrElse(0L),
          e.get("hll").collect { case JString(s) =>
            Base64.getDecoder.decode(s) })
      }.toMap
    }.getOrElse(Map.empty)
    Blob(complete, cols)
  }
}
