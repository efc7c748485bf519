package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive `k=v` dir-segment decoding shared by the native DSv2 planners
  * ([[graft.streaming.GraftMicroBatchStream]], the key-grouped batch
  * scan): a dir-encoded partition value → the catalyst value of the
  * column's declared type, with the same session-timezone Cast semantics
  * `spark.read.schema(...)` applies to inferred hive values.
  */
private[graft] object HiveDirValues {

  /** Split a dir-relative file path's `k=v` segments. */
  def kvsOf(rel: String): Map[String, String] =
    rel.split('/').dropRight(1).flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) => Some(k -> v)
        case _ => None
      }
    }.toMap

  /** Hive-unescape one raw dir value (the shared definition every
    * dir-value comparison must use — see the scan-side file pruning).
    */
  def unescape(raw: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(raw)

  /** Raw dir value → catalyst partition value, by declared type. */
  def decode(raw: Option[String], f: StructField, spark: SparkSession): Any = {
    val dec = raw.map(org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.unescapePathName).getOrElse(
      throw new IllegalStateException(
        s"dir has no ${f.name}= segment for partition column ${f.name}"))
    if (dec == "__HIVE_DEFAULT_PARTITION__") null
    else f.dataType match {
      case StringType => UTF8String.fromString(dec)
      case IntegerType => Int.box(dec.toInt)
      case LongType => Long.box(dec.toLong)
      case ShortType => Short.box(dec.toShort)
      case ByteType => Byte.box(dec.toByte)
      case BooleanType => Boolean.box(dec.toBoolean)
      case DateType => Int.box(java.time.LocalDate.parse(dec).toEpochDay.toInt)
      // the long tail (timestamp, decimal, float, ...) takes the same
      // string→type Cast spark.read.schema(...) applies to hive dir
      // values, session timezone semantics included
      case other =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Literal(
            UTF8String.fromString(dec), StringType), other,
          Option(spark.sessionState.conf.sessionLocalTimeZone))
          .eval(InternalRow.empty)
    }
  }
}
