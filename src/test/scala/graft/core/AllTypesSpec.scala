package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** §1.2 type-system coverage (FIXTURES.md t_types; mirrors the reference's
  * SparkLogTableReadTest "all data types" + nested-types tables): every
  * supported type roundtrips through the log format, and through the PK
  * merge path. TIME maps to int millis-of-day (no Spark TIME type);
  * CHAR(n) maps to STRING.
  */
class AllTypesSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("flag", BooleanType),
    StructField("tiny", ByteType),
    StructField("small", ShortType),
    StructField("big", LongType),
    StructField("real", FloatType),
    StructField("amount", DoubleType),
    StructField("name", StringType),
    StructField("blob", BinaryType),
    StructField("decimal_val", DecimalType(10, 2)),
    StructField("date_val", DateType),
    StructField("ts_ltz", TimestampType),
    StructField("ts_ntz", TimestampNTZType),
    StructField("time_millis", IntegerType), // fluss TIME(p)
    StructField("arr", ArrayType(IntegerType)),
    StructField("m", MapType(StringType, IntegerType)),
    StructField("rec", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def rows(v: Int): Seq[Row] = Seq(
    Row(1, true, 1.toByte, 2.toShort, 3L, 1.5f, 2.5, s"s$v",
      Array[Byte](1, 2, 3), new java.math.BigDecimal(s"$v.25"),
      java.sql.Date.valueOf("2024-01-15"),
      java.sql.Timestamp.valueOf(s"2024-01-15 10:00:0$v"),
      java.time.LocalDateTime.of(2024, 1, 15, 10, 0, v),
      36000000 + v, Seq(v, v + 1), Map("k" -> v), Row(v, s"n$v")),
    Row(2, null, null, null, null, null, null, null,
      null, null, null, null, null, null, null, null, null))

  private lazy val cat =
    new Catalog(Files.createTempDirectory("graft-types").toString, spark)

  /** Structural comparison: byte arrays by content, Seq variants unified. */
  private def canon(rs: Seq[Row]): Seq[Seq[String]] =
    rs.map(_.toSeq.map {
      case b: Array[Byte] => b.toList.toString
      case s: scala.collection.Seq[_] => s.toList.toString
      case x => String.valueOf(x)
    }).sortBy(_.mkString("|"))

  private def assertTypedRows(got: Seq[Row], exp: Seq[Row]): Unit =
    assert(canon(got) == canon(exp))

  test("log table: all types roundtrip through append -> scan") {
    val t = cat.createTable("types", "log_" + System.nanoTime(),
      TableDescriptor(schema, bucketKeys = Seq("id"), numBuckets = 2))
    val df = spark.createDataFrame(rows(1).asJava, schema)
    t.append(df, orderBy = Seq(df("id")))
    assertTypedRows(t.scan().collect().toSeq, rows(1))
  }

  test("PK table: all types survive the merge path; LWW keeps v2") {
    val t = cat.createTable("types", "pk_" + System.nanoTime(),
      TableDescriptor(schema, primaryKey = Seq("id"), numBuckets = 2))
    val df1 = spark.createDataFrame(rows(1).asJava, schema)
    t.upsert(df1, orderBy = Seq(lit(1)))
    val df2 = spark.createDataFrame(rows(2).asJava, schema)
    t.upsert(df2, orderBy = Seq(lit(2)))
    assertTypedRows(t.scan().collect().toSeq, rows(2))
    // changelog carries full before/after images for the nested types too
    val bl = t.binlog().filter(col("_change_type") === ChangeType.UpdateAfter)
    assert(bl.select(col("before.rec.b"), col("after.rec.b"))
      .collect().toSeq.contains(Row("n1", "n2")))
  }
}
