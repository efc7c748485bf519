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

  test("CHAR(n): write-time length check rejects over-length values") {
    // char/varchar columns analyze to STRING + raw-type metadata; the
    // descriptor derives the length constraint from that metadata
    val md = new MetadataBuilder()
      .putString("__CHAR_VARCHAR_TYPE_STRING", "char(3)").build()
    val vmd = new MetadataBuilder()
      .putString("__CHAR_VARCHAR_TYPE_STRING", "varchar(5)").build()
    val cSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("code", StringType, metadata = md),
      StructField("tag", StringType, metadata = vmd)))
    val desc = TableDescriptor(cSchema, primaryKey = Seq("id"), numBuckets = 2)
    assert(desc.charLengths == Map("code" -> 3, "tag" -> 5))
    // the constraint survives the catalog JSON roundtrip (schema metadata)
    assert(CatalogJson.read(CatalogJson.write(desc)).charLengths ==
      desc.charLengths)
    val t = cat.createTable("types", "char_" + System.nanoTime(), desc)
    def df(rows: (Long, String, String)*) = spark.createDataFrame(
      rows.map { case (i, c, g) => Row(i, c, g) }.asJava, cSchema)
    t.upsert(df((1L, "abc", "12345"), (2L, "ab", null)), orderBy = Seq(lit(1)))
    assert(t.scan().count() == 2) // exact-length, shorter, and null all pass
    val e1 = intercept[Exception] {
      t.upsert(df((3L, "abcd", "ok")), orderBy = Seq(lit(1)))
    }
    assert(e1.getMessage.contains("value too long") ||
      Option(e1.getCause).exists(_.getMessage.contains("value too long")))
    val e2 = intercept[Exception] {
      t.upsert(df((4L, "ok", "123456")), orderBy = Seq(lit(1)))
    }
    assert(e2.getMessage.contains("value too long") ||
      Option(e2.getCause).exists(_.getMessage.contains("value too long")))
    // the failed writes left no partial state behind
    assert(t.scan().count() == 2)
    // append path of a log table enforces the same constraint
    val lt = cat.createTable("types", "charlog_" + System.nanoTime(),
      TableDescriptor(cSchema, bucketKeys = Seq("id"), numBuckets = 2))
    lt.append(df((1L, "abc", "ok")), orderBy = Seq(lit(1)))
    intercept[Exception] { lt.append(df((2L, "toolong", "ok")), orderBy = Seq(lit(1))) }
    assert(lt.scan().count() == 1)
  }
}
