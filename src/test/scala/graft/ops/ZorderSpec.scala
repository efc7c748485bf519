package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core.{Catalog, TableDescriptor}

class ZorderSpec extends SparkTestBase {

  test("zvalue interleaves bit planes round-robin (hand-checked mortons)") {
    import spark.implicits._
    // bits=2, bounds [0,4): scaled rank == floor(v) clamped to [0,3];
    // morton(x,y) with x bits at even positions, y at odd
    val df = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (3.0, 3.0),
      (2.0, 1.0)).toDF("x", "y")
    val got = df.select(Zorder.zvalue(Seq(col("x"), col("y")),
        mins = Seq(0.0, 0.0), maxs = Seq(4.0, 4.0), bits = 2).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (x,y) -> x0 + 2*y0 + 4*x1 + 8*y1
    assert(got == Seq(0L, 1L, 2L, 15L, 4L + 2L))
  }

  test("zvalue handles nulls, constant columns, and out-of-range values") {
    val schema = StructType(Seq(StructField("x", DoubleType),
      StructField("y", DoubleType)))
    import scala.jdk.CollectionConverters._
    val rows = Seq(Row(null, 2.0), Row(9.0, 2.0), Row(-5.0, 2.0))
    val df = spark.createDataFrame(rows.asJava, schema)
    val z = df.select(Zorder.zvalue(Seq(col("x"), col("y")),
        mins = Seq(0.0, 2.0), maxs = Seq(4.0, 2.0), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // null -> rank 0; 9.0 clamps to 15; constant y contributes 0 bits
    assert(z(0) == 0L)
    assert(z(2) == 0L)
    assert(z(1) == (0 until 4).map(b => ((15L >> b) & 1L) << (b * 2)).sum)
  }

  test("z-ordered rewrite preserves rows and narrows per-file ranges on both dims") {
    val li = Fixtures.read(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val cat = new Catalog(
      Files.createTempDirectory("graft-zorder-wh").toString, spark)
    val t = cat.createTable("db", "z1",
      TableDescriptor(li.schema, bucketKeys = Seq("l_orderkey"), numBuckets = 1))
    t.append(li, orderBy = Seq(col("l_orderkey") * 10 + col("l_linenumber")))
    val before = t.scan().collect()
    t.rewriteLogFiles(maxRecordsPerFile = 2000,
      zorderBy = Seq("l_partkey", "l_suppkey"))
    val after = t.scan()
    // layout change only: the visible rows are identical
    assertSameRows(after.collect().toSeq, before.toSeq)
    // skipping property: mean per-file value span is a small fraction of
    // the global span on BOTH clustered columns (an id-ordered layout
    // leaves l_partkey/l_suppkey spans ~ the full domain in every file).
    // Measured through the files metadata table's per-column stats — the
    // same numbers an operator would read via filesMeta/t.files.
    val perFile = t.filesMeta(statsFor = Seq("l_partkey", "l_suppkey"))
      .select((col("max_l_partkey") - col("min_l_partkey")).as("ps"),
        (col("max_l_suppkey") - col("min_l_suppkey")).as("ss"))
      .collect()
    assert(perFile.length > 5, s"expected many split files, got ${perFile.length}")
    def globalSpan(c: String) = {
      val r = after.agg(max(col(c)) - min(col(c))).head
      r.getLong(0).toDouble
    }
    val meanPart = perFile.map(_.getLong(0)).sum.toDouble / perFile.length
    val meanSupp = perFile.map(_.getLong(1)).sum.toDouble / perFile.length
    assert(meanPart < 0.5 * globalSpan("l_partkey"),
      s"l_partkey mean file span $meanPart vs global ${globalSpan("l_partkey")}")
    assert(meanSupp < 0.5 * globalSpan("l_suppkey"),
      s"l_suppkey mean file span $meanSupp vs global ${globalSpan("l_suppkey")}")
  }
}
