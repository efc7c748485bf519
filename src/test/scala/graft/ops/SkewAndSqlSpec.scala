package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core._

/** T8 salted join + the SQL temp-view surface. */
class SkewAndSqlSpec extends SparkTestBase {

  test("saltedJoin equals the plain join on a skewed key distribution") {
    import spark.implicits._
    // 10k rows of one hot key + a tail
    val left = ((1 to 10000).map(_ => (1L, "hot")) ++
      (2L to 100L).map(k => (k, s"k$k"))).toDF("k", "lv")
    val right = (1L to 100L).map(k => (k, k * 10)).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).agg(
      count(lit(1)), sum("rv")).collect()(0)
    val salted = Skew.saltedJoin(left, right, Seq("k"), factor = 8).agg(
      count(lit(1)), sum("rv")).collect()(0)
    assert(plain == salted)
  }

  test("temp views expose table, $changelog and $binlog to spark.sql") {
    val cat = new Catalog(Files.createTempDirectory("graft-sql").toString, spark)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType)))
    val t = cat.createTable("sql", "kv", TableDescriptor(
      schema, primaryKey = Seq("k"), numBuckets = 4))
    import spark.implicits._
    val df1 = Seq((1L, 1), (2L, 2)).toDF("k", "v")
    t.upsert(df1, orderBy = Seq(df1("k")))
    val df2 = Seq((1L, 10)).toDF("k", "v")
    t.upsert(df2, orderBy = Seq(df2("k")))
    t.createOrReplaceTempViews("kv")
    assert(spark.sql("SELECT v FROM kv WHERE k = 1").collect()(0).getInt(0) == 10)
    assert(spark.sql("SELECT count(*) FROM kv__changelog").collect()(0).getLong(0) == 4) // +I,+I,-U,+U
    val bl = spark.sql(
      "SELECT _change_type, before.v, after.v FROM kv__binlog ORDER BY _log_offset")
      .collect().map(r => (r.getString(0), r.get(1), r.get(2))).toSeq
    assert(bl == Seq(("+I", null, 1), ("+I", null, 2), ("+U", 1, 10)))
  }

  test("partitioned table exposes a __partitions metadata view") {
    val cat = new Catalog(Files.createTempDirectory("graft-sqlp").toString, spark)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType),
      StructField("dt", StringType)))
    val t = cat.createTable("sql", "pv", TableDescriptor(
      schema, partitionKeys = Seq("dt"), bucketKeys = Seq("k"), numBuckets = 2))
    import spark.implicits._
    val df = Seq((1L, 1, "2024-01-01"), (2L, 2, "2024-01-02")).toDF("k", "v", "dt")
    t.append(df, orderBy = Seq(df("k")))
    t.createOrReplaceTempViews("pv")
    assert(spark.sql("SELECT partition FROM pv__partitions ORDER BY 1")
      .collect().map(_.getString(0)).toSeq ==
      Seq("dt=2024-01-01", "dt=2024-01-02"))
  }
}
