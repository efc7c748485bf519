package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deep type fidelity through every lake format (the tier5_all_types
  * oracle's spec-side complement): an all-types PK table tiered and read
  * back through each format's metadata must round-trip EVERY column
  * exactly — including the complex ones (ARRAY, MAP, STRUCT) the oracle
  * can only compare as projected scalars, and the schema itself
  * (a format whose type serialization mangles DECIMAL scale or NTZ-ness
  * fails here even if values survive).
  */
class AllTypesLakeSpec extends SparkTestBase {

  test("all types round-trip through iceberg, delta, paimon and hudi metadata") {
    val df = spark.range(1, 21).selectExpr(
      "id AS k",
      "CAST(CAST(id AS DECIMAL(18,6)) * 1.25 AS DECIMAL(18,6)) AS dec_v",
      "timestamp_seconds(1700000000 + id) AS ts",
      "CAST(timestamp_seconds(1700000000 + id) AS TIMESTAMP_NTZ) AS tsn",
      "date_add(DATE'2020-01-01', CAST(id % 100 AS INT)) AS dt",
      "unhex(md5(CAST(id AS STRING))) AS bin",
      "array(id * 1.5, id * 2.5) AS arr",
      "map('a', id, 'b', id * 2) AS m",
      "named_struct('n', CAST(id AS STRING), 'nk', CAST(id AS INT)) AS st")
    val cat = new Catalog(
      Files.createTempDirectory("graft-atl-wh").toString, spark)
    for (fmt <- Seq("iceberg", "delta", "paimon", "hudi")) {
      val t = cat.createTable("db", s"at_$fmt", TableDescriptor(
        df.schema, primaryKey = Seq("k"), numBuckets = 2,
        // pin the bucket-aligned layout (tiny tables auto-pick partition)
        properties = Map("table.datalake.layout" -> "bucket")))
      t.upsert(df, orderBy = Seq(col("k")))
      val lake = t.path + "_lake"
      t.tierSnapshot(lake, fmt)
      val back = LakeFormatOps.of(fmt).readLive(spark, lake)
      // physical schema survives the format's metadata (modulo
      // nullability, which parquet read-back relaxes — nested levels too)
      def relax(dt: org.apache.spark.sql.types.DataType)
          : org.apache.spark.sql.types.DataType = dt match {
        case a: org.apache.spark.sql.types.ArrayType =>
          org.apache.spark.sql.types.ArrayType(relax(a.elementType), true)
        case m: org.apache.spark.sql.types.MapType =>
          org.apache.spark.sql.types.MapType(
            relax(m.keyType), relax(m.valueType), true)
        case s: org.apache.spark.sql.types.StructType =>
          org.apache.spark.sql.types.StructType(s.fields.map(f =>
            org.apache.spark.sql.types.StructField(
              f.name, relax(f.dataType), nullable = true)))
        case other => other
      }
      // the bucket-aligned lake exposes __bucket as a trailing
      // partition column alongside the table's own fields
      assert(back.schema.fields.map(f => (f.name, relax(f.dataType))).toSeq ==
        df.schema.fields.map(f => (f.name, relax(f.dataType))).toSeq :+
          (("__bucket", org.apache.spark.sql.types.IntegerType)),
        s"$fmt schema mangled: ${back.schema.sql}")
      val a = df.orderBy("k").collect().toSeq
      val b = back.select(df.columns.map(col).toIndexedSeq: _*)
        .orderBy("k").collect().toSeq
      assert(b == a, s"$fmt round-trip mismatch: $b vs $a")
    }
  }
}
