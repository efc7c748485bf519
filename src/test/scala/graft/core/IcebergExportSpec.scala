package graft.core

import java.nio.file.Files

import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.SparkTestBase

/** Iceberg-v2 export metadata shape: no Iceberg runtime ships in this
  * environment, so the spec validates the artifacts the way an engine's
  * reader would — parse `metadata/v1.metadata.json`, follow
  * `manifest-list` to the Avro manifest list, follow `manifest_path` to
  * the Avro manifest, and check the file inventory + record counts +
  * partition tuples against the actual parquet.
  */
class IcebergExportSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def readAvro(path: String): (Seq[GenericRecord], Map[String, String]) = {
    val in = new SeekableByteArrayInput(WarehouseIO.readBytes(path))
    val r = new DataFileReader[GenericRecord](in,
      new GenericDatumReader[GenericRecord]())
    try {
      val metaKeys = r.getMetaKeys.asScala.toSeq
      val meta = metaKeys.filterNot(_.startsWith("avro."))
        .map(k => k -> r.getMetaString(k)).toMap
      (r.iterator().asScala.toVector, meta)
    } finally r.close()
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  test("iceberg export: metadata.json -> manifest list -> manifest -> data files") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-iceberg-wh").toString, spark)
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("v", IntegerType),
      StructField("tags", ArrayType(StringType)),
      StructField("dt", StringType)))
    val t = cat.createTable("db", "ice", TableDescriptor(schema,
      primaryKey = Seq("dt", "k"), partitionKeys = Seq("dt"), numBuckets = 2))
    def rows(r: (Long, Integer, Seq[String], String)*) = spark.createDataFrame(
      r.zipWithIndex.map { case ((k, v, tg, dt), i) =>
        Row(k, v, tg, dt, i.toLong) }.asJava,
      StructType(schema.fields :+ StructField("ord", LongType)))
    t.upsert(rows(
      (1L, Int.box(1), Seq("a"), "2024-01-01"),
      (2L, Int.box(2), Seq("b", "c"), "2024-01-01"),
      (3L, Int.box(3), Seq(), "2024-01-02")), orderBy = Seq(col("ord")))
    t.upsert(rows((1L, Int.box(10), Seq("a2"), "2024-01-01")),
      orderBy = Seq(col("ord")))

    val out = Files.createTempDirectory("graft-iceberg-out").toString
    t.exportSnapshot(out, icebergMetadata = true)

    // version hint + table metadata
    assert(WarehouseIO.readString(s"$out/metadata/version-hint.text") == "1")
    val md = JsonMethods.parse(
      WarehouseIO.readString(s"$out/metadata/v1.metadata.json"))
      .asInstanceOf[JObject].obj.toMap
    assert(md("format-version") == JInt(2))
    val snapId = md("current-snapshot-id").asInstanceOf[JInt].num.toLong
    val snaps = md("snapshots").asInstanceOf[JArray].arr
      .map(_.asInstanceOf[JObject].obj.toMap)
    assert(snaps.map(_("snapshot-id")) == List(JInt(snapId)))
    // schema: distinct positive field ids; last-column-id covers nested
    val fields = md("schemas").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields")
      .asInstanceOf[JArray].arr.map(_.asInstanceOf[JObject].obj.toMap)
    assert(fields.map(f => f("name").asInstanceOf[JString].s) ==
      List("k", "v", "tags", "dt"))
    val ids = fields.map(_("id").asInstanceOf[JInt].num.toInt)
    assert(ids == ids.distinct && ids.forall(_ > 0))
    assert(md("last-column-id").asInstanceOf[JInt].num.toInt > ids.max,
      "array element id must be allocated beyond the top-level ids")
    // partition spec: identity on dt, sourced from dt's field id
    val spec = md("partition-specs").asInstanceOf[JArray].arr.head
      .asInstanceOf[JObject].obj.toMap.apply("fields")
      .asInstanceOf[JArray].arr.head.asInstanceOf[JObject].obj.toMap
    assert(spec("transform") == JString("identity"))
    assert(spec("source-id") == JInt(ids(3)))
    assert(spec("field-id") == JInt(1000))

    // manifest list -> manifest
    val listPath = stripScheme(snaps.head("manifest-list")
      .asInstanceOf[JString].s)
    val (mlRecords, mlMeta) = readAvro(listPath)
    assert(mlMeta.get("format-version").contains("2"))
    assert(mlRecords.length == 1)
    val mf = mlRecords.head
    assert(mf.get("added_snapshot_id") == snapId)
    val manifestPath = stripScheme(mf.get("manifest_path").toString)
    assert(mf.get("manifest_length") == WarehouseIO.size(manifestPath))

    val (entries, mMeta) = readAvro(manifestPath)
    assert(mMeta.get("format-version").contains("2"))
    assert(mMeta.get("content").contains("data"))
    assert(mMeta("schema").contains("\"fields\""))
    // the data-file inventory matches the parquet on disk, byte for byte
    val onDisk = WarehouseIO.walkFiles(out)
      .filter(e => e.name.endsWith(".parquet"))
      .map(e => stripScheme(WarehouseIO.qualify(e.path)) -> e.len).toMap
    val listed = entries.map { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      stripScheme(df.get("file_path").toString) ->
        df.get("file_size_in_bytes").asInstanceOf[Long]
    }.toMap
    assert(listed == onDisk)
    // record counts from the footers sum to the table row count
    val totalRows = entries.map(_.get("data_file").asInstanceOf[GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
    assert(totalRows == t.scan().count())
    assert(mf.get("added_rows_count") == totalRows)
    // partition tuples match the hive directories the files sit in
    entries.foreach { e =>
      val df = e.get("data_file").asInstanceOf[GenericRecord]
      val dt = df.get("partition").asInstanceOf[GenericRecord]
        .get("dt").toString
      assert(df.get("file_path").toString.contains(s"dt=$dt"))
    }
  }

  test("the default export stays a bare parquet directory (no metadata/)") {
    val cat = new Catalog(
      Files.createTempDirectory("graft-iceberg-wh2").toString, spark)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", IntegerType)))
    val t = cat.createTable("db", "bare",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2))
    t.upsert(spark.createDataFrame(
      Seq(Row(1L, Int.box(1), 0L), Row(2L, Int.box(2), 1L)).asJava,
      StructType(schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    val out = Files.createTempDirectory("graft-iceberg-bare").toString
    t.exportSnapshot(out)
    assert(!WarehouseIO.exists(s"$out/metadata"))
    assert(spark.read.parquet(out).count() == 2)
  }
}
