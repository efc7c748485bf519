package graft.core

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.file.DataFileWriter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Iceberg-spec (format v2) table metadata over an exported snapshot:
  * `metadata/v1.metadata.json` + an Avro manifest list + Avro manifest +
  * `version-hint.text`, so an export is a TABLE to any Iceberg-reading
  * engine — schema, snapshot and file inventory resolved from metadata,
  * not directory listing. The reference tiers changelogs into exactly
  * these formats (fluss-lake/fluss-lake-iceberg/,
  * LakeTableTieringManager.java:110); here the lake export grows the
  * same property. Data file paths in the manifests are absolute, so the
  * parquet can stay wherever [[GraftTable.exportSnapshot]] wrote it.
  *
  * Everything is hand-built against the public Iceberg spec
  * (https://iceberg.apache.org/spec/): field-ids on every Avro field,
  * the v2 required `data_file` columns, identity partition transforms.
  * Only Avro (shipped with Spark) is needed — no Iceberg runtime.
  */
object IcebergExport {

  /** Write Iceberg metadata for `files` (path → size) under `dir`.
    * Partition values are recovered from the hive-style directory names
    * [[GraftTable.exportSnapshot]] produced; per-file record counts come
    * from the parquet footers (metadata-sized IO — no data read).
    */
  def write(spark: SparkSession, dir: String, schema: StructType,
      partitionKeys: Seq[String], files: Seq[(String, Long)],
      sourcePath: String): Unit = {
    val now = System.currentTimeMillis()
    // & MaxValue, not math.abs: abs(Long.MinValue) is negative
    val snapshotId = (java.util.UUID.randomUUID()
      .getLeastSignificantBits & Long.MaxValue) | 1L
    val commitUuid = java.util.UUID.randomUUID().toString
    val qualifiedDir = WarehouseIO.qualify(dir)

    // ---- ids: pre-order allocation, top-level fields first ----
    val ids = new java.util.concurrent.atomic.AtomicInteger(0)
    val topIds: Map[String, Int] =
      schema.fields.map(f => f.name -> ids.incrementAndGet()).toMap

    def typeJson(dt: DataType): JValue = dt match {
      case BooleanType => JString("boolean")
      case ByteType | ShortType | IntegerType => JString("int")
      case LongType => JString("long")
      case FloatType => JString("float")
      case DoubleType => JString("double")
      case StringType => JString("string")
      case BinaryType => JString("binary")
      case DateType => JString("date")
      case TimestampType => JString("timestamptz")
      case TimestampNTZType => JString("timestamp")
      case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
      case a: ArrayType => JObject(List(
        "type" -> JString("list"),
        "element-id" -> JInt(ids.incrementAndGet()),
        "element" -> typeJson(a.elementType),
        "element-required" -> JBool(!a.containsNull)))
      case m: MapType => JObject(List(
        "type" -> JString("map"),
        "key-id" -> JInt(ids.incrementAndGet()),
        "key" -> typeJson(m.keyType),
        "value-id" -> JInt(ids.incrementAndGet()),
        "value" -> typeJson(m.valueType),
        "value-required" -> JBool(!m.valueContainsNull)))
      case s: StructType => JObject(List(
        "type" -> JString("struct"),
        "fields" -> JArray(s.fields.toList.map { f =>
          JObject(List(
            "id" -> JInt(ids.incrementAndGet()),
            "name" -> JString(f.name),
            "required" -> JBool(!f.nullable),
            "type" -> typeJson(f.dataType)))
        })))
      case other => throw new IllegalArgumentException(
        s"no Iceberg mapping for Spark type $other")
    }

    val schemaJson: JValue = JObject(List(
      "type" -> JString("struct"),
      "schema-id" -> JInt(0),
      "fields" -> JArray(schema.fields.toList.map { f =>
        JObject(List(
          "id" -> JInt(topIds(f.name)),
          "name" -> JString(f.name),
          "required" -> JBool(!f.nullable),
          "type" -> typeJson(f.dataType)))
      })))

    // ---- partition spec: identity transform per partition key ----
    val specFields: JValue = JArray(partitionKeys.toList.zipWithIndex.map {
      case (k, i) => JObject(List(
        "name" -> JString(k),
        "transform" -> JString("identity"),
        "source-id" -> JInt(topIds(k)),
        "field-id" -> JInt(1000 + i)))
    })
    val lastPartitionId = 999 + partitionKeys.size

    // ---- avro schemas (field-id props are what make them Iceberg) ----
    // Partition names are interpolated into hand-built Avro schema JSON:
    // refuse anything outside Avro's identifier grammar up front with a
    // clear message instead of a SchemaParseException mid-write. (Iceberg
    // itself sanitizes such names, AvroSchemaUtil; data columns are safe
    // — their names only pass through json4s, which escapes.)
    partitionKeys.find(!_.matches("[A-Za-z_][A-Za-z0-9_]*")).foreach { bad =>
      throw new IllegalArgumentException(
        s"partition column '$bad' is not a valid Avro identifier " +
          "([A-Za-z_][A-Za-z0-9_]*) — rename it to export Iceberg metadata")
    }
    def partAvroField(k: String, i: Int): String = {
      val t = schema(schema.fieldIndex(k)).dataType match {
        case StringType => "\"string\""
        case ByteType | ShortType | IntegerType => "\"int\""
        case LongType => "\"long\""
        case DateType => """{"type":"int","logicalType":"date"}"""
        case other => throw new IllegalArgumentException(
          s"iceberg export supports string/int/long/date partition " +
            s"columns, $k is $other")
      }
      s"""{"name":"$k","type":["null",$t],"default":null,"field-id":${1000 + i}}"""
    }
    val partRecord = s"""{"type":"record","name":"r102","fields":[${
      partitionKeys.zipWithIndex.map { case (k, i) => partAvroField(k, i) }
        .mkString(",")}]}"""

    val manifestEntrySchema = new Schema.Parser().parse(
      s"""{"type":"record","name":"manifest_entry","fields":[
         |{"name":"status","type":"int","field-id":0},
         |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
         |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
         |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
         |{"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
         |{"name":"content","type":"int","field-id":134},
         |{"name":"file_path","type":"string","field-id":100},
         |{"name":"file_format","type":"string","field-id":101},
         |{"name":"partition","field-id":102,"type":$partRecord},
         |{"name":"record_count","type":"long","field-id":103},
         |{"name":"file_size_in_bytes","type":"long","field-id":104}
         |]}}]}""".stripMargin)

    val manifestFileSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515},
        |{"name":"min_sequence_number","type":"long","field-id":516},
        |{"name":"added_snapshot_id","type":"long","field-id":503},
        |{"name":"added_files_count","type":"int","field-id":504},
        |{"name":"existing_files_count","type":"int","field-id":505},
        |{"name":"deleted_files_count","type":"int","field-id":506},
        |{"name":"added_rows_count","type":"long","field-id":512},
        |{"name":"existing_rows_count","type":"long","field-id":513},
        |{"name":"deleted_rows_count","type":"long","field-id":514}
        |]}""".stripMargin)

    // ---- per-file facts: hive partition values + footer row counts ----
    val hconf = spark.sessionState.newHadoopConf()
    def footerCount(abs: String): Long = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(abs), hconf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }
    // footer reads are metadata-sized but one round-trip each — run them
    // on a bounded pool so a many-file export on a remote warehouse isn't
    // a serial driver crawl
    val counts: Map[String, Long] = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(16, files.size)))
      try {
        import scala.jdk.CollectionConverters._
        val tasks: Seq[java.util.concurrent.Callable[(String, Long)]] =
          files.map { case (rel, _) =>
            (() => rel -> footerCount(s"$qualifiedDir/$rel")):
              java.util.concurrent.Callable[(String, Long)]
          }
        pool.invokeAll(tasks.asJava).asScala.map(_.get()).toMap
      } finally pool.shutdown()
    }
    def recordCount(rel: String): Long = counts(rel)
    def partValue(k: String, raw: String): AnyRef =
      if (raw == "__HIVE_DEFAULT_PARTITION__") null
      else schema(schema.fieldIndex(k)).dataType match {
        case StringType => raw
        case ByteType | ShortType | IntegerType => Int.box(raw.toInt)
        case LongType => Long.box(raw.toLong)
        case DateType => Int.box(java.time.LocalDate.parse(raw)
          .toEpochDay.toInt)
        case other => throw new IllegalArgumentException(
          s"unsupported partition type $other for $k")
      }
    // The dirs were written by Spark's partitionBy, which escapes via
    // ExternalCatalogUtils.escapePathName (%XX for a specific char set;
    // '+' and space pass through UNescaped) — so decode with the exact
    // inverse. URLDecoder would additionally map '+' to space and record
    // a value like "c++" wrong in the manifests, silently mis-pruning
    // downstream Iceberg readers.
    def partitionOf(rel: String): Map[String, AnyRef] =
      rel.split('/').dropRight(1).flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, v) if partitionKeys.contains(k) =>
            Some(k -> partValue(k,
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .unescapePathName(v)))
          case _ => None
        }
      }.toMap

    // ---- manifest: one entry per data file ----
    val partSchema = manifestEntrySchema.getField("data_file").schema()
      .getField("partition").schema()
    var totalRows = 0L
    val entries = files.map { case (rel, bytes) =>
      val abs = s"$qualifiedDir/$rel"
      val rows = recordCount(rel)
      totalRows += rows
      val part = new GenericData.Record(partSchema)
      partitionOf(rel).foreach { case (k, v) => part.put(k, v) }
      val df = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      df.put("content", Int.box(0))
      df.put("file_path", abs)
      df.put("file_format", "PARQUET")
      df.put("partition", part)
      df.put("record_count", Long.box(rows))
      df.put("file_size_in_bytes", Long.box(bytes))
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", Int.box(1)) // ADDED
      e.put("snapshot_id", Long.box(snapshotId))
      e.put("sequence_number", Long.box(1L))
      e.put("file_sequence_number", Long.box(1L))
      e.put("data_file", df)
      e
    }

    def writeAvro(path: String, sch: Schema, meta: Seq[(String, String)],
        records: Seq[GenericRecord]): Long = {
      val baos = new ByteArrayOutputStream()
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(sch, baos)
      records.foreach(w.append)
      w.close()
      val bytes = baos.toByteArray
      WarehouseIO.rawPutBytes(path, bytes)
      bytes.length.toLong
    }

    WarehouseIO.mkdirs(s"$dir/metadata")
    val manifestRel = s"metadata/$commitUuid-m0.avro"
    val manifestLen = writeAvro(s"$dir/$manifestRel", manifestEntrySchema,
      Seq(
        "schema" -> JsonMethods.compact(JsonMethods.render(schemaJson)),
        "partition-spec" -> JsonMethods.compact(JsonMethods.render(specFields)),
        "partition-spec-id" -> "0",
        "format-version" -> "2",
        "content" -> "data"),
      entries)

    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", s"$qualifiedDir/$manifestRel")
    mf.put("manifest_length", Long.box(manifestLen))
    mf.put("partition_spec_id", Int.box(0))
    mf.put("content", Int.box(0))
    mf.put("sequence_number", Long.box(1L))
    mf.put("min_sequence_number", Long.box(1L))
    mf.put("added_snapshot_id", Long.box(snapshotId))
    mf.put("added_files_count", Int.box(files.size))
    mf.put("existing_files_count", Int.box(0))
    mf.put("deleted_files_count", Int.box(0))
    mf.put("added_rows_count", Long.box(totalRows))
    mf.put("existing_rows_count", Long.box(0L))
    mf.put("deleted_rows_count", Long.box(0L))
    val listRel = s"metadata/snap-$snapshotId-1-$commitUuid.avro"
    writeAvro(s"$dir/$listRel", manifestFileSchema,
      Seq("format-version" -> "2", "snapshot-id" -> snapshotId.toString,
        "sequence-number" -> "1", "parent-snapshot-id" -> "null"),
      Seq(mf))

    // ---- table metadata + version hint ----
    val metadata: JValue = JObject(List(
      "format-version" -> JInt(2),
      "table-uuid" -> JString(java.util.UUID.randomUUID().toString),
      "location" -> JString(qualifiedDir),
      "last-sequence-number" -> JInt(1),
      "last-updated-ms" -> JInt(now),
      "last-column-id" -> JInt(ids.get()),
      "current-schema-id" -> JInt(0),
      "schemas" -> JArray(List(schemaJson)),
      "default-spec-id" -> JInt(0),
      "partition-specs" -> JArray(List(JObject(List(
        "spec-id" -> JInt(0), "fields" -> specFields)))),
      "last-partition-id" -> JInt(lastPartitionId),
      "default-sort-order-id" -> JInt(0),
      "sort-orders" -> JArray(List(JObject(List(
        "order-id" -> JInt(0), "fields" -> JArray(Nil))))),
      "properties" -> JObject(List(
        "graft.source" -> JString(sourcePath),
        "write.format.default" -> JString("parquet"))),
      "current-snapshot-id" -> JInt(snapshotId),
      "snapshots" -> JArray(List(JObject(List(
        "snapshot-id" -> JInt(snapshotId),
        "timestamp-ms" -> JInt(now),
        "sequence-number" -> JInt(1),
        "summary" -> JObject(List(
          "operation" -> JString("append"),
          "added-data-files" -> JString(files.size.toString),
          "added-records" -> JString(totalRows.toString))),
        "manifest-list" -> JString(s"$qualifiedDir/$listRel"),
        "schema-id" -> JInt(0))))),
      "snapshot-log" -> JArray(List(JObject(List(
        "timestamp-ms" -> JInt(now),
        "snapshot-id" -> JInt(snapshotId))))),
      "metadata-log" -> JArray(Nil)))
    CatalogJson.atomicWrite(s"$dir/metadata/v1.metadata.json",
      JsonMethods.pretty(JsonMethods.render(metadata)))
    CatalogJson.atomicWrite(s"$dir/metadata/version-hint.text", "1")
  }
}
