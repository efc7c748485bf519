package graft.core

import java.nio.file.{Files, Path}

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Write-path parquet bloom filters: PK tables bloom their lookup columns
  * by default so point reads prune row groups inside the key's bucket.
  */
class BloomFilterSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-test-wh").toString, spark)

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType)))

  private def rows(n: Int) = spark.createDataFrame(
    (1 to n).map(i => Row(i.toLong, i)).asJava, schema)

  private def logParquetFiles(path: String): Seq[Path] = {
    val walk = Files.walk(java.nio.file.Paths.get(path, "log"))
    try walk.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .toSeq
    finally walk.close()
  }

  private def bloomOffsets(file: Path): Map[String, Long] = {
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file.toUri), new Configuration())
    val reader = ParquetFileReader.open(in)
    try reader.getFooter.getBlocks.asScala.head.getColumns.asScala
      .map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
    finally reader.close()
  }

  test("PK table log files bloom the bucket key by default; values are findable") {
    val cat = newCatalog()
    val t = cat.createTable("db", "bloom1",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2))
    t.upsert(rows(200))
    val files = logParquetFiles(t.path)
    assert(files.nonEmpty)
    files.foreach { f =>
      val offs = bloomOffsets(f)
      assert(offs("k") > 0, s"no bloom on k in $f: $offs")
      assert(offs("v") <= 0, s"unexpected bloom on v in $f")
    }
    // the bloom actually answers membership for a key written to this file
    val f = files.head
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toUri), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val rg = reader.getFooter.getBlocks.asScala.head
      val chunk = rg.getColumns.asScala.find(_.getPath.toDotString == "k").get
      val bloom = reader.readBloomFilter(chunk)
      assert(bloom != null)
      val someKey = spark.read.parquet(f.toString).select("k").head.getLong(0)
      assert(bloom.findHash(bloom.hash(someKey)))
    } finally reader.close()
    // scan/lookup still correct with blooms present
    assert(t.scan().count() == 200)
    assert(t.lookup(Map("k" -> 17L)).count() == 1)
  }

  test("table.file.compression picks the parquet codec per table") {
    val cat = newCatalog()
    val t = cat.createTable("db", "codec1",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 1,
        properties = Map("table.file.compression" -> "zstd")))
    t.append(rows(50))
    val f = logParquetFiles(t.path).head
    val in = HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(f.toUri), new Configuration())
    val reader = ParquetFileReader.open(in)
    try {
      val codecs = reader.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala).map(_.getCodec.name()).toSet
      assert(codecs == Set("ZSTD"), s"expected zstd, got $codecs")
    } finally reader.close()
    assert(t.scan().count() == 50)
  }

  test("log tables default to no blooms; properties opt in and out") {
    val cat = newCatalog()
    val plain = cat.createTable("db", "bloom2",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    plain.append(rows(50))
    logParquetFiles(plain.path).foreach { f =>
      assert(bloomOffsets(f).values.forall(_ <= 0), s"unexpected bloom in $f")
    }
    val optIn = cat.createTable("db", "bloom3",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2,
        properties = Map("table.file.bloom-filter.enabled" -> "true",
          "table.file.bloom-filter.columns" -> "v")))
    optIn.append(rows(50))
    logParquetFiles(optIn.path).foreach { f =>
      val offs = bloomOffsets(f)
      assert(offs("v") > 0, s"no bloom on v in $f")
      assert(offs("k") <= 0, s"unexpected bloom on k in $f")
    }
    val optOut = cat.createTable("db", "bloom4",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2,
        properties = Map("table.file.bloom-filter.enabled" -> "false")))
    optOut.upsert(rows(50))
    logParquetFiles(optOut.path).foreach { f =>
      assert(bloomOffsets(f).values.forall(_ <= 0), s"unexpected bloom in $f")
    }
  }
}
