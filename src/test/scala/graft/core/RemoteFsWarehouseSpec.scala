package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The REMOTE branch of [[WarehouseIO]] end-to-end: a `mockfs://` scheme
  * (RawLocalFileSystem under a non-local name — [[MockRemoteFs]]) forces
  * every metadata operation through `org.apache.hadoop.fs.FileSystem` —
  * FS listings, `create(overwrite=false)` commit locks, the
  * delete+rename publish fallback — exactly the code an `hdfs://` or
  * `s3a://` warehouse runs, minus the network. Spark's own data reads
  * and writes resolve the scheme through the session Hadoop conf.
  */
class RemoteFsWarehouseSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def newRemoteWarehouse(): String = {
    // register the scheme for the engine's metadata IO AND Spark's data IO
    WarehouseIO.setConf("fs.mockfs.impl", classOf[MockRemoteFs].getName)
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockRemoteFs].getName)
    spark.conf.set("spark.hadoop.fs.mockfs.impl", classOf[MockRemoteFs].getName)
    "mockfs://test" + java.nio.file.Files.createTempDirectory("graft-remote-wh")
  }

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("s", StringType)))

  private def df(rows: (Long, Integer, String)*) =
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, v, s), i) => Row(k, v, s, i.toLong) }.asJava,
      StructType(schema.fields :+ StructField("ord", LongType)))

  test("PK lifecycle on a non-local scheme: upsert, merge, compact, travel") {
    val cat = new Catalog(newRemoteWarehouse(), spark)
    val t = cat.createTable("db", "pk",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, 1, "a"), (2L, 2, "b")), orderBy = Seq(col("ord")))
    t.upsert(df((1L, 10, "a2"), (3L, 3, "c")), orderBy = Seq(col("ord")))
    assert(t.scan().orderBy("k").collect().map(_.getInt(1)).toSeq ==
      Seq(10, 2, 3))
    assert(t.lookup(Map("k" -> 3L)).collect().head.getInt(1) == 3)
    t.compact()
    t.upsert(df((2L, 20, "b2")), orderBy = Seq(col("ord")))
    assert(t.scan().orderBy("k").collect().map(_.getInt(1)).toSeq ==
      Seq(10, 20, 3))
    assert(t.scanAtVersion(2).orderBy("k").collect().map(_.getInt(1)).toSeq ==
      Seq(10, 2, 3))
    // history + exports also run over the remote branch
    assert(t.history().count() == 3)
    val out = "mockfs://test" +
      java.nio.file.Files.createTempDirectory("graft-remote-exp")
    t.exportSnapshot(out)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("log lifecycle on a non-local scheme: append, rewrite, orphan GC") {
    val cat = new Catalog(newRemoteWarehouse(), spark)
    val t = cat.createTable("db", "log",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    t.append(df((1L, 1, "a"), (2L, 2, "b"), (3L, 3, "c")), orderBy = Seq(col("ord")))
    assert(t.fastCount == 3)
    t.rewriteLogFiles()
    assert(t.scan().count() == 3)
    t.removeOrphanFiles(stagingOlderThanMs = 0L)
    assert(t.scan().count() == 3)
    assert(cat.listTables("db") == Seq("log"))
  }
}
