package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Interface proof for the Hadoop-FileSystem metadata path: the whole
  * commit protocol (manifests, locks, staged moves, listings) runs against
  * an explicit `file:`-SCHEME URI warehouse. java.nio cannot resolve such
  * paths (`Paths.get("file:/x")` makes a relative path named "file:"), so
  * everything passing here is routed through `org.apache.hadoop.fs` — the
  * same interface an `hdfs://` or `s3a://` warehouse would bind (see
  * [[WarehouseIO]]'s per-scheme atomicity contract; reference:
  * fluss-filesystems/, RemoteLogManager.java:72).
  */
class HadoopFsWarehouseSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def newUriWarehouse(): String =
    "file:" + java.nio.file.Files.createTempDirectory("graft-hfs-wh").toString

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("s", StringType)))

  private def df(rows: (Long, Integer, String)*) =
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, v, s), i) => Row(k, v, s, i.toLong) }.asJava,
      StructType(schema.fields :+ StructField("ord", LongType)))

  test("PK table: upsert + merge + lookup + compact round-trip on file: URI") {
    val cat = new Catalog(newUriWarehouse(), spark)
    val t = cat.createTable("db", "pk",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, 1, "a"), (2L, 2, "b")), orderBy = Seq(col("ord")))
    t.upsert(df((1L, 10, "a2"), (3L, 3, "c")), orderBy = Seq(col("ord")))
    val state = t.scan().orderBy("k").collect()
    assert(state.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 10), (2L, 2), (3L, 3)))
    // point lookup routes through bucket pruning on the URI path
    assert(t.lookup(Map("k" -> 1L)).collect().head.getInt(1) == 10)
    // snapshot tier + union read
    t.compact()
    t.upsert(df((2L, 20, "b2")), orderBy = Seq(col("ord")))
    assert(t.scan().orderBy("k").collect().map(_.getInt(1)).toSeq ==
      Seq(10, 20, 3))
    // changelog survives the snapshot: 3 inserts + UPDATE_BEFORE/AFTER
    // pairs for the k=1 and k=2 updates (full-image changelog)
    assert(t.changelog().count() == 7)
  }

  test("log table: append, offset manifest, fastCount, rewrite on file: URI") {
    val cat = new Catalog(newUriWarehouse(), spark)
    val t = cat.createTable("db", "log",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    t.append(df((1L, 1, "a"), (2L, 2, "b"), (3L, 3, "c")), orderBy = Seq(col("ord")))
    t.append(df((4L, 4, "d")), orderBy = Seq(col("ord")))
    assert(t.fastCount == 4)
    assert(t.scan().count() == 4)
    // small-file compaction publishes through the same manifest protocol
    t.rewriteLogFiles()
    assert(t.scan().count() == 4)
    assert(t.logDF.select("v").orderBy("v").collect().map(_.getInt(0)).toSeq ==
      Seq(1, 2, 3, 4))
  }

  test("catalog surface (list/rename/clone/drop) + config stores on file: URI") {
    val wh = newUriWarehouse()
    val cat = new Catalog(wh, spark)
    cat.createDatabase("db", Map("comment" -> "uri warehouse"))
    assert(cat.listDatabases() == Seq("db"))
    assert(cat.getDatabaseInfo("db")._1("comment") == "uri warehouse")
    val t = cat.createTable("db", "t1",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    t.append(df((1L, 1, "a")), orderBy = Seq(col("ord")))
    cat.renameTable("db", "t1", "t2")
    assert(cat.listTables("db") == Seq("t2"))
    assert(cat.getTable("db", "t2").scan().count() == 1)
    val c = cat.cloneTable("db", "t2", "t3")
    assert(c.scan().count() == 1)
    cat.dropTable("db", "t3")
    assert(cat.listTables("db") == Seq("t2"))
    // file-locked JSON stores work over the URI too
    DynamicConfigs.set(wh, Map("spark.sql.graft.read.optimized" -> "true"))
    assert(DynamicConfigs.read(wh)("spark.sql.graft.read.optimized") == "true")
    DynamicConfigs.reset(wh, Seq("spark.sql.graft.read.optimized"))
    cat.acls.add(AclEntry("db.t2", "ALLOW", "User:x", "READ", "*"))
    assert(cat.acls.list(AclEntry("ANY", "ANY", "User:x", "ANY", "ANY")).size == 1)
  }

  test("partitioned table: partition dirs, pruning and expiry on file: URI") {
    val cat = new Catalog(newUriWarehouse(), spark)
    val pschema = StructType(schema.fields :+ StructField("dt", StringType))
    val t = cat.createTable("db", "part", TableDescriptor(pschema,
      bucketKeys = Seq("k"), numBuckets = 2, partitionKeys = Seq("dt")))
    val rows = spark.createDataFrame(Seq(
      Row(1L, 1, "a", "2024-01-01", 0L), Row(2L, 2, "b", "2024-01-02", 1L),
      Row(3L, 3, "c", "2024-01-03", 2L)).asJava,
      StructType(pschema.fields :+ StructField("ord", LongType)))
    t.append(rows, orderBy = Seq(col("ord")))
    assert(t.listPartitions("dt") ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(t.createPartition(Seq("2024-01-04")))
    assert(t.partitionExists(Seq("2024-01-04")))
    assert(t.expirePartitions("dt", "2024-01-02") == 1)
    assert(t.scan().count() == 2)
    assert(t.dropPartition(Seq("2024-01-03")))
    assert(t.scan().count() == 1)
  }

  test("streaming exactly-once markers + kv snapshot leases on file: URI") {
    val cat = new Catalog(newUriWarehouse(), spark)
    val t = cat.createTable("db", "lease",
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 2))
    t.append(df((1L, 1, "a"), (2L, 2, "b")), orderBy = Seq(col("ord")))
    val floor = t.acquireKvSnapshotLease("job-1", durationMs = 60000L)
    assert(t.kvSnapshotLeases().contains("job-1"))
    assert(floor.values.forall(_ == 0L))
    assert(t.dropKvSnapshotLease("job-1"))
    assert(!t.dropKvSnapshotLease("job-1"))
  }
}
