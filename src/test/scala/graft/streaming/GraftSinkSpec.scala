package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core.{Catalog, GraftTable, TableDescriptor}

/** writeStream.format("graft"): micro-batches upsert/append through the
  * engine with manifest-atomic batch dedup (exactly-once without sink
  * state files).
  */
class GraftSinkSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("ord", LongType)))

  private def cat() =
    new Catalog(Files.createTempDirectory("graft-sink-wh").toString, spark)

  private def rows(kv: (Long, Int)*) = spark.createDataFrame(
    kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava, schema)

  private def pipe(src: GraftTable, dst: GraftTable, ckpt: String,
      sinkId: String = "s1"): Unit = {
    val q = spark.readStream.format("graft").option("path", src.path).load()
      .select(col("k"), col("v"), col(graft.core.Meta.Offset).as("ord"))
      .writeStream.format("graft")
      .option("path", dst.path)
      .option("sink.id", sinkId)
      .option("write.order-by", "ord")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("source -> sink pipeline: PK table folds micro-batches; resume applies only new") {
    val c = cat()
    val src = c.createTable("db", "ssrc", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    val dst = c.createTable("db", "sdst", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      primaryKey = Seq("k"), numBuckets = 2))
    src.append(rows(1L -> 1, 2L -> 2, 1L -> 10), orderBy = Seq(col("ord")))
    val ckpt = Files.createTempDirectory("graft-sink-ckpt").toString

    pipe(src, dst, ckpt)
    assertSameRows(dst.scan().select("k", "v").collect().toSeq,
      Seq(Row(1L, 10), Row(2L, 2)))

    src.append(rows(2L -> 20, 3L -> 3), orderBy = Seq(col("ord")))
    pipe(src, dst, ckpt)
    assertSameRows(dst.scan().select("k", "v").collect().toSeq,
      Seq(Row(1L, 10), Row(2L, 20), Row(3L, 3)))
  }

  test("replayed micro-batch is skipped via the manifest commit tag") {
    val c = cat()
    val src = c.createTable("db", "rsrc", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    // APPEND-mode destination: a replay would visibly duplicate rows
    val dst = c.createTable("db", "rdst", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      bucketKeys = Seq("k"), numBuckets = 2))
    src.append(rows(1L -> 1, 2L -> 2), orderBy = Seq(col("ord")))

    val ckpt1 = Files.createTempDirectory("graft-sink-ckpt").toString
    pipe(src, dst, ckpt1)
    assert(dst.scan().count() == 2)
    assert(dst.committedBatchId("s1").contains(0L))

    // lost checkpoint: the stream restarts from batch 0 and replays the
    // same data — the sink's manifest tag recognizes and drops it
    val ckpt2 = Files.createTempDirectory("graft-sink-ckpt").toString
    pipe(src, dst, ckpt2)
    assert(dst.scan().count() == 2, "replayed batch must not double-append")

    // a DIFFERENT sink id is a different writer: its batch 0 applies
    pipe(src, dst, Files.createTempDirectory("graft-sink-ckpt").toString,
      sinkId = "s2")
    assert(dst.scan().count() == 4)
  }

  test("sink option validation") {
    val c = cat()
    val dst = c.createTable("db", "vdst", TableDescriptor(
      StructType(schema.fields.filterNot(_.name == "ord")),
      primaryKey = Seq("k"), numBuckets = 2))
    import spark.implicits._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val df = mem.toDF().select(col("value").as("k"), lit(1).as("v"))
    // no explicit sink.id AND no checkpointLocation to derive one from
    val noId = intercept[Exception] {
      df.writeStream.format("graft").option("path", dst.path).start()
    }
    assert(noId.getMessage.contains("sink.id"))
    val noPath = intercept[Exception] {
      df.writeStream.format("graft").option("sink.id", "x")
        .option("checkpointLocation",
          Files.createTempDirectory("ck").toString)
        .start()
    }
    assert(noPath.getMessage.contains("path"))
  }
}
