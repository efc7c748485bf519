package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.graftshim.{ParquetStage, ParquetStageFactory}
import org.apache.spark.sql.types.StructType

import graft.core.GraftTable

/** The staged file names one task committed (its unique parquet file in
  * the epoch's staging dir).
  */
private[connector] final case class StagedFiles(paths: Seq[String])
  extends WriterCommitMessage

/** DSv2 streaming write for catalog tables — `df.writeStream.toTable(
  * "cat.db.t")` with no graft-specific options, the exact usage the
  * reference documents (website/docs/engine-spark/structured-streaming
  * .md:24-56). Two-phase like every engine commit: executors stage the
  * micro-batch as ordinary parquet (same conf-correct writer
  * `df.write.parquet` uses — [[ParquetStage]]), then the driver-side
  * `commit(epochId)` runs the staged batch through the table's own
  * upsert/append with the (queryId, epochId) commit tag, so the batch id
  * lands ATOMICALLY with the offsets in the manifest — exactly-once on
  * replay, identical to the V1 sink's guarantee. Nothing data-scale
  * touches the driver: staging is per-task, the merge is the ordinary
  * distributed write path.
  *
  * The streaming-query id (stable across restarts, persisted in the
  * checkpoint) is the writer identity; a restarted query dedups its
  * replayed epochs, distinct queries never collide.
  */
final class GraftStreamingWrite(table: GraftTable, queryId: String,
    schema: StructType, spark: SparkSession) extends StreamingWrite {

  private val sinkId = s"q:$queryId"
  private val stagingRoot = s"${table.path}/_stream_staging/$queryId"
  private val factory = ParquetStage.prepare(spark, schema, stagingRoot)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StagedParquetWriterFactory(factory)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    try {
      if (table.committedBatchId(sinkId).exists(_ >= epochId)) return // replay
      val files = messages.iterator.collect { case StagedFiles(ps) => ps }
        .flatten.toSeq
      if (files.isEmpty) return // empty batch: nothing to merge or tag
      val df = spark.read.schema(schema).parquet(files: _*)
      if (table.desc.isPrimaryKeyTable)
        table.upsert(df, commitTag = Some(sinkId -> epochId))
      else
        table.append(df, commitTag = Some(sinkId -> epochId))
    } finally deleteEpoch(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    deleteEpoch(epochId)

  // a failed epoch's staging is deleted here and the batch replays from
  // the source (the streaming recovery path), so leftovers never leak
  private def deleteEpoch(epochId: Long): Unit =
    try graft.core.WarehouseIO.deleteRecursively(s"$stagingRoot/epoch=$epochId")
    catch { case _: Exception => () }

  override def toString: String = s"GraftStreamingWrite[${table.path}]"
}

/** Executor side: one uniquely-named staged parquet file per task attempt;
  * only committed attempts report their file, so speculation/retries are
  * naturally fenced.
  */
private[connector] final class StagedParquetWriterFactory(
    factory: ParquetStageFactory) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var writer = factory.open(epochId, partitionId, taskId)
    private var done = false

    override def write(r: InternalRow): Unit = writer.write(r)

    override def commit(): WriterCommitMessage = {
      val p = writer.closeAndGetPath()
      done = true
      StagedFiles(Seq(p))
    }

    override def abort(): Unit = close()

    override def close(): Unit = if (!done) {
      done = true
      try writer.closeAndGetPath() catch { case _: Exception => () }
    }
  }
}
