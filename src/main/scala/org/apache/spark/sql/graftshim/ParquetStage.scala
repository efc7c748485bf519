package org.apache.spark.sql.graftshim

import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet staging for the DSv2 STREAMING_WRITE path: a row
  * writer that is exactly what `df.write.parquet` would run per task —
  * [[ParquetFileFormat.prepareWrite]] wires the session's parquet conf
  * (compression, timestamp type, rebase modes, legacy format) into a
  * serializable [[OutputWriterFactory]], so staged files round-trip
  * bit-identically through `spark.read.parquet`. Lives in this package
  * because `prepareWrite`/`OutputWriterFactory` are `private[sql]`;
  * everything else is plain public API.
  */
trait StagedRowWriter {
  def write(r: InternalRow): Unit
  /** Close the file and return its path (call exactly once). */
  def closeAndGetPath(): String
}

/** Serializable bundle shipped to executors; `open` is called once per
  * (epoch, partition, attempt) and stages to a unique file name, so
  * speculative duplicates never collide — only files named in committed
  * task messages are read, the rest die with the epoch directory.
  */
final class ParquetStageFactory private[graftshim] (
    factory: OutputWriterFactory,
    conf: SerializableConfiguration,
    schema: StructType,
    stagingDir: String) extends Serializable {

  def open(epochId: Long, partitionId: Int, taskId: Long): StagedRowWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-stage", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attempt)
    val ext = factory.getFileExtension(ctx)
    val path = s"$stagingDir/epoch=$epochId/part-$partitionId-${UUID.randomUUID()}$ext"
    val w = factory.newInstance(path, schema, ctx)
    new StagedRowWriter {
      override def write(r: InternalRow): Unit = w.write(r)
      override def closeAndGetPath(): String = { w.close(); path }
    }
  }
}

object ParquetStage {
  def prepare(spark: SparkSession, schema: StructType,
      stagingDir: String): ParquetStageFactory = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(classic.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, schema)
    new ParquetStageFactory(factory,
      new SerializableConfiguration(job.getConfiguration), schema, stagingDir)
  }
}

/** Public re-export of the `private[sql]` marker that lets a DSv2 sink
  * accept Update-mode streaming plans as appends (the upsert merge folds
  * updates anyway) — the same marker Spark's Kafka sink uses.
  */
trait StreamingUpdateAsAppend
  extends org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend
