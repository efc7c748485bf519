package org.apache.spark.sql.graftshim

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Executor-side parquet reading for the DSv2 MICRO_BATCH_READ path: the
  * exact per-file reader `df.read.parquet` would run per task —
  * [[ParquetFileFormat.buildReaderWithPartitionValues]] wires the
  * session's parquet conf (timestamp rebase modes, int96 handling,
  * pushdown) into a serializable `PartitionedFile => Iterator[
  * InternalRow]` closure (the hadoop conf rides a broadcast inside it),
  * so streamed rows decode bit-identically to the batch scan of the same
  * files. The read-side twin of [[ParquetStage]]; lives in this package
  * because `buildReaderWithPartitionValues` / `PartitionedFile` are
  * `private[sql]`.
  */
object ParquetRead {

  type FileReader = PartitionedFile => Iterator[InternalRow]

  /** Build the per-file reader. Output rows are `requiredSchema` fields
    * followed by `partitionSchema` fields (appended from each file's
    * `partitionValues`). `OPTION_RETURNING_BATCH=false` pins the
    * row-based (non-vectorized-output) path — a streaming
    * PartitionReader consumes rows, not ColumnarBatches.
    */
  def buildReader(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter]): FileReader = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic, dataSchema, partitionSchema, requiredSchema, filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConf())
  }

  /** Whether the vectorized reader can emit ColumnarBatches for this
    * RESULT schema (required data + partition columns) — the exact
    * `FileSourceScanExec.supportsColumnar` question, answered by the
    * format itself (vectorized reader enabled, every type
    * batch-supported, codegen field limits).
    */
  def supportBatch(spark: SparkSession, resultSchema: StructType): Boolean =
    new ParquetFileFormat().supportBatch(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      resultSchema)

  /** Build the per-file reader in BATCH mode: the returned iterator's
    * elements are [[org.apache.spark.sql.vectorized.ColumnarBatch]]es
    * (Spark's file-source contract erases them to `InternalRow`;
    * `FileSourceScanExec.doExecuteColumnar` performs the same cast).
    * Callers must have checked [[supportBatch]] on
    * `requiredSchema ++ partitionSchema` first.
    */
  def buildBatchReader(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter]): FileReader = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    new ParquetFileFormat().buildReaderWithPartitionValues(
      classic, dataSchema, partitionSchema, requiredSchema, filters,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "true"),
      classic.sessionState.newHadoopConf())
  }

  /** A whole-file `PartitionedFile` for `path` with the given hive
    * partition values.
    */
  def partitionedFile(partitionValues: InternalRow, path: String,
      fileSize: Long): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(path),
      0L, fileSize)
}
