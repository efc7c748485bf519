package graft.connector

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftshim.{ParquetStage, ParquetStageFactory}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.core.{GraftTable, WarehouseIO}

/** SQL `UPDATE` / `MERGE INTO` / subquery `DELETE` on PK catalog tables —
  * Spark's DELTA-based row-level operation framework
  * (`SupportsRowLevelOperations` + `SupportsDelta`), which fits a
  * keyed upsert log exactly: the "delta" Spark hands the write IS a CDC
  * batch, and applying it is the engine's ordinary mixed merge commit
  * (`GraftTable.upsertMixed`) — one atomic, offset-tagged batch emitting
  * the same `+U`/`-D` changelog every other write path emits. No files
  * are rewritten (the group-based COW alternative fits file-replacing
  * lakes, not a log-structured table).
  *
  * Row IDs are the PRIMARY KEY — Spark's rewrite joins target rows to
  * source rows and guarantees each key appears at most once per
  * statement (the MERGE cardinality check), so the merge batch needs no
  * intra-batch ordering.
  *
  * Execution is two-phase like every engine commit: executors stage
  * `(op, row)` records as ordinary parquet ([[ParquetStage]], the
  * streaming sink's machinery), the driver-side commit applies them
  * through the table's own distributed merge write. Nothing data-scale
  * touches the driver.
  *
  * Plain `DELETE FROM t WHERE <translatable>` still takes the
  * metadata-only path: Spark's `OptimizeMetadataOnlyDeleteFromTable`
  * converts the rewritten plan back to [[GraftDsTable.deleteWhere]] when
  * every predicate pushes, so simple deletes never scan. This class is
  * the path for everything that CAN'T: UPDATE, MERGE, and deletes whose
  * predicate needs a join or subquery.
  *
  * The reference has no SQL row-level surface (its Spark connector is
  * read/append); this is the "beyond the reference" SQL form of the
  * engine-API `updateWhere`/`mergeInto` (RL1/RL2).
  */
private[connector] final class GraftRowLevelOperation(dsTable: GraftDsTable,
    cmd: RowLevelOperation.Command) extends SupportsDelta {

  private def gt: GraftTable = dsTable.table

  override def command(): RowLevelOperation.Command = cmd

  /** The rewrite reads the target through the table's ordinary scan —
    * merge-on-read current state, pushdowns, grouping and all.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    dsTable.newScanBuilder(options)

  override def rowId(): Array[NamedReference] =
    gt.desc.primaryKey.map(Expressions.column).toArray

  /** UPDATEs arrive as delete(old id) + reinsert(new row): SQL may SET a
    * PRIMARY KEY column, and an upsert of the new row alone would strand
    * the old key. The staged `__seq` (delete=0, upsert=1) orders the
    * pair inside the merge batch so the reinsert wins.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = true

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(gt, info, SparkSession.active)
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, ${gt.path})"
}

/** The delta write: stage → one mixed merge commit. */
private[connector] final class GraftDeltaWrite(gt: GraftTable,
    info: LogicalWriteInfo, spark: SparkSession)
    extends DeltaWrite with DeltaBatchWrite {

  // staged record: __seq (0 delete / 1 upsert — the intra-batch merge
  // order, so an update's delete+reinsert pair resolves to the new row)
  // + every data column, nullable (delete records carry the key, null
  // elsewhere — the same convention as GraftTable.delete)
  private val stagedSchema = StructType(
    StructField("__seq", LongType, nullable = false) +:
      gt.desc.schema.fields.map(_.copy(nullable = true)))

  private val stagingRoot =
    s"${gt.path}/_rowlevel_staging/${info.queryId()}"

  override def toBatch: DeltaBatchWrite = this

  override def createBatchWriterFactory(
      pInfo: PhysicalWriteInfo): DeltaWriterFactory = {
    def ordinalsOf(s: StructType): (Array[Int], Array[DataType]) = (
      s.fields.map(f => 1 + gt.desc.schema.fieldIndex(f.name)),
      s.fields.map(_.dataType))
    val (dataOrd, dataTypes) = ordinalsOf(info.schema())
    val (idOrd, idTypes) = ordinalsOf(info.rowIdSchema()
      .orElseThrow(() => new IllegalStateException(
        "delta write without a rowId schema")))
    new GraftDeltaWriterFactory(
      ParquetStage.prepare(spark, stagedSchema, stagingRoot),
      stagedSchema.length, dataOrd, dataTypes, idOrd, idTypes)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    try {
      val files = messages.iterator
        .collect { case StagedFiles(ps) => ps }.flatten.toSeq
      if (files.isEmpty) return
      val staged = spark.read.schema(stagedSchema).parquet(files: _*)
      val batch = staged.withColumn("__delete", col("__seq") === lit(0L))
      // ONE atomic mixed merge commit. Keys appear at most once per
      // statement (Spark's MERGE cardinality guarantee) EXCEPT an
      // update's delete+reinsert pair, which __seq orders (delete 0,
      // reinsert 1 — last write wins, so the new row survives)
      gt.upsertMixed(batch, orderBy = Seq(batch("__seq")))
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try WarehouseIO.deleteRecursively(stagingRoot)
    catch { case _: Exception => () }

  override def toString: String = s"GraftDeltaWrite(${gt.path})"
}

/** Executor side: each task stages its delta records into one uniquely
  * named parquet file; only committed attempts report their file
  * (speculation/retry fencing, same as the streaming sink).
  */
private[connector] final class GraftDeltaWriterFactory(
    factory: ParquetStageFactory, stagedLen: Int,
    dataOrd: Array[Int], dataTypes: Array[DataType],
    idOrd: Array[Int], idTypes: Array[DataType]) extends DeltaWriterFactory {

  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val w = factory.open(0L, partitionId, taskId)
      private var done = false

      // copy-through-write: values are taken from (possibly reused)
      // input rows and serialized to parquet within the same call
      private def stage(seq: Long, src: InternalRow, ord: Array[Int],
          types: Array[DataType]): Unit = {
        val out = new Array[Any](stagedLen)
        out(0) = Long.box(seq)
        var i = 0
        while (i < ord.length) {
          if (!src.isNullAt(i)) out(ord(i)) = src.get(i, types(i))
          i += 1
        }
        w.write(new GenericInternalRow(out))
      }

      override def insert(row: InternalRow): Unit =
        stage(1L, row, dataOrd, dataTypes)

      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        // defensive: representUpdateAsDeleteAndInsert routes updates
        // through delete+reinsert, so this is never called — but the
        // safe form (old key out, new row in) costs nothing to keep
        stage(0L, id, idOrd, idTypes)
        stage(1L, row, dataOrd, dataTypes)
      }

      override def delete(meta: InternalRow, id: InternalRow): Unit =
        stage(0L, id, idOrd, idTypes)

      override def commit(): WriterCommitMessage = {
        val p = w.closeAndGetPath()
        done = true
        StagedFiles(Seq(p))
      }

      override def abort(): Unit = close()

      override def close(): Unit = if (!done) {
        done = true
        try w.closeAndGetPath() catch { case _: Exception => () }
      }
    }
}
