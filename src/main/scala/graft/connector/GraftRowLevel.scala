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

  /** Per-bucket offsets pinned when the statement's TARGET SCAN was
    * built — the manifest state the delta was derived from. The write's
    * conflict check validates against THIS pin, not the offsets at
    * commit start, closing the scan→commit window where a concurrent
    * commit to the same keys would otherwise last-win silently.
    */
  @volatile private[connector] var scanPinnedOffsets:
      Option[Map[Int, Long]] = None

  override def command(): RowLevelOperation.Command = cmd

  /** The rewrite reads the target through the table's ordinary scan —
    * merge-on-read current state, pushdowns, grouping and all. The FIRST
    * scan build pins the manifest state (a runtime group-filter scan may
    * build again later; the earliest pin is the conservative one — it
    * can only widen the overlap check, never miss a commit).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (scanPinnedOffsets.isEmpty)
      scanPinnedOffsets = Some(gt.latestOffsets)
    dsTable.newScanBuilder(options)
  }

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
        new GraftDeltaWrite(gt, info, SparkSession.active,
          () => scanPinnedOffsets)
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, ${gt.path})"
}

/** The delta write: stage → conflict-check → one mixed merge commit,
  * with bounded optimistic retry ([[GraftRowLevel.checkAndApply]]).
  */
private[connector] final class GraftDeltaWrite(gt: GraftTable,
    info: LogicalWriteInfo, spark: SparkSession,
    pinnedOffsets: () => Option[Map[Int, Long]])
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
      GraftRowLevel.checkAndApply(gt, batch,
        pinnedOffsets().getOrElse(gt.latestOffsets))
    } finally cleanup()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = cleanup()

  private def cleanup(): Unit =
    try WarehouseIO.deleteRecursively(stagingRoot)
    catch { case _: Exception => () }

  override def toString: String = s"GraftDeltaWrite(${gt.path})"
}

/** Optimistic concurrency for the row-level SQL commit: write-set
  * overlap detection against the statement's pinned scan state, plus a
  * bounded retry for non-overlapping races.
  *
  * Semantics (documented contract):
  *  - two concurrent statements touching DISJOINT key sets both commit,
  *    no user retry: the loser's delta is unaffected by the winner's
  *    rows, so re-staging against the new state is exact;
  *  - a statement whose write set OVERLAPS rows committed since its scan
  *    fails loudly (`ConcurrentModificationException`) — its delta was
  *    derived from values the other statement replaced, and applying it
  *    would silently lose that update. The user re-runs the statement
  *    (which re-reads current state). First-committer-wins, the same
  *    posture as Delta/Iceberg serializable conflict detection.
  *  - reads the statement did OUTSIDE its write set (predicate phantoms:
  *    a row another commit moved INTO the WHERE clause after the scan)
  *    are not conflict-checked — write-set serializability, the
  *    WriteSerializable posture of the lake formats.
  *
  * Cost: the overlap check runs ONLY when offsets actually advanced
  * since the pin (a manifest compare — free in the common case), and
  * then scans only rows at/above the pinned offsets (row-group pruned
  * tail, not the table).
  */
private[connector] object GraftRowLevel {

  private val MaxRetries = 3

  /** Keys of `sinceRows` that intersect the staged delta's keys. */
  private[connector] def overlapCount(gt: GraftTable,
      staged: org.apache.spark.sql.DataFrame,
      pinned: Map[Int, Long]): Long = {
    val pk = gt.desc.primaryKey
    gt.committedRowsSince(pinned)
      .select(pk.map(col): _*).distinct()
      .join(staged.select(pk.map(col): _*).distinct(), pk, "left_semi")
      .count()
  }

  /** Validate-then-commit with bounded jittered retry. `batch` carries
    * `__seq`/`__delete` plus the data columns (the staged delta).
    */
  private[connector] def checkAndApply(gt: GraftTable,
      batch: org.apache.spark.sql.DataFrame,
      pinned: Map[Int, Long]): Unit = {
    var attempt = 0
    while (true) {
      val current = gt.latestOffsets
      // the overlap check reads the LOG at/above the pin — it is only
      // SOUND while those rows are still all in the log. Maintenance
      // that moved them out (compact+vacuum advancing the retained
      // floor past the pin) or erased them (rollback rewinding offsets
      // below the pin) makes overlap unprovable: refuse loudly instead
      // of silently applying a delta whose conflicts we cannot see.
      if (current != pinned) {
        val floors = gt.retainedFloorOffsets.getOrElse(Map.empty)
        val unprovable =
          floors.exists { case (b, f) => f > pinned.getOrElse(b, 0L) } ||
            pinned.exists { case (b, o) => current.getOrElse(b, 0L) < o }
        if (unprovable) throw new java.util.ConcurrentModificationException(
          s"table maintenance (vacuum/rollback) on ${gt.path} overlapped " +
            "this statement's scan window; conflicts are unprovable — " +
            "re-run the statement against current state")
      }
      if (current != pinned && overlapCount(gt, batch, pinned) > 0L)
        throw new java.util.ConcurrentModificationException(
          s"rows this statement modifies on ${gt.path} were concurrently " +
            "updated since its scan; re-run the statement against current " +
            "state (write-set conflict, first committer wins)")
      try {
        gt.upsertMixedIfUnchanged(batch, Seq(batch("__seq")), current)
        return
      } catch {
        case e: java.util.ConcurrentModificationException =>
          // a commit raced our write; if it doesn't overlap our keys the
          // retry re-merges against the new state exactly — bounded, so
          // a pathological commit storm still surfaces loudly
          attempt += 1
          if (attempt > MaxRetries) throw e
          Thread.sleep(25L + scala.util.Random.nextInt(100))
      }
    }
  }
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
