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

  /** Rollback epoch pinned with (and READ BEFORE) the offsets — the
    * compact() ABA pattern: a concurrent rollback rewinds offsets and
    * later commits may re-advance them to (or past) the pinned values,
    * making `current == pinned` a lie — the reused offset range holds
    * DIFFERENT rows than the scan saw, invisible to
    * `committedRowsSince(pinned)`. Any epoch change between the pin and
    * the commit makes conflicts unprovable and fails the statement.
    */
  @volatile private[connector] var scanPinnedEpoch: Option[Long] = None

  /** Every scan builder the statement planned through — their pushed
    * filters reconstruct the statement's target predicate for the
    * SERIALIZABLE isolation phantom check.
    */
  private val builders =
    new java.util.concurrent.CopyOnWriteArrayList[GraftScanBuilder]()

  override def command(): RowLevelOperation.Command = cmd

  /** The rewrite reads the target through the table's ordinary scan —
    * merge-on-read current state, pushdowns, grouping and all. The FIRST
    * scan build pins the manifest state (a runtime group-filter scan may
    * build again later; the earliest pin is the conservative one — it
    * can only widen the overlap check, never miss a commit).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    if (scanPinnedOffsets.isEmpty) {
      // epoch BEFORE offsets: pinning them in the other order could pin
      // a pre-rollback epoch against post-rollback offsets, which the
      // commit-time equality check would then wrongly validate
      scanPinnedEpoch = Some(gt.rollbackEpoch)
      scanPinnedOffsets = Some(gt.latestOffsets)
    }
    val b = dsTable.newScanBuilder(options)
    b match {
      case g: GraftScanBuilder => builders.add(g)
      case _ =>
    }
    b
  }

  /** The statement's pushed target predicate, as ONE Column — the
    * phantom-detection input under SERIALIZABLE isolation. Pushed
    * filters are a (possibly empty) SUBSET of the WHERE's conjuncts, so
    * the reconstruction is WIDER than the true predicate — it can only
    * flag more rows as phantoms, never miss one the true predicate
    * matches. No builders / no pushed filters → None, and the caller
    * falls back to "any committed row is a phantom" (maximally
    * conservative). Multiple scan builds OR together (each is already a
    * widening of the same statement predicate).
    */
  private[connector] def pushedTargetPredicate
      : Option[org.apache.spark.sql.Column] = {
    import scala.jdk.CollectionConverters._
    val perBuild = builders.asScala.toSeq.map { b =>
      val fs = b.pushedFilters().toSeq
      if (fs.isEmpty) None
      else fs.flatMap(GraftScanBuilder.toColumn)
        .reduceOption(_ && _)
    }
    if (perBuild.isEmpty || perBuild.exists(_.isEmpty)) None
    else perBuild.flatten.reduceOption(_ || _)
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
          GraftRowLevelOperation.this)
    }

  override def description(): String =
    s"GraftRowLevelOperation($cmd, ${gt.path})"
}

/** The delta write: stage → conflict-check → one mixed merge commit,
  * with bounded optimistic retry ([[GraftRowLevel.checkAndApply]]).
  */
private[connector] final class GraftDeltaWrite(gt: GraftTable,
    info: LogicalWriteInfo, spark: SparkSession,
    op: GraftRowLevelOperation)
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
        op.scanPinnedOffsets.getOrElse(gt.latestOffsets),
        pinnedEpoch = op.scanPinnedEpoch,
        targetPredicate = op.pushedTargetPredicate,
        serializable = GraftRowLevel.serializableIsolation(spark))
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
  * Isolation ladder (`spark.sql.graft.dml.isolation`, the
  * Delta/Iceberg two-level shape):
  *
  * | level | conflict = fail loudly | tolerated |
  * |---|---|---|
  * | `write-serializable` (default) | commits since the scan touching the statement's WRITE SET; rollback during the window (epoch change); vacuum past the pin | predicate phantoms: a row another commit moved into the WHERE range after the scan |
  * | `serializable` | all of the above, PLUS any committed row matching the statement's pushed target predicate (phantom protection); with nothing pushed, ANY commit since the scan | — |
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
  *  - under the DEFAULT level, reads the statement did OUTSIDE its
  *    write set (predicate phantoms) are not conflict-checked —
  *    write-set serializability, the WriteSerializable posture of the
  *    lake formats. Under `serializable`, the phantom check evaluates
  *    the pushed predicate over every changelog row committed since the
  *    pin (+I/+U new images and, on FULL-image tables, -U/-D
  *    pre-images); predicate conjuncts that could not push make the
  *    check WIDER (more conservative), never narrower.
  *  - a concurrent ROLLBACK always fails the statement (both levels):
  *    rollback can rewind offsets that later commits re-advance, so the
  *    offset ranges the overlap check reads may hold different rows
  *    than the scan saw (ABA) — the pinned rollback epoch detects this
  *    and conflicts become unprovable.
  *
  * Cost: the overlap/phantom checks run ONLY when offsets actually
  * advanced since the pin (a manifest compare — free in the common
  * case), and then scan only rows at/above the pinned offsets
  * (row-group pruned tail, not the table).
  */
private[connector] object GraftRowLevel {

  private val MaxRetries = 3

  /** `spark.sql.graft.dml.isolation`: `write-serializable` (default) or
    * `serializable`.
    */
  private[connector] def serializableIsolation(spark: SparkSession): Boolean =
    spark.conf.get("spark.sql.graft.dml.isolation", "write-serializable")
      .toLowerCase(java.util.Locale.ROOT) match {
      case "serializable" => true
      case "write-serializable" | "writeserializable" => false
      case other => throw new IllegalArgumentException(
        s"spark.sql.graft.dml.isolation must be 'write-serializable' or " +
          s"'serializable'; got '$other'")
    }

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
    * `pinnedEpoch` is the rollback epoch read when the scan pinned its
    * offsets (None for engine-API callers that never pinned one);
    * `targetPredicate`/`serializable` drive the phantom check.
    */
  private[connector] def checkAndApply(gt: GraftTable,
      batch: org.apache.spark.sql.DataFrame,
      pinned: Map[Int, Long],
      pinnedEpoch: Option[Long] = None,
      targetPredicate: Option[org.apache.spark.sql.Column] = None,
      serializable: Boolean = false): Unit = {
    var attempt = 0
    while (true) {
      // epoch BEFORE offsets (the compact() ABA pattern): if the epoch
      // still equals the pin AFTER this read, no rollback has run since
      // the scan, so the offsets read next are monotonic successors of
      // the pinned ones and the range [pinned, current) really holds
      // exactly what landed since the scan. Without this, a rollback
      // that rewound and was then re-advanced to == pinned would skip
      // every check below, and one re-advanced PAST the pin would reuse
      // offset ranges committedRowsSince can't tell apart — a stale
      // delta would silently apply.
      val epochNow = gt.rollbackEpoch
      val current = gt.latestOffsets
      pinnedEpoch.foreach { e =>
        if (epochNow != e) throw new java.util.ConcurrentModificationException(
          s"a rollback on ${gt.path} overlapped this statement's scan " +
            "window; offset ranges may have been reused — conflicts are " +
            "unprovable, re-run the statement against current state")
      }
      // the overlap check reads the LOG at/above the pin — it is only
      // SOUND while those rows are still all in the log. Maintenance
      // that moved them out (compact+vacuum advancing the retained
      // floor past the pin) or erased them (rollback rewinding offsets
      // below the pin — also caught epoch-first above when the caller
      // pinned one) makes overlap unprovable: refuse loudly instead
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
        if (serializable) {
          // SERIALIZABLE phantom check: any committed row matching the
          // statement's target predicate means the scan would read
          // differently now — no serial order exists where this delta
          // is still the statement's output. With nothing pushed, ANY
          // commit since the pin conflicts (maximally conservative).
          val since = gt.committedRowsSince(pinned)
          val phantoms = targetPredicate.fold(since)(since.filter(_))
          if (!phantoms.isEmpty)
            throw new java.util.ConcurrentModificationException(
              s"rows matching this statement's predicate were committed " +
                s"on ${gt.path} since its scan (phantom under " +
                "SERIALIZABLE isolation); re-run the statement against " +
                "current state")
        }
      }
      if (current != pinned && overlapCount(gt, batch, pinned) > 0L)
        throw new java.util.ConcurrentModificationException(
          s"rows this statement modifies on ${gt.path} were concurrently " +
            "updated since its scan; re-run the statement against current " +
            "state (write-set conflict, first committer wins)")
      try {
        gt.upsertMixedIfUnchanged(batch, Seq(batch("__seq")), current,
          expectedEpoch = pinnedEpoch.map(_ => epochNow))
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
