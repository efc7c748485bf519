package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.graftshim.ParquetRead
import org.apache.spark.sql.sources.{Filter, LessThan}
import org.apache.spark.sql.types._

import graft.core.{GraftTable, HiveDirValues, Meta, WarehouseIO}

/** Native bucket-grouped batch scan — the storage-partitioned-join
  * surface (the reference distributes every table by
  * `hash(bucketKeys) % numBuckets`, fluss-client/.../write/
  * HashBucketAssigner.java; this scan makes that physical layout VISIBLE
  * to Spark's planner instead of flattening it away). One
  * [[InputPartition]] per FILE, each reporting its bucket id as the
  * partition key under a `KeyGroupedPartitioning` over
  * `bucket(numBuckets, keys...)` resolved through
  * [[GraftBucketFunction]]; the exec side groups same-bucket files into
  * key-grouped tasks, pads buckets missing on one join side
  * (`v2.bucketing.pushPartValues`, default on), and — because the
  * per-file splits stay visible — `partiallyClusteredDistribution` can
  * split a SKEWED bucket across tasks instead of serializing the join
  * on its hottest key. With `spark.sql.sources.v2.bucketing.enabled`, a
  * join of two co-bucketed graft tables on their bucket keys then plans
  * with NO exchange on either side — at 100 TB the single biggest
  * shuffle in a fact-fact join disappears; so does the exchange under a
  * groupBy on the bucket keys.
  *
  * Two tiers behind one planner:
  *  - append (log) tables: the committed-visible log files, rows gated
  *    to the manifest's per-bucket published offset exactly like
  *    [[graft.core.GraftTable.logDF]] (a crashed commit's moved-but-
  *    unpublished rows never surface);
  *  - PK tables under `spark.sql.graft.read.optimized`: the KV snapshot
  *    tier (already collapsed, no gate) — the read-optimized scan with
  *    its bucketing preserved.
  *
  * Opt-in via `spark.sql.graft.read.preserve-data-grouping` (the
  * reference-lake pattern: Iceberg gates the same behavior behind
  * `preserve-data-grouping` because key-grouped planning caps scan
  * parallelism at the bucket count — right for big co-located joins,
  * wrong for a bare full scan). Filters stay best-effort: data-column
  * predicates push to parquet row groups, partition-dir equalities prune
  * files, and Spark re-applies everything as residuals above the scan.
  */
final class GraftKeyGroupedScan(table: GraftTable, required: StructType,
    filters: Array[Filter], snapshotTier: Boolean)
    extends Scan with Batch with SupportsReportPartitioning
    with SupportsReportStatistics {

  private val spark = table.sparkSession
  private val desc = table.desc
  private val bucketKeys = desc.effectiveBucketKeys

  // ---- schema split: dirs encode (partitionKeys, __bucket); files hold
  // the rest (identical layout on both tiers: compact() partitions the
  // snapshot exactly like the log) ----

  private val partitionFields: Array[StructField] =
    (desc.partitionKeys.map(k => desc.schema(desc.schema.fieldIndex(k))) :+
      StructField(Meta.Bucket, IntegerType, nullable = false)).toArray

  private val fileSchema: StructType =
    if (snapshotTier) StructType(desc.schema.fields.filterNot(f =>
      desc.partitionKeys.contains(f.name)))
    else StructType(table.logSchema.fields.filterNot(f =>
      desc.partitionKeys.contains(f.name) || f.name == Meta.Bucket))

  /** Log rows need the `__offset` visibility gate; snapshot rows are
    * final. The gate column is projected away after the row-level check.
    */
  private val requiredData = StructType(
    required.fields.filterNot(f =>
      desc.partitionKeys.contains(f.name) || f.name == Meta.Bucket) ++
      (if (snapshotTier || required.fieldNames.contains(Meta.Offset)) Nil
       else Seq(StructField(Meta.Offset, LongType, nullable = false))))

  private val combinedTypes: Array[DataType] =
    (requiredData.fields ++ partitionFields).map(_.dataType)

  private val outputOrdinals: Array[Int] = required.fields.map { f =>
    if (requiredData.fieldNames.contains(f.name))
      requiredData.fieldIndex(f.name)
    else requiredData.length + partitionFields.indexWhere(_.name == f.name)
  }

  private val offsetOrdinal =
    if (snapshotTier) -1 else requiredData.fieldIndex(Meta.Offset)

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(desc.numBuckets, bucketKeys: _*)),
      desc.numBuckets)

  override def planInputPartitions(): Array[InputPartition] = {
    val baseDir = if (snapshotTier) table.snapshotDirPath else table.logDirPath
    val entries: Seq[(String, Long)] =
      if (snapshotTier)
        WarehouseIO.walkFiles(baseDir)
          .filter(e => !e.isDir && e.name.endsWith(".parquet"))
          .map(e => e.path -> e.len)
      else table.visibleLogFileEntries()
    // partition-dir pruning from pushed equality predicates: only on
    // types whose dir encoding is the plain string form of the literal
    // (skipping a file is an optimization; keeping one is always safe —
    // Spark re-applies every filter above the scan)
    val eqs = GraftScanBuilder.equalities(filters).filter { case (c, _) =>
      desc.partitionKeys.contains(c) && (desc.schema(c).dataType match {
        case StringType | IntegerType | LongType | ShortType | ByteType => true
        case _ => false
      })
    }
    val hi: Map[Int, Long] =
      if (snapshotTier) Map.empty else table.latestOffsets
    val files = entries.flatMap { case (path, len) =>
      val kvs = HiveDirValues.kvsOf(WarehouseIO.relativize(baseDir, path))
      val bucket = kvs.getOrElse(Meta.Bucket,
        throw new IllegalStateException(
          s"file $path has no ${Meta.Bucket}= dir segment")).toInt
      val pruned = eqs.exists { case (c, v) =>
        kvs.get(c).exists(raw =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .unescapePathName(raw) != String.valueOf(v))
      }
      if (pruned) None
      else {
        val pv: Array[Any] = partitionFields.map { f =>
          if (f.name == Meta.Bucket) Int.box(bucket)
          else HiveDirValues.decode(kvs.get(f.name), f, spark)
        }
        Some((bucket, path, len, pv))
      }
    }
    val reader = ParquetRead.buildReader(spark, fileSchema,
      StructType(partitionFields), requiredData,
      // row-group skipping envelope; the exact per-bucket gate is
      // row-level in the reader (same contract as the streaming scan)
      dataFilters(hi))
    // ONE partition per FILE, not per bucket: the exec side groups
    // same-key partitions back into key-grouped tasks
    // (DataSourceV2ScanExecBase.groupedPartitions), missing bucket
    // values on one join side are padded by Spark's
    // v2.bucketing.pushPartValues (default on), and keeping per-file
    // splits visible is what lets partiallyClusteredDistribution split
    // a SKEWED bucket across tasks instead of serializing the join on
    // its hottest key
    files.map { case (bucket, path, len, pv) =>
      GraftBucketInputPartition(bucket, BucketFile(path, len, pv),
        offsetOrdinal, hi.getOrElse(bucket, 0L), outputOrdinals,
        combinedTypes, reader): InputPartition
    }.toArray
  }

  /** Pushed filters that live in the FILES (data columns only — dir
    * columns aren't in the parquet), plus the log-visibility ceiling.
    */
  private def dataFilters(hi: Map[Int, Long]): Seq[Filter] = {
    val dataCols = fileSchema.fieldNames.toSet
    val pushable = filters.filter(_.references.forall(dataCols.contains))
    val gate = if (snapshotTier || hi.isEmpty) Nil
    else Seq(LessThan(Meta.Offset, hi.values.max))
    pushable.toIndexedSeq ++ gate
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftBucketReaderFactory

  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val (bytes, rows) = table.plannerStats()
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): java.util.OptionalLong =
        rows.map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
    }
  }

  override def description(): String =
    s"GraftKeyGroupedScan(${table.path}, " +
      s"bucket(${desc.numBuckets}, ${bucketKeys.mkString(",")})" +
      (if (snapshotTier) ", snapshot-tier" else "") + ")"
}

/** One file of a bucket: path, size, catalyst-typed dir values. */
private[connector] final case class BucketFile(path: String, len: Long,
    partValues: Array[Any])

/** One file of one bucket; `partitionKey` is the bucket id — the value
  * of the reported `bucket(numBuckets, keys...)` grouping expression
  * (many files may share it; the exec groups them).
  */
private[connector] final case class GraftBucketInputPartition(bucket: Int,
    file: BucketFile, offsetOrdinal: Int, hi: Long,
    outputOrdinals: Array[Int], combinedTypes: Array[DataType],
    reader: ParquetRead.FileReader)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

private[connector] object GraftBucketReaderFactory
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketInputPartition]
    new PartitionReader[InternalRow] {
      // the parquet iterator registers its own task-completion close
      private val rows = p.reader(ParquetRead.partitionedFile(
        new GenericInternalRow(p.file.partValues), p.file.path, p.file.len))
      private val proj = UnsafeProjection.create(
        p.outputOrdinals.toIndexedSeq.map(i =>
          BoundReference(i, p.combinedTypes(i), nullable = true)))
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (rows.hasNext) {
          val r = rows.next()
          // pushed filters only skip row groups; the exact manifest
          // gate is row-level (ordinal -1 = snapshot tier, no gate)
          if (p.offsetOrdinal < 0 || r.getLong(p.offsetOrdinal) < p.hi) {
            current = proj(r)
            return true
          }
        }
        false
      }

      override def get(): InternalRow = current

      override def close(): Unit = ()
    }
  }
}
