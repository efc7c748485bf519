package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The format face of the lake-tiering path — what
  * [[GraftTable.tierSnapshot]] needs from a lake format, with one
  * implementation per metadata layout (the reference's
  * fluss-lake/fluss-lake-* modules behind its common tiering service).
  * Everything else about tiering — delta-window computation, staging,
  * publish, crash roll-forward, the export manifest — is
  * format-independent and lives in [[GraftTable]].
  */
private[graft] sealed trait LakeFormatOps {
  def name: String
  /** Lake metadata exists at `dir` (vs a bare-parquet export). */
  def hasMetadata(dir: String): Boolean
  /** Dir-relative live data files of the current snapshot/version (the
    * session lets Delta resolve through its parquet checkpoints).
    */
  def liveFiles(spark: SparkSession, dir: String): Seq[String]
  /** Tier bookkeeping of the LATEST commit (Iceberg snapshot summary /
    * Delta commitInfo tags): where [[GraftTable.TierOffsetsKey]] rides.
    */
  def committedTierTags(dir: String): Map[String, String]
  /** Append one snapshot/version: adds + removes + tier tags.
    * `priorLive` is the live set the caller just resolved under this
    * format's lock — Delta reuses it instead of replaying the log a
    * second time for remove validation; Iceberg reads its own metadata
    * regardless.
    */
  def commit(spark: SparkSession, dir: String, schema: StructType,
      partitionKeys: Seq[String], added: Seq[(String, Long)],
      removed: Set[String], sourcePath: String,
      tags: Map[String, String], priorLive: Seq[String]): Unit
  /** The current state as a DataFrame, resolved through the metadata. */
  def readLive(spark: SparkSession, dir: String): DataFrame
  /** Expire all but the last `keepLast` snapshots/versions and delete
    * data files unreachable from the retained ones; returns the
    * dir-relative files deleted (the [[LakeMaintenance]] auto-expiry
    * hook — without it a freshness-scheduled tiering loop grows the lake
    * monotonically).
    */
  def expireHistory(spark: SparkSession, dir: String,
      keepLast: Int): Seq[String]
  /** The format's lake lock for `dir` (re-entrant, heartbeated). */
  def withLock[T](dir: String)(body: => T): T
}

private[graft] object LakeFormatOps {

  /** Empty-lake read: a zero-row export (a table tiered before its
    * first commit) has no data file to infer a schema from, so the
    * format readers fall back to the schema the export manifest pinned
    * atomically alongside the metadata — Spark StructType JSON plus, on
    * a bucket-aligned layout, the `__bucket` partition column. A dir
    * with format metadata but NO manifest (hand-rolled, or a crash
    * before the manifest write) fails naming the real condition —
    * falling through to a zero-path `spark.read.parquet()` would
    * surface as Spark's opaque 'Unable to infer schema for Parquet'.
    */
  private[core] def emptyRead(spark: SparkSession, dir: String,
      fmtName: String): DataFrame =
    emptyReadOpt(spark, dir).getOrElse(throw new IllegalStateException(
      s"$dir has $fmtName metadata but no live data files and no " +
        "_export_manifest.json to pin a schema; only " +
        "tierSnapshot/exportSnapshot-published lakes are readable empty"))

  private def emptyReadOpt(spark: SparkSession,
      dir: String): Option[DataFrame] =
    WarehouseIO.readStringIfExists(s"$dir/_export_manifest.json").map { s =>
      val em = org.json4s.jackson.JsonMethods.parse(s)
        .asInstanceOf[org.json4s.JObject].obj.toMap
      val base = org.apache.spark.sql.types.DataType.fromJson(
        org.json4s.jackson.JsonMethods.compact(
          org.json4s.jackson.JsonMethods.render(em("schema"))))
        .asInstanceOf[StructType]
      val schema =
        if (em.get("layout").contains(org.json4s.JString("bucket")))
          StructType(base.fields :+ org.apache.spark.sql.types.StructField(
            Meta.Bucket, org.apache.spark.sql.types.IntegerType))
        else base
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  def of(format: String): LakeFormatOps = format.trim.toLowerCase match {
    case "iceberg" => Iceberg
    case "delta" => Delta
    case "paimon" => Paimon
    case "hudi" => Hudi
    case other => throw new IllegalArgumentException(
      s"unknown lake format '$other' (supported: iceberg, delta, paimon, " +
        "hudi)")
  }

  object Iceberg extends LakeFormatOps {
    def name = "iceberg"
    def hasMetadata(dir: String): Boolean =
      IcebergExport.currentVersion(dir).isDefined
    def liveFiles(spark: SparkSession, dir: String): Seq[String] =
      IcebergExport.liveFiles(dir)
    def committedTierTags(dir: String): Map[String, String] =
      IcebergExport.currentSnapshotSummary(dir)
    def commit(spark: SparkSession, dir: String, schema: StructType,
        partitionKeys: Seq[String], added: Seq[(String, Long)],
        removed: Set[String], sourcePath: String,
        tags: Map[String, String], priorLive: Seq[String]): Unit = {
      IcebergExport.commit(spark, dir, schema, partitionKeys, added,
        removed, sourcePath, summaryExtra = tags)
      ()
    }
    def readLive(spark: SparkSession, dir: String): DataFrame =
      IcebergExport.readLive(spark, dir)
    def expireHistory(spark: SparkSession, dir: String,
        keepLast: Int): Seq[String] =
      IcebergExport.expireSnapshots(dir, keepLast)
    def withLock[T](dir: String)(body: => T): T =
      IcebergExport.withLakeLock(dir)(body)
  }

  object Delta extends LakeFormatOps {
    def name = "delta"
    def hasMetadata(dir: String): Boolean =
      DeltaExport.currentVersion(dir).isDefined
    def liveFiles(spark: SparkSession, dir: String): Seq[String] =
      DeltaExport.liveFiles(dir, Some(spark))
    def committedTierTags(dir: String): Map[String, String] =
      DeltaExport.lastCommitTags(dir)
    def commit(spark: SparkSession, dir: String, schema: StructType,
        partitionKeys: Seq[String], added: Seq[(String, Long)],
        removed: Set[String], sourcePath: String,
        tags: Map[String, String], priorLive: Seq[String]): Unit = {
      DeltaExport.commit(dir, schema, partitionKeys, added, removed,
        sourcePath, tags, checkpointWith = Some(spark),
        knownLive = Some(priorLive.toSet))
      ()
    }
    def readLive(spark: SparkSession, dir: String): DataFrame =
      DeltaExport.readLive(spark, dir)
    def expireHistory(spark: SparkSession, dir: String,
        keepLast: Int): Seq[String] =
      DeltaExport.expireVersions(spark, dir, keepLast)
    def withLock[T](dir: String)(body: => T): T =
      DeltaExport.withDeltaLock(dir)(body)
  }

  object Paimon extends LakeFormatOps {
    def name = "paimon"
    def hasMetadata(dir: String): Boolean =
      PaimonExport.currentSnapshotId(dir).isDefined
    def liveFiles(spark: SparkSession, dir: String): Seq[String] =
      PaimonExport.liveFiles(dir)
    def committedTierTags(dir: String): Map[String, String] =
      PaimonExport.lastSnapshotProperties(dir)
    def commit(spark: SparkSession, dir: String, schema: StructType,
        partitionKeys: Seq[String], added: Seq[(String, Long)],
        removed: Set[String], sourcePath: String,
        tags: Map[String, String], priorLive: Seq[String]): Unit = {
      // priorLive carries no sizes and the Paimon base manifest needs
      // them; the re-resolution inside commit() is one avro read under
      // the same re-entrant lock
      PaimonExport.commit(dir, schema, partitionKeys, added, removed,
        sourcePath, tags)
      ()
    }
    def readLive(spark: SparkSession, dir: String): DataFrame =
      PaimonExport.readLive(spark, dir)
    def expireHistory(spark: SparkSession, dir: String,
        keepLast: Int): Seq[String] =
      PaimonExport.expireSnapshots(dir, keepLast)
    def withLock[T](dir: String)(body: => T): T =
      PaimonExport.withPaimonLock(dir)(body)
  }

  object Hudi extends LakeFormatOps {
    def name = "hudi"
    def hasMetadata(dir: String): Boolean =
      HudiExport.currentInstant(dir).isDefined
    def liveFiles(spark: SparkSession, dir: String): Seq[String] =
      HudiExport.liveFiles(dir)
    def committedTierTags(dir: String): Map[String, String] =
      HudiExport.lastCommitExtraMetadata(dir)
    def commit(spark: SparkSession, dir: String, schema: StructType,
        partitionKeys: Seq[String], added: Seq[(String, Long)],
        removed: Set[String], sourcePath: String,
        tags: Map[String, String], priorLive: Seq[String]): Unit = {
      // priorLive carries paths but the replacecommit needs the replaced
      // file groups' fileIds; the re-resolution inside commit() is one
      // timeline replay under the same re-entrant lock
      HudiExport.commit(dir, schema, partitionKeys, added, removed,
        sourcePath, tags)
      ()
    }
    def readLive(spark: SparkSession, dir: String): DataFrame =
      HudiExport.readLive(spark, dir)
    def expireHistory(spark: SparkSession, dir: String,
        keepLast: Int): Seq[String] =
      HudiExport.expireInstants(dir, keepLast)
    def withLock[T](dir: String)(body: => T): T =
      HudiExport.withHudiLock(dir)(body)
  }
}
