package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Delta Lake transaction-log export — the second lake format of the
  * export layer, hand-built against the PUBLIC Delta protocol
  * (delta-io/delta PROTOCOL.md; protocol (1,2), JSON commit files) the
  * same way [[IcebergExport]] is built against the Iceberg v2 spec. The
  * reference ships one lake module per format
  * (fluss-lake/fluss-lake-{paimon,iceberg,lance,hudi}) behind a common
  * tiering service; this engine mirrors that shape with
  * [[LakeFormatOps]] dispatching between Iceberg and Delta.
  *
  * Log layout: `_delta_log/%020d.json`, one JSON action per line.
  * Version 0 carries `protocol` + `metaData` + the initial `add`s; each
  * tier appends a version with `commitInfo` (tier offsets ride in its
  * `tags`, the Iceberg-summary analog) + `add` / `remove` actions.
  * Commit files are published with a no-overwrite move — the protocol's
  * put-if-absent requirement — under the same [[LakeLock]] discipline
  * as the Iceberg path.
  *
  * `schemaString` IS Spark's StructType JSON (the protocol's schema
  * serialization format), `partitionValues` are the hive-unescaped
  * string values, and `path` is percent-encoded as a relative URI.
  */
object DeltaExport {

  private def logDir(dir: String): String = s"$dir/_delta_log"

  private def versionFile(dir: String, v: Long): String =
    f"${logDir(dir)}/$v%020d.json"

  private[core] def withDeltaLock[T](dir: String)(body: => T): T =
    LakeLock.withLock(s"${logDir(dir)}/_graft.lock")(body)

  /** Latest committed version, None when `dir` has no Delta log. */
  def currentVersion(dir: String): Option[Long] = {
    val ld = logDir(dir)
    if (!WarehouseIO.exists(ld)) return None
    val vs = WarehouseIO.listDir(ld).filter(!_.isDir).map(_.name)
      .filter(n => n.length == 25 && n.endsWith(".json"))
      .flatMap(n => scala.util.Try(n.stripSuffix(".json").toLong).toOption)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Initial export: version 0 with protocol + metaData + `files`
    * (dir-relative path → size) as add actions.
    */
  def write(dir: String, schema: StructType, partitionKeys: Seq[String],
      files: Seq[(String, Long)], sourcePath: String,
      tags: Map[String, String] = Map.empty): Long = withDeltaLock(dir) {
    require(currentVersion(dir).isEmpty,
      s"$dir already has a Delta log; use commit() to append a version")
    val now = System.currentTimeMillis()
    val meta: Seq[JValue] = Seq(
      JObject(List("protocol" -> JObject(List(
        "minReaderVersion" -> JInt(1), "minWriterVersion" -> JInt(2))))),
      JObject(List("metaData" -> JObject(List(
        "id" -> JString(java.util.UUID.randomUUID().toString),
        "name" -> JString(sourcePath.split('/').last),
        "format" -> JObject(List("provider" -> JString("parquet"),
          "options" -> JObject(Nil))),
        "schemaString" -> JString(schema.json),
        "partitionColumns" -> JArray(
          partitionKeys.toList.map(JString(_))),
        "configuration" -> JObject(Nil),
        "createdTime" -> JInt(now))))))
    publish(dir, 0L, meta ++ files.map(addAction(_, partitionKeys, now)) :+
      commitInfo("WRITE", now, tags))
    0L
  }

  /** Append one version: `addedFiles` become adds, `removedRels` become
    * removes (validated against the live set). First call on a fresh dir
    * delegates to [[write]].
    */
  def commit(dir: String, schema: StructType, partitionKeys: Seq[String],
      addedFiles: Seq[(String, Long)], removedRels: Set[String],
      sourcePath: String,
      tags: Map[String, String] = Map.empty): Long = withDeltaLock(dir) {
    currentVersion(dir) match {
      case None =>
        require(removedRels.isEmpty,
          s"cannot remove files from $dir: no prior Delta version exists " +
            s"to remove them from (asked to remove ${removedRels.size} file(s))")
        write(dir, schema, partitionKeys, addedFiles, sourcePath, tags)
      case Some(v) =>
        val live = liveFiles(dir).toSet
        val missing = removedRels.filterNot(live.contains)
        require(missing.isEmpty,
          s"cannot remove file(s) not live in $dir's current version: " +
            missing.toSeq.sorted.take(5).mkString(", "))
        val now = System.currentTimeMillis()
        val removes: Seq[JValue] = removedRels.toSeq.sorted.map { rel =>
          JObject(List("remove" -> JObject(List(
            "path" -> JString(encodePath(rel)),
            "deletionTimestamp" -> JInt(now),
            "dataChange" -> JBool(true)))))
        }
        publish(dir, v + 1,
          (removes ++ addedFiles.map(addAction(_, partitionKeys, now))) :+
            commitInfo(if (removedRels.nonEmpty) "OVERWRITE" else "WRITE",
              now, tags))
        v + 1
    }
  }

  /** Dir-relative live data files of the CURRENT version, resolved by
    * log replay the way a Delta reader would (adds minus later removes)
    * — never from directory listing.
    */
  def liveFiles(dir: String): Seq[String] = replay(dir)._3.keys.toSeq.sorted

  /** The current version's data as a DataFrame: live files from the log,
    * hive partition columns re-attached via basePath — the "Delta reader
    * lite" that proves the log is self-consistent.
    */
  def readLive(spark: SparkSession, dir: String): DataFrame = {
    val files = liveFiles(dir).map(r => s"${WarehouseIO.qualify(dir)}/$r")
    spark.read.option("basePath", WarehouseIO.qualify(dir))
      .parquet(files: _*)
  }

  /** `commitInfo.tags` of the LATEST version (the Iceberg snapshot-
    * summary analog — [[GraftTable.tierSnapshot]] pins its offset window
    * here). Empty when the dir has no Delta log.
    */
  def lastCommitTags(dir: String): Map[String, String] =
    currentVersion(dir).map { v =>
      actionsOf(dir, v).flatMap {
        case JObject(fields) => fields.toMap.get("commitInfo")
        case _ => None
      }.collectFirst { case JObject(ci) =>
        ci.toMap.get("tags") match {
          case Some(JObject(ts)) =>
            ts.collect { case (k, JString(s)) => k -> s }.toMap
          case _ => Map.empty[String, String]
        }
      }.getOrElse(Map.empty)
    }.getOrElse(Map.empty)

  // -------------------------------------------------------------------

  /** (schemaString, partitionColumns, live rel path → size). */
  private def replay(dir: String)
      : (String, Seq[String], Map[String, Long]) = {
    val v = currentVersion(dir).getOrElse(throw new IllegalArgumentException(
      s"$dir has no Delta log (_delta_log/ missing or empty)"))
    var schemaString = ""
    var partitionCols = Seq.empty[String]
    val live = collection.mutable.LinkedHashMap[String, Long]()
    (0L to v).foreach { i =>
      actionsOf(dir, i).foreach {
        case JObject(fields) => fields.toMap.foreach {
          case ("metaData", JObject(m)) =>
            val mm = m.toMap
            schemaString = mm("schemaString").asInstanceOf[JString].s
            partitionCols = mm("partitionColumns").asInstanceOf[JArray]
              .arr.map(_.asInstanceOf[JString].s)
          case ("add", JObject(a)) =>
            val am = a.toMap
            live(decodePath(am("path").asInstanceOf[JString].s)) =
              am("size").asInstanceOf[JInt].num.toLong
          case ("remove", JObject(r)) =>
            live.remove(decodePath(r.toMap.apply("path")
              .asInstanceOf[JString].s))
            ()
          case _ => ()
        }
        case _ => ()
      }
    }
    (schemaString, partitionCols, live.toMap)
  }

  private def actionsOf(dir: String, v: Long): Seq[JValue] =
    WarehouseIO.readString(versionFile(dir, v)).split('\n')
      .map(_.trim).filter(_.nonEmpty).toSeq.map(JsonMethods.parse(_))

  private def addAction(file: (String, Long), partitionKeys: Seq[String],
      now: Long): JValue = {
    val (rel, size) = file
    val pv: List[(String, JValue)] = rel.split('/').dropRight(1).toList
      .flatMap { seg =>
        seg.split("=", 2) match {
          case Array(k, raw) if partitionKeys.contains(k) =>
            val dec = org.apache.spark.sql.catalyst.catalog
              .ExternalCatalogUtils.unescapePathName(raw)
            Some(k -> (if (dec == "__HIVE_DEFAULT_PARTITION__") JNull
                       else JString(dec): JValue))
          case _ => None
        }
      }
    JObject(List("add" -> JObject(List(
      "path" -> JString(encodePath(rel)),
      "partitionValues" -> JObject(pv),
      "size" -> JInt(size),
      "modificationTime" -> JInt(now),
      "dataChange" -> JBool(true)))))
  }

  private def commitInfo(op: String, now: Long,
      tags: Map[String, String]): JValue =
    JObject(List("commitInfo" -> JObject(List(
      "timestamp" -> (JInt(now): JValue),
      "operation" -> (JString(op): JValue),
      "operationParameters" -> (JObject(Nil): JValue)) ++
      (if (tags.isEmpty) Nil
       else List("tags" -> (JObject(tags.toList.sortBy(_._1)
         .map { case (k, s) => k -> (JString(s): JValue) }): JValue))))))

  /** Publish version `v` with put-if-absent semantics: write a unique
    * temp, then a no-overwrite move — two writers racing the same
    * version surface as a loud conflict, per the protocol's atomicity
    * requirement.
    */
  private def publish(dir: String, v: Long, actions: Seq[JValue]): Unit = {
    val target = versionFile(dir, v)
    val tmp = s"$target.tmp-${java.util.UUID.randomUUID()}"
    WarehouseIO.mkdirs(logDir(dir))
    WarehouseIO.rawPutBytes(tmp, actions
      .map(a => JsonMethods.compact(JsonMethods.render(a)))
      .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    try WarehouseIO.moveFile(tmp, target)
    catch { case e: java.nio.file.FileAlreadyExistsException =>
      WarehouseIO.deleteIfExists(tmp)
      throw new java.util.ConcurrentModificationException(
        s"Delta version $v already committed at $dir (concurrent writer)", e)
    }
  }

  /** Percent-encode a dir-relative path as the protocol requires;
    * hive-escaped segments ('%XX') round-trip because '%' encodes to
    * '%25'.
    */
  private def encodePath(rel: String): String =
    new java.net.URI(null, null, rel, null).toASCIIString

  private def decodePath(enc: String): String = new java.net.URI(enc).getPath
}
