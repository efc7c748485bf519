package graft.core

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Directory-backed catalog: `warehouse/<db>/<table>/{meta.json, log/,
  * state/, _offsets.json}`.
  *
  * The reference keeps table metadata in ZooKeeper and serializes the
  * descriptor as JSON (TableDescriptor.toJsonBytes, fluss-common/.../
  * metadata/TableDescriptor.java:323); we keep the same idea with a file
  * per table. On a real cluster `warehouse` is an object-store prefix and
  * every operation below is already driver-light (metadata only).
  */
final class Catalog(val warehouse: String, spark: SparkSession) {

  /** The warehouse's ACL store (`sys.add_acl`/`drop_acl`/`list_acl`). */
  val acls: Acls = new Acls(warehouse)

  /** Default-closed ACL gate over every catalog operation, off unless
    * `spark.sql.graft.authorizer.enabled=true` (the reference's
    * `authorizer.enabled`, evaluated per-RPC on the server — a library
    * engine's "RPC surface" is this catalog and the SQL connector on top
    * of it). The acting principal comes from the session
    * (`spark.sql.graft.principal`, the post-authentication FlussPrincipal
    * analog); `spark.sql.graft.super.users` (semicolon-separated, like
    * `super.users`) bypasses all checks.
    */
  private[graft] def authorize(op: String, resource: Seq[String]): Unit = {
    // Security-critical keys (enable flag, super-user list) resolve
    // DYNAMIC > DEFAULT only — in the reference these are server-side
    // configs a client can never SET; honoring a session override would
    // let any session disable ACLs an admin persisted cluster-wide.
    // Principal/host stay session-asserted (post-authentication identity;
    // a library engine has no authentication layer, so the authorizer is
    // advisory against a principal-spoofing session but sound against
    // accidental access).
    def conf(key: String, default: String) =
      DynamicConfigs.effective(spark, warehouse, key, default)
    // Fail-safe in BOTH directions: enforcement is on if EITHER the
    // warehouse dynamic config OR this session says so. A session can
    // opt IN to enforcement (the documented pre-dynamic mechanism —
    // ignoring it would silently drop enforcement on upgrade) but can
    // never veto a cluster-wide enable.
    // strict parse with the key named in the error: silently ignoring a
    // malformed value ("1", "yes") would fail OPEN on a session that
    // meant to enable enforcement
    val sessionEnable = spark.conf
      .getOption("spark.sql.graft.authorizer.enabled")
      .exists(v => v.trim.toLowerCase match {
        case "true" => true
        case "false" => false
        case other => throw new IllegalArgumentException(
          s"invalid boolean '$other' for spark.sql.graft.authorizer.enabled")
      })
    if (!sessionEnable && !DynamicConfigs.effectiveServerSide(warehouse,
        "spark.sql.graft.authorizer.enabled", "false").toBoolean)
      return
    // a bound IdentityProvider (warehouse-persisted class or embedder
    // install — [[Identity]]) supplies the AUTHENTICATED principal and
    // the session assertion is ignored entirely
    val principal = Identity.resolve(spark, warehouse)
      .getOrElse(conf("spark.sql.graft.principal", "User:anonymous"))
    val supers = DynamicConfigs.effectiveServerSide(warehouse,
        "spark.sql.graft.super.users", "")
      .split(";").map(_.trim).filter(_.nonEmpty).toSet
    if (supers.contains(principal)) return
    val host = conf("spark.sql.graft.client.host", "*")
    if (!acls.authorize(principal, host, op, resource))
      throw new SecurityException(
        s"principal $principal is not authorized for $op on " +
          (if (resource.isEmpty) "cluster" else resource.mkString(".")))
  }

  // ---- databases (the reference Admin's createDatabase/listDatabases/
  // getDatabaseInfo/deleteDatabase, with DatabaseDescriptor comment +
  // custom properties and DatabaseInfo created/modified times;
  // fluss-client admin surface, apis/java) ----

  private def dbMetaFile(db: String) = s"$warehouse/$db/_db.json"

  /** Create a database with descriptor properties (use the key `comment`
    * for the description, like the reference's DatabaseDescriptor).
    */
  def createDatabase(db: String, properties: Map[String, String] = Map.empty,
      ignoreIfExists: Boolean = false): Unit = {
    authorize("CREATE", Nil)
    require(db.nonEmpty && !db.contains('/') && !db.contains('.'),
      s"bad database name '$db'")
    if (WarehouseIO.exists(dbMetaFile(db)) ||
        WarehouseIO.isDirectory(s"$warehouse/$db")) {
      require(ignoreIfExists, s"database $db exists")
      return
    }
    WarehouseIO.mkdirs(s"$warehouse/$db")
    writeDbMeta(db, properties, System.currentTimeMillis(),
      System.currentTimeMillis())
  }

  private def writeDbMeta(db: String, props: Map[String, String],
      created: Long, modified: Long): Unit =
    CatalogJson.atomicWrite(dbMetaFile(db),
      JsonMethods.compact(JsonMethods.render(JObject(List(
        "properties" -> (JObject(props.toList.sortBy(_._1)
          .map { case (k, v) => k -> (JString(v): JValue) }): JValue),
        "createdTimeMillis" -> (JInt(created): JValue),
        "modifiedTimeMillis" -> (JInt(modified): JValue))))))

  /** (properties, createdTimeMillis, modifiedTimeMillis) — DatabaseInfo.
    * Databases made by bare directory creation (legacy) read as empty
    * properties with zero timestamps.
    */
  def getDatabaseInfo(db: String): (Map[String, String], Long, Long) = {
    authorize("DESCRIBE", Seq(db))
    require(databaseExistsUnchecked(db), s"no such database $db")
    getDatabaseInfoUnchecked(db)
  }

  /** Replace the database's custom properties (ALTER DATABASE SET). */
  def alterDatabase(db: String, properties: Map[String, String]): Unit = {
    authorize("ALTER", Seq(db))
    require(databaseExistsUnchecked(db), s"no such database $db")
    val created = getDatabaseInfoUnchecked(db)._2
    writeDbMeta(db, properties, created, System.currentTimeMillis())
  }

  private def getDatabaseInfoUnchecked(db: String): (Map[String, String], Long, Long) =
    WarehouseIO.readStringIfExists(dbMetaFile(db)) match {
      case None => (Map.empty, 0L, 0L)
      case Some(s) =>
        val f = JsonMethods.parse(s)
          .asInstanceOf[JObject].obj.toMap[String, JValue]
        (f("properties").asInstanceOf[JObject].obj
          .map { case (k, v) => k -> v.asInstanceOf[JString].s }.toMap,
          f("createdTimeMillis").asInstanceOf[JInt].num.toLong,
          f("modifiedTimeMillis").asInstanceOf[JInt].num.toLong)
    }

  private def databaseExistsUnchecked(db: String): Boolean =
    WarehouseIO.isDirectory(s"$warehouse/$db")

  def databaseExists(db: String): Boolean = {
    authorize("DESCRIBE", Seq(db))
    databaseExistsUnchecked(db)
  }

  def listDatabases(): Seq[String] = {
    authorize("DESCRIBE", Nil)
    WarehouseIO.listDir(warehouse).filter(_.isDir).map(_.name).sorted
  }

  /** Delete a database; `cascade=false` refuses while tables remain (the
    * reference's deleteDatabase(ignoreIfNotExists, cascade)).
    */
  def dropDatabase(db: String, ignoreIfNotExists: Boolean = false,
      cascade: Boolean = false): Boolean = {
    authorize("DROP", Seq(db))
    val dir = s"$warehouse/$db"
    if (!WarehouseIO.isDirectory(dir)) {
      require(ignoreIfNotExists, s"no such database $db")
      return false
    }
    require(cascade || listTables(db).isEmpty, s"database $db is not empty")
    WarehouseIO.deleteRecursively(dir)
    true
  }

  def createTable(db: String, name: String, desc: TableDescriptor): GraftTable = {
    authorize("CREATE", Seq(db))
    val dir = s"$warehouse/$db/$name"
    require(!WarehouseIO.exists(s"$dir/meta.json"), s"table $db.$name exists")
    WarehouseIO.mkdirs(s"$dir/log")
    WarehouseIO.atomicWriteString(s"$dir/meta.json", CatalogJson.write(desc))
    writeSchemaVersion(dir, 1, desc.schema)
    new GraftTable(dir, desc, spark)
  }

  // ---- schema history (the reference's SchemaInfo ids: ids begin at 1
  // and increment by 1 per schema change, fluss-common/.../metadata/
  // SchemaInfo.java:27; Admin.getTableSchema(tablePath, schemaId),
  // Admin.java:120) ----

  private def schemaFile(dir: String, id: Int) =
    s"$dir/_schemas/schema-$id.json"

  private def writeSchemaVersion(dir: String, id: Int,
      schema: StructType): Unit = {
    WarehouseIO.mkdirs(s"$dir/_schemas")
    CatalogJson.atomicWrite(schemaFile(dir, id),
      JsonMethods.compact(JsonMethods.render(JObject(List(
        "registeredAtMillis" -> (JInt(System.currentTimeMillis()): JValue),
        "schema" -> JsonMethods.parse(schema.json))))))
  }

  /** All schema versions of a table, ascending by id: (id, schema,
    * registered-at millis). Tables created before schema history was
    * recorded read as a single version 1 = the current schema.
    */
  def listTableSchemas(db: String, name: String): Seq[(Int, StructType, Long)] = {
    authorize("DESCRIBE", Seq(db, name))
    val t = getTable(db, name)
    val dir = s"$warehouse/$db/$name"
    val ids = WarehouseIO.listDir(s"$dir/_schemas")
      .flatMap(e => "schema-(\\d+)\\.json".r.findFirstMatchIn(e.name)
        .map(_.group(1).toInt)).sorted
    if (ids.isEmpty) Seq((1, t.desc.schema, 0L))
    else ids.map { id =>
      val fields = JsonMethods.parse(WarehouseIO.readString(schemaFile(dir, id)))
        .asInstanceOf[JObject].obj.toMap
      val at = fields("registeredAtMillis").asInstanceOf[JInt].num.toLong
      val schema = DataType.fromJson(
        JsonMethods.compact(JsonMethods.render(fields("schema"))))
        .asInstanceOf[StructType]
      (id, schema, at)
    }
  }

  /** The schema under a specific id (Admin.getTableSchema(path, id));
    * absent ids fail loudly with the recorded range.
    */
  def getTableSchema(db: String, name: String, schemaId: Int): StructType = {
    val all = listTableSchemas(db, name)
    all.find(_._1 == schemaId).map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"schema id $schemaId not recorded for $db.$name " +
          s"(recorded: ${all.head._1}..${all.last._1})"))
  }

  /** Current schema + its id (Admin.getTableSchema(path)). The
    * descriptor stays the source of truth for the schema itself; history
    * supplies the id.
    */
  def getTableSchema(db: String, name: String): (StructType, Int) = {
    val all = listTableSchemas(db, name)
    (getTable(db, name).desc.schema, all.last._1)
  }

  def getTable(db: String, name: String): GraftTable = {
    authorize("DESCRIBE", Seq(db, name))
    val dir = s"$warehouse/$db/$name"
    val meta = WarehouseIO.readStringIfExists(s"$dir/meta.json")
    require(meta.isDefined, s"no such table $db.$name")
    new GraftTable(dir, CatalogJson.read(meta.get), spark)
  }

  /** Schema evolution — ADD COLUMN LAST only, like the reference
    * (fluss-server/.../kv/KvTablet.java:496-506, SchemaInfo schema ids):
    * the new column must be nullable and is appended after existing data
    * columns; rows written before the change read it as null (parquet
    * by-name resolution fills missing columns).
    */
  def addColumn(db: String, name: String,
      field: org.apache.spark.sql.types.StructField): GraftTable = {
    authorize("ALTER", Seq(db, name))
    val t = getTable(db, name)
    require(!t.desc.schema.fieldNames.contains(field.name),
      s"column ${field.name} already exists")
    require(field.nullable, "added column must be nullable (ADD COLUMN LAST)")
    val desc2 = t.desc.copy(schema = StructType(t.desc.schema.fields :+ field))
    val dir = s"$warehouse/$db/$name"
    // schema ids increment by 1 per change (SchemaInfo.java:27); a table
    // from before history recording back-fills its pre-change schema as
    // id 1 so the new version lands as id 2, never overwriting
    val recorded = WarehouseIO.listDir(s"$dir/_schemas")
      .flatMap(e => "schema-(\\d+)\\.json".r.findFirstMatchIn(e.name)
        .map(_.group(1).toInt))
    val maxId = if (recorded.nonEmpty) recorded.max
    else { writeSchemaVersion(dir, 1, t.desc.schema); 1 }
    // history BEFORE meta.json: a crash between the two leaves an extra
    // history file (harmless — the next ALTER's maxId scan skips past it)
    // instead of a published schema whose id was never recorded, which a
    // later ALTER would silently reassign to a different schema
    writeSchemaVersion(dir, maxId + 1, desc2.schema)
    CatalogJson.atomicWrite(s"$dir/meta.json", CatalogJson.write(desc2))
    new GraftTable(dir, desc2, spark)
  }

  /** Dynamic table options — the reference's `ALTER TABLE ... SET (...)`
    * / `RESET (...)` (engine-flink/ddl.md "SET properties"): free-form
    * key/values persisted in the descriptor; structural options (schema,
    * keys, merge engine) are immutable after create, like the reference.
    */
  def updateProperties(db: String, name: String,
      set: Map[String, String], unset: Seq[String]): GraftTable = {
    authorize("ALTER", Seq(db, name))
    val t = getTable(db, name)
    val desc2 = t.desc.copy(properties = t.desc.properties ++ set -- unset)
    CatalogJson.atomicWrite(s"$warehouse/$db/$name/meta.json",
      CatalogJson.write(desc2))
    new GraftTable(s"$warehouse/$db/$name", desc2, spark)
  }

  /** Change a table's storage bucket count ([[GraftTable.rebucketTo]]):
    * full log re-hash + atomic swap + descriptor flip, crash-recovered
    * through the intent marker. Finishes (or aborts) a crashed earlier
    * attempt first, then applies `newBuckets` if it still differs.
    * Returns a FRESH handle — handles opened before the rebucket refuse
    * to commit (stale bucket count) and must be re-opened.
    * `stateSeeded = true`: the vacuumed-PK-table form — re-hash the
    * current state with a FRESH history (changelog restarts as `+I`
    * rows; streams/pollers/indexes on the table must restart, which the
    * timeline stamp enforces).
    */
  def rebucket(db: String, name: String, newBuckets: Int,
      stateSeeded: Boolean = false): GraftTable = {
    authorize("ALTER", Seq(db, name))
    val t0 = getTable(db, name)
    val t = if (t0.completeCrashedRebucket()) getTable(db, name) else t0
    t.rebucketTo(newBuckets, stateSeeded)
    getTable(db, name)
  }

  /** Clone a table: descriptor + log + snapshot + manifests copied to a
    * new name (the lakehouse `CREATE TABLE ... CLONE` analog; on an
    * object store this is a metadata-level copy). The clone is fully
    * independent — mutations never touch the source.
    */
  def cloneTable(db: String, src: String, dst: String): GraftTable = {
    authorize("READ", Seq(db, src))
    authorize("CREATE", Seq(db))
    val s = s"$warehouse/$db/$src"
    require(WarehouseIO.exists(s"$s/meta.json"), s"no such table $db.$src")
    val d = s"$warehouse/$db/$dst"
    require(!WarehouseIO.exists(s"$d/meta.json"), s"table $db.$dst exists")
    // recursive listing copy, not a files-only walk: empty directories
    // (pre-created partitions, an empty log/) are part of the table
    def copyTree(from: String, to: String): Unit = {
      WarehouseIO.mkdirs(to)
      WarehouseIO.listDir(from).foreach { e =>
        if (e.isDir) copyTree(e.path, s"$to/${e.name}")
        else WarehouseIO.copyFile(e.path, s"$to/${e.name}")
      }
    }
    copyTree(s, d)
    getTable(db, dst)
  }

  /** Rename = one directory move (atomic on a local filesystem, a
    * metadata operation on an object store) — never a data copy.
    */
  def renameTable(db: String, src: String, dst: String): GraftTable = {
    authorize("ALTER", Seq(db, src))
    authorize("CREATE", Seq(db))
    val s = s"$warehouse/$db/$src"
    require(WarehouseIO.exists(s"$s/meta.json"), s"no such table $db.$src")
    val d = s"$warehouse/$db/$dst"
    require(!WarehouseIO.exists(d), s"table $db.$dst exists")
    WarehouseIO.moveFile(s, d) // one dir rename; metadata-only on HDFS
    getTable(db, dst)
  }

  def tableExists(db: String, name: String): Boolean =
    WarehouseIO.exists(s"$warehouse/$db/$name/meta.json")

  def dropTable(db: String, name: String): Unit = {
    authorize("DROP", Seq(db, name))
    WarehouseIO.deleteRecursively(s"$warehouse/$db/$name")
  }

  def listTables(db: String): Seq[String] = {
    authorize("DESCRIBE", Seq(db))
    WarehouseIO.listDir(s"$warehouse/$db")
      .filter(e => e.isDir && WarehouseIO.exists(s"${e.path}/meta.json"))
      .map(_.name).sorted
  }

  // ---- producer offset snapshots (exactly-once undo recovery) ----

  private def splitQualified(qualified: String): (String, String) = {
    val parts = qualified.split('.')
    require(parts.length == 2,
      s"expected a two-part table name 'db.table', got '$qualified'")
    (parts(0), parts(1))
  }

  /** Current per-bucket next-offsets of the named `db.table`s — the
    * snapshot a job coordinator registers at startup, before writing
    * anything (the reference registers the offsets its writer observed,
    * Admin.java:745).
    */
  def currentOffsetsFor(tableNames: Seq[String]): Map[String, Map[Int, Long]] =
    tableNames.map { qn =>
      val (db, name) = splitQualified(qn)
      qn -> getTable(db, name).latestOffsets
    }.toMap

  /** Atomic check-and-register of a producer offset snapshot
    * ([[ProducerOffsets.register]]; Admin.registerProducerOffsets).
    * [[ProducerOffsets.AlreadyExists]] signals a crash before the first
    * checkpoint — run [[recoverProducer]] before writing again.
    */
  def registerProducerOffsets(producerId: String,
      tables: Map[String, Map[Int, Long]],
      ttlMillis: Long = ProducerOffsets.DefaultTtlMillis)
      : ProducerOffsets.RegisterResult = {
    authorize("WRITE", Nil)
    ProducerOffsets.register(warehouse, producerId, tables, ttlMillis)
  }

  /** The unexpired snapshot for `producerId` (Admin.getProducerOffsets). */
  def getProducerOffsets(producerId: String): Option[ProducerOffsets.Snapshot] = {
    authorize("DESCRIBE", Nil)
    ProducerOffsets.get(warehouse, producerId)
  }

  /** Delete a producer snapshot after the first durable checkpoint
    * (Admin.deleteProducerOffsets). Returns whether the id existed.
    */
  def deleteProducerOffsets(producerId: String): Boolean = {
    authorize("WRITE", Nil)
    ProducerOffsets.delete(warehouse, producerId)
  }

  /** Undo recovery across every table in `producerId`'s snapshot: each
    * table compensates the changes written past its registered offsets
    * ([[GraftTable.undoTo]] — the UndoRecoveryManager flow). Returns the
    * per-table compensation counts. The snapshot is kept: the caller is
    * still pre-first-checkpoint and deletes it only once a checkpoint
    * lands.
    */
  def recoverProducer(producerId: String): Map[String, Long] = {
    val snap = getProducerOffsets(producerId).getOrElse(throw
      new IllegalArgumentException(
        s"no unexpired producer offset snapshot for '$producerId'"))
    snap.tables.map { case (qn, offs) =>
      val (db, name) = splitQualified(qn)
      authorize("WRITE", Seq(db, name))
      qn -> getTable(db, name).undoTo(offs)
    }
  }
}

/** Descriptor <-> JSON. Spark's StructType has a stable JSON form; the
  * rest is a small hand-rolled object.
  */
object CatalogJson {
  def write(d: TableDescriptor): String = {
    val engine: JValue = d.mergeEngine match {
      case MergeEngine.Default => JObject("type" -> JString("default"))
      case MergeEngine.FirstRow => JObject("type" -> JString("first_row"))
      case MergeEngine.Versioned(c) =>
        JObject("type" -> JString("versioned"), "versionColumn" -> JString(c))
      case MergeEngine.Aggregation(aggs) =>
        JObject("type" -> JString("aggregation"),
          "aggs" -> JObject(aggs.toList.map { case (k, v) => k -> (JString(v): JValue) }))
    }
    val obj = JObject(
      "schema" -> JsonMethods.parse(d.schema.json),
      "primaryKey" -> JArray(d.primaryKey.toList.map(JString(_))),
      "bucketKeys" -> JArray(d.bucketKeys.toList.map(JString(_))),
      "numBuckets" -> JInt(d.numBuckets),
      "partitionKeys" -> JArray(d.partitionKeys.toList.map(JString(_))),
      "mergeEngine" -> engine,
      "deleteBehavior" -> JString(d.deleteBehavior match {
        case DeleteBehavior.Allow => "allow"; case DeleteBehavior.Ignore => "ignore"
      }),
      "changelogImage" -> JString(d.changelogImage match {
        case ChangelogImage.Full => "full"; case ChangelogImage.Wal => "wal"
      }),
      "autoIncrementColumn" -> d.autoIncrementColumn.map(JString(_): JValue)
        .getOrElse(JNull),
      "properties" -> JObject(d.properties.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }))
    JsonMethods.pretty(JsonMethods.render(obj))
  }

  def read(json: String): TableDescriptor = {
    val j = JsonMethods.parse(json)
    def strs(v: JValue): Seq[String] =
      v.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s)
    def str(v: JValue): String = v.asInstanceOf[JString].s
    val fields = j.asInstanceOf[JObject].obj.toMap
    val engineObj = fields("mergeEngine").asInstanceOf[JObject].obj.toMap
    val engine = str(engineObj("type")) match {
      case "default" => MergeEngine.Default
      case "first_row" => MergeEngine.FirstRow
      case "versioned" => MergeEngine.Versioned(str(engineObj("versionColumn")))
      case "aggregation" => MergeEngine.Aggregation(
        engineObj("aggs").asInstanceOf[JObject].obj
          .map { case (k, v) => k -> str(v) }.toMap)
    }
    TableDescriptor(
      schema = DataType.fromJson(JsonMethods.compact(JsonMethods.render(
        fields("schema")))).asInstanceOf[StructType],
      primaryKey = strs(fields("primaryKey")),
      bucketKeys = strs(fields("bucketKeys")),
      numBuckets = fields("numBuckets").asInstanceOf[JInt].num.toInt,
      partitionKeys = strs(fields("partitionKeys")),
      mergeEngine = engine,
      deleteBehavior = str(fields("deleteBehavior")) match {
        case "ignore" => DeleteBehavior.Ignore; case _ => DeleteBehavior.Allow
      },
      changelogImage = str(fields("changelogImage")) match {
        case "wal" => ChangelogImage.Wal; case _ => ChangelogImage.Full
      },
      autoIncrementColumn = fields.get("autoIncrementColumn").collect {
        case JString(s) => s
      },
      // absent in metas written before the field existed
      properties = fields.get("properties").collect {
        case JObject(kvs) => kvs.collect { case (k, JString(v)) => k -> v }.toMap
      }.getOrElse(Map.empty))
  }

  /** Short critical section over a shared metadata file (ACLs, dynamic
    * configs): lock-file mutex with bounded retry, so concurrent
    * read-modify-write cycles serialize instead of silently losing the
    * loser's entries. Stale locks (a crashed holder) break after 60 s.
    *
    * A vanished lock PARENT (FileNotFoundException from the exclusive
    * create) normally falls through to running the body unlocked — the
    * right call for catalog metadata, where the parent disappearing means
    * a concurrent dropDatabase and the body will surface the real error.
    * Callers whose mutual exclusion is the WHOLE point (commit
    * coordination) pass `missingParentFatal = true` to turn that fallback
    * into a loud failure instead of a silent unlocked run.
    */
  def withFileLock[T](path: String, timeoutMs: Long = 10000L,
      missingParentFatal: Boolean = false)(body: => T): T = {
    val lock = path + ".lock"
    val deadline = System.currentTimeMillis() + timeoutMs
    var held = false
    while (!held) {
      try {
        if (WarehouseIO.createExclusive(lock)) held = true
        else {
          try {
            if (System.currentTimeMillis() -
                WarehouseIO.mtimeMillis(lock) > 60000L)
              WarehouseIO.deleteIfExists(lock)
          } catch { case _: java.io.IOException => () }
          if (System.currentTimeMillis() > deadline)
            throw new IllegalStateException(s"timed out acquiring $lock")
          Thread.sleep(5L + scala.util.Random.nextInt(20))
        }
      } catch {
        case e: java.io.FileNotFoundException =>
          if (missingParentFatal) throw new IllegalStateException(
            s"lock parent for $lock vanished — refusing to run the " +
              "critical section unlocked", e)
          // parent vanished mid-race (e.g. dropDatabase); let the body
          // surface the real error
          held = true
      }
    }
    try body finally WarehouseIO.deleteIfExists(lock)
  }

  /** Atomic small-file write (manifesty things: offsets, txn log). */
  def atomicWrite(path: String, content: String): Unit =
    WarehouseIO.atomicWriteString(path, content)
}
