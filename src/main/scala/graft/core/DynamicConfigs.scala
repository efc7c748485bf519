package graft.core


import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Dynamically-changeable engine configuration, persisted at the
  * warehouse root (`_configs.json`) — the reference's dynamic cluster
  * configs, which are validated, persisted in ZooKeeper and survive
  * restarts (`sys.set/append/subtract/reset_cluster_configs`,
  * engine-flink/procedures.md "Cluster Configuration Procedures").
  *
  * Precedence when a key is read: SESSION (`spark.conf`, this session
  * only) > DYNAMIC (persisted here, all sessions on the warehouse) >
  * DEFAULT (the registry) — mirroring the reference's per-session SET
  * over cluster-wide dynamic over shipped default.
  *
  * Only registered keys may be changed, and collection semantics
  * (append/subtract) apply only to collection-typed keys — the
  * reference rejects invalid modifications the same way.
  */
object DynamicConfigs {

  /** key → (default, isCollection). `super.users` is the reference's own
    * example of a collection config (semicolon-separated principals).
    */
  val registry: Map[String, (String, Boolean)] = Map(
    "spark.sql.graft.read.optimized" -> ("false", false),
    // lake union read (S7's lake form): lake-enabled tables resolve cold
    // state from their table.datalake.* lake dir + the fresh log tail
    "spark.sql.graft.read.lake-union" -> ("false", false),
    // key-grouped scan planning (storage-partitioned joins):
    // 'true' | 'false' | 'auto' — auto groups per table when the bucket
    // count can fill the session's cores (see [[GroupedReads]])
    "spark.sql.graft.read.preserve-data-grouping" -> ("auto", false),
    "spark.sql.graft.scan.startup.mode" -> ("earliest", false),
    // streaming admission control for catalog-table reads (empty = none)
    "spark.sql.graft.maxOffsetsPerTrigger" -> ("", false),
    "spark.sql.graft.authorizer.enabled" -> ("false", false),
    "spark.sql.graft.identity.provider" -> ("", false),
    "spark.sql.graft.principal" -> ("User:anonymous", false),
    "spark.sql.graft.super.users" -> ("", true),
    "spark.sql.graft.client.host" -> ("*", false))

  private def file(warehouse: String) = s"$warehouse/_configs.json"

  // mtime-keyed cache: the precedence check runs on scan planning and
  // every ACL-gated catalog call; re-parsing the file each time would
  // put JSON parsing on the metadata hot path
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Map[String, String])]()

  def read(warehouse: String): Map[String, String] = {
    val f = file(warehouse)
    if (!WarehouseIO.exists(f)) return Map.empty
    val mtime = WarehouseIO.mtimeMillis(f)
    val hit = cache.get(warehouse)
    if (hit != null && hit._1 == mtime) return hit._2
    val parsed = JsonMethods.parse(WarehouseIO.readString(f))
      .asInstanceOf[JObject].obj
      .map { case (k, v) => k -> v.asInstanceOf[JString].s }.toMap
    cache.put(warehouse, (mtime, parsed))
    parsed
  }

  /** Mutations serialize on a lock file — concurrent set/append must not
    * lose each other's keys (same discipline as [[Acls]]).
    */
  private def withLock[T](warehouse: String)(body: => T): T =
    CatalogJson.withFileLock(file(warehouse))(body)

  private def write(warehouse: String, m: Map[String, String]): Unit = {
    CatalogJson.atomicWrite(file(warehouse),
      JsonMethods.compact(JsonMethods.render(JObject(
        m.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) }))))
    // write-through (ms-resolution mtime: see Acls.writeAll)
    cache.put(warehouse,
      (WarehouseIO.mtimeMillis(file(warehouse)), m))
  }

  private def requireKnown(key: String): Unit =
    require(registry.contains(key),
      s"'$key' is not a dynamically-changeable configuration " +
        s"(known: ${registry.keys.toSeq.sorted.mkString(", ")})")

  def set(warehouse: String, pairs: Map[String, String]): Unit = {
    pairs.keys.foreach(requireKnown)
    withLock(warehouse) { write(warehouse, read(warehouse) ++ pairs) }
  }

  /** Append to a collection config (semicolon-separated). Appending an
    * element that is already present is rejected, like the reference's
    * duplicate-map-key rule.
    */
  def append(warehouse: String, pairs: Map[String, String]): Unit = withLock(warehouse) {
    val cur = read(warehouse)
    val updated = pairs.foldLeft(cur) { case (acc, (k, v)) =>
      requireKnown(k)
      require(registry(k)._2, s"'$k' is not a collection-type configuration; " +
        "APPEND is only supported for collection keys (use set_cluster_configs)")
      val existing = acc.getOrElse(k, registry(k)._1)
        .split(";").map(_.trim).filter(_.nonEmpty).toList
      require(!existing.contains(v), s"'$v' already present in '$k'")
      acc + (k -> (existing :+ v).mkString(";"))
    }
    write(warehouse, updated)
  }

  /** Remove from a collection config; absent elements are a no-op, like
    * the reference's SUBTRACT.
    */
  def subtract(warehouse: String, pairs: Map[String, String]): Unit = withLock(warehouse) {
    val cur = read(warehouse)
    val updated = pairs.foldLeft(cur) { case (acc, (k, v)) =>
      requireKnown(k)
      require(registry(k)._2, s"'$k' is not a collection-type configuration; " +
        "SUBTRACT is only supported for collection keys")
      val existing = acc.getOrElse(k, registry(k)._1)
        .split(";").map(_.trim).filter(_.nonEmpty).toList
      acc + (k -> existing.filterNot(_ == v).mkString(";"))
    }
    write(warehouse, updated)
  }

  /** Drop keys from the dynamic scope (back to session/default). */
  def reset(warehouse: String, keys: Seq[String]): Int = withLock(warehouse) {
    keys.foreach(requireKnown)
    val cur = read(warehouse)
    val kept = cur -- keys
    if (kept.size != cur.size) write(warehouse, kept)
    cur.size - kept.size
  }

  /** Boolean read-mode flag for a TABLE path (the grouped-read opt-in
    * and its sibling read modes) — one definition so every read path
    * (engine scan, catalog scan builder, optimizer substitution)
    * resolves the flag identically.
    */
  def readFlag(spark: SparkSession, tablePath: String,
      key: String): Boolean =
    effective(spark, WarehouseIO.warehouseOf(tablePath), key,
      "false").toBoolean

  /** SESSION > DYNAMIC > DEFAULT, with the registry default as fallback
    * for unregistered reads.
    */
  def effective(spark: SparkSession, warehouse: String, key: String,
      default: String): String =
    spark.conf.getOption(key)
      .orElse(read(warehouse).get(key))
      .orElse(registry.get(key).map(_._1))
      .getOrElse(default)

  /** DYNAMIC > DEFAULT only — for security-critical keys
    * (`authorizer.enabled`, `super.users`) that in the reference are
    * server-side configs a client can never override. A session-scope
    * override here would let any session silently disable ACLs an admin
    * persisted cluster-wide via `sys.set_cluster_configs`.
    */
  def effectiveServerSide(warehouse: String, key: String,
      default: String): String =
    read(warehouse).get(key)
      .orElse(registry.get(key).map(_._1))
      .getOrElse(default)
}
