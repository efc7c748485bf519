package graft.core


import org.json4s._
import org.json4s.jackson.JsonMethods

/** One ACL binding — the reference's `AclBinding` shape (security/
  * authorization.md: "Principal {P} is Allowed Operation {O} From Host
  * {H} on any Resource {R}"), serialized to the same five fields the
  * `sys.add_acl` / `sys.drop_acl` / `sys.list_acl` procedures take.
  *
  * `resource` is `"cluster"`, `"<db>"` or `"<db>.<table>"`; `permission`
  * is `ALLOW` or `DENY`; `principal` is `"Type:Name"` (e.g. `User:alice`);
  * `operation` is one of [[Acls.Operations]]; `host` is an address or
  * `"*"`. In filters (drop/list) any field may be `"ANY"`.
  */
final case class AclEntry(resource: String, permission: String,
    principal: String, operation: String, host: String) {
  /** The procedures' documented rendering: `resource="…";permission="…";…`. */
  def render: String =
    s"""resource="$resource";permission="$permission";principal="$principal";""" +
      s"""operation="$operation";host="$host""""
}

/** File-backed ACL store + the default authorizer decision procedure.
  *
  * The reference's built-in authorizer keeps ACL bindings in ZooKeeper and
  * evaluates them on every RPC (security/authorization.md; `authorizer
  * .enabled`, `super.users`). A library engine has no RPC tier, so the
  * bindings live in one `_acls.json` beside the warehouse's databases and
  * the evaluation runs at the catalog/SQL surface instead — same model,
  * same hierarchy, same implication rules:
  *
  *  - resources nest cluster → database → table; a grant at a scope
  *    applies to everything beneath it;
  *  - `ALL` implies every operation; `READ`/`WRITE`/`CREATE`/`DROP`/
  *    `ALTER` each imply `DESCRIBE`;
  *  - `DENY` beats `ALLOW` at any scope (an explicit deny is a veto);
  *  - no matching `ALLOW` ⇒ denied (default-closed, like the reference
  *    once `authorizer.enabled` is on).
  */
object Acls {
  /** aclsFile -> (mtime, entries); shared across Acls instances (the SQL
    * catalog constructs a fresh core Catalog per operation).
    */
  private[core] val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, List[AclEntry])]()
}

final class Acls(warehouse: String) {

  private val aclsFile = s"$warehouse/_acls.json"

  /** Mutations serialize on a lock file (concurrent add/drop must never
    * lose the other writer's binding — a vanished DENY is a security
    * hole, not an inconvenience).
    */
  private def withLock[T](body: => T): T =
    CatalogJson.withFileLock(aclsFile)(body)

  /** Grantable operations (ANY is filter-only, never grantable). */
  val Operations: Set[String] =
    Set("ALL", "READ", "WRITE", "CREATE", "DROP", "ALTER", "DESCRIBE")

  private def readAll(): List[AclEntry] = {
    if (!WarehouseIO.exists(aclsFile)) return Nil
    // mtime-keyed cache: the gate runs on every catalog operation, so a
    // re-parse per decision would put JSON parsing on the metadata hot
    // path; the file only changes through add/drop
    val mtime = WarehouseIO.mtimeMillis(aclsFile)
    val hit = Acls.cache.get(aclsFile)
    if (hit != null && hit._1 == mtime) return hit._2
    val parsed = JsonMethods.parse(WarehouseIO.readString(aclsFile))
      .asInstanceOf[JArray].arr.map { v =>
      val f = v.asInstanceOf[JObject].obj.toMap[String, JValue]
      def s(k: String) = f(k).asInstanceOf[JString].s
      AclEntry(s("resource"), s("permission"), s("principal"),
        s("operation"), s("host"))
    }
    Acls.cache.put(aclsFile, (mtime, parsed))
    parsed
  }

  private def writeAll(entries: List[AclEntry]): Unit = {
    CatalogJson.atomicWrite(aclsFile,
      JsonMethods.compact(JsonMethods.render(JArray(entries.map { e =>
        JObject(List(
          "resource" -> (JString(e.resource): JValue),
          "permission" -> (JString(e.permission): JValue),
          "principal" -> (JString(e.principal): JValue),
          "operation" -> (JString(e.operation): JValue),
          "host" -> (JString(e.host): JValue)))
      }))))
    // write-through: mtime has millisecond resolution, so two writes in
    // one tick would otherwise let readAll serve the FIRST write's cache
    Acls.cache.put(aclsFile,
      (WarehouseIO.mtimeMillis(aclsFile), entries))
  }

  def add(e: AclEntry): Unit = {
    require(Operations.contains(e.operation),
      s"operation '${e.operation}' is not grantable (one of $Operations; " +
        "ANY is filter-only)")
    require(e.permission == "ALLOW" || e.permission == "DENY",
      s"permission must be ALLOW or DENY, got '${e.permission}'")
    require(e.principal.contains(":"),
      s"principal must be 'Type:Name' (e.g. User:alice), got '${e.principal}'")
    require(e.resource.nonEmpty, "resource must be non-empty")
    withLock {
      val all = readAll()
      if (!all.contains(e)) writeAll(all :+ e)
    }
  }

  private def matches(filter: AclEntry, e: AclEntry): Boolean = {
    def m(f: String, v: String) = f == "ANY" || f == v
    m(filter.resource, e.resource) && m(filter.permission, e.permission) &&
      m(filter.principal, e.principal) && m(filter.operation, e.operation) &&
      m(filter.host, e.host)
  }

  /** Remove every binding the filter matches (ANY = wildcard); returns
    * how many were removed — the procedures' batch-deletion semantics.
    */
  def drop(filter: AclEntry): Int = withLock {
    val all = readAll()
    val kept = all.filterNot(matches(filter, _))
    if (kept.size != all.size) writeAll(kept)
    all.size - kept.size
  }

  def list(filter: AclEntry = AclEntry("ANY", "ANY", "ANY", "ANY", "ANY"))
      : Seq[AclEntry] = readAll().filter(matches(filter, _))

  /** The decision procedure. `resource` is the path from the root:
    * `Nil` = cluster-level action, `Seq(db)`, or `Seq(db, table)`.
    */
  def authorize(principal: String, host: String, operation: String,
      resource: Seq[String]): Boolean = {
    // the resource plus every enclosing scope (grants inherit downward)
    val scopes: Seq[String] = resource match {
      case Seq(db, table) => Seq(s"$db.$table", db, "cluster")
      case Seq(db) => Seq(db, "cluster")
      case _ => Seq("cluster")
    }
    // implication applies to GRANTS: an ALLOW on READ/WRITE/CREATE/DROP/
    // ALTER also satisfies DESCRIBE. A DENY is scoped to its exact
    // operation (or ALL) — denying WRITE must not take DESCRIBE/READ away.
    val allowSatisfying: Set[String] = operation match {
      case "DESCRIBE" => Set("DESCRIBE", "READ", "WRITE", "CREATE", "DROP",
        "ALTER", "ALL")
      case op => Set(op, "ALL")
    }
    val denySatisfying: Set[String] = Set(operation, "ALL")
    val visible = readAll().filter { e =>
      e.principal == principal &&
        (e.host == "*" || e.host == host) &&
        scopes.contains(e.resource)
    }
    visible.exists(e => e.permission == "ALLOW" &&
        allowSatisfying.contains(e.operation)) &&
      !visible.exists(e => e.permission == "DENY" &&
        denySatisfying.contains(e.operation))
  }
}
