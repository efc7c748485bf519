package graft.connector

import java.nio.file.Files

import graft.SparkTestBase

/** Authorization (security/authorization.md): default-closed ACL gate over
  * the catalog + SQL surface, managed through the `add_acl`/`drop_acl`/
  * `list_acl` procedures (engine-flink/procedures.md "Access Control
  * Procedures"), with the reference's hierarchy (cluster → db → table),
  * implication (ALL ⊃ everything; READ/WRITE/… ⊃ DESCRIBE) and DENY veto.
  */
/** Stand-in for a real authentication binding (Kerberos, gateway token):
  * instantiated reflectively from the warehouse-persisted
  * `spark.sql.graft.identity.provider` config.
  */
class FixedIdentityProvider extends graft.core.IdentityProvider {
  override def principal(spark: org.apache.spark.sql.SparkSession): String =
    "User:gateway-bob"
}

class AclSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-acl").toString
    spark.conf.set("spark.sql.catalog.acl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.acl.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS acl.db")
    spark.sql("""
      CREATE TABLE acl.db.t (k BIGINT, v INT) USING graft
      TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO acl.db.t VALUES (1, 1), (2, 2)")
    dir
  }

  private def asPrincipal[T](principal: String)(body: => T): T = {
    // enable flag + super.users resolve server-side only (DYNAMIC >
    // DEFAULT, session scope ignored) — persist them the way an admin
    // would; only the asserted identity is session state
    graft.core.DynamicConfigs.set(wh, Map(
      "spark.sql.graft.authorizer.enabled" -> "true",
      "spark.sql.graft.super.users" -> "User:admin"))
    spark.conf.set("spark.sql.graft.principal", principal)
    try body finally {
      spark.conf.unset("spark.sql.graft.principal")
      graft.core.DynamicConfigs.reset(wh, Seq(
        "spark.sql.graft.authorizer.enabled", "spark.sql.graft.super.users"))
    }
  }

  private def deniedBy[T](body: => T): String = {
    val e = intercept[Throwable](body)
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("not authorized"), s"expected ACL denial, got: $e")
    msgs
  }

  test("default-closed: no grant means no read, no write, no DDL") {
    wh
    asPrincipal("User:alice") {
      deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
      deniedBy(spark.sql("INSERT INTO acl.db.t VALUES (3, 3)"))
      // row-level delete is gated as a WRITE, not reachable via READ
      deniedBy(spark.sql("DELETE FROM acl.db.t WHERE k > 0"))
      deniedBy(spark.sql("DROP TABLE acl.db.t"))
      deniedBy(spark.sql(
        "CREATE TABLE acl.db.t2 (k BIGINT) USING graft TBLPROPERTIES ('bucket.num'='1')"))
    }
  }

  test("super users bypass every check; grants open exactly what they name") {
    wh
    asPrincipal("User:admin") { // in super.users
      assert(spark.sql("SELECT * FROM acl.db.t").collect().length == 2)
      spark.sql("""CALL acl.system.add_acl(resource => 'db.t',
        permission => 'ALLOW', principal => 'User:alice', operation => 'READ')""")
    }
    asPrincipal("User:alice") {
      // READ granted: select works (READ implies the DESCRIBE in loadTable)
      assert(spark.sql("SELECT * FROM acl.db.t").collect().length == 2)
      // but WRITE was not granted — neither inserts nor row-level deletes
      deniedBy(spark.sql("INSERT INTO acl.db.t VALUES (3, 3)"))
      deniedBy(spark.sql("DELETE FROM acl.db.t WHERE k = 1"))
    }
  }

  test("database-level grant inherits to tables; DENY vetoes an ALLOW") {
    wh
    asPrincipal("User:admin") {
      spark.sql("""CALL acl.system.add_acl(resource => 'db',
        permission => 'ALLOW', principal => 'User:bob', operation => 'ALL')""")
    }
    asPrincipal("User:bob") {
      assert(spark.sql("SELECT * FROM acl.db.t").collect().length == 2)
      spark.sql("INSERT INTO acl.db.t VALUES (9, 9)")
    }
    asPrincipal("User:admin") {
      spark.sql("""CALL acl.system.add_acl(resource => 'db.t',
        permission => 'DENY', principal => 'User:bob', operation => 'WRITE')""")
    }
    asPrincipal("User:bob") {
      assert(spark.sql("SELECT * FROM acl.db.t").collect().length == 3)
      deniedBy(spark.sql("INSERT INTO acl.db.t VALUES (10, 10)"))
    }
  }

  test("list_acl filters and renders; drop_acl ANY-wildcard batch-deletes") {
    wh
    asPrincipal("User:admin") {
      spark.sql("""CALL acl.system.add_acl(resource => 'db.t',
        permission => 'ALLOW', principal => 'User:carol', operation => 'READ')""")
      spark.sql("""CALL acl.system.add_acl(resource => 'CLUSTER',
        permission => 'ALLOW', principal => 'User:carol', operation => 'DESCRIBE')""")
      val listed = spark.sql(
        """CALL acl.system.list_acl(principal => 'User:carol')""")
        .collect().map(_.getString(0))
      assert(listed.length == 2)
      assert(listed.exists(_.contains("""resource="cluster"""")))
      assert(listed.forall(_.contains("""principal="User:carol"""")))
      // batch delete every entry of the principal (the documented wildcard)
      val dropped = spark.sql("""CALL acl.system.drop_acl(resource => 'ANY',
        permission => 'ANY', principal => 'User:carol', operation => 'ANY',
        host => 'ANY')""").collect()(0).getString(0)
      assert(dropped == "dropped 2")
      assert(spark.sql("CALL acl.system.list_acl(principal => 'User:carol')")
        .collect().isEmpty)
    }
    asPrincipal("User:carol") {
      deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
    }
  }

  test("non-super principals cannot manage ACLs without ALL on the resource") {
    wh
    asPrincipal("User:mallory") {
      deniedBy(spark.sql("""CALL acl.system.add_acl(resource => 'db.t',
        permission => 'ALLOW', principal => 'User:mallory', operation => 'ALL')"""))
    }
  }

  test("session overrides cannot disable the authorizer or self-grant super") {
    wh
    asPrincipal("User:zed") { // no grants anywhere
      // flipping the enable flag off in the session must not bypass the
      // cluster-wide gate (in the reference these are server-side configs)
      spark.conf.set("spark.sql.graft.authorizer.enabled", "false")
      try deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
      finally spark.conf.unset("spark.sql.graft.authorizer.enabled")
      // nor can a session append itself to super.users
      spark.conf.set("spark.sql.graft.super.users", "User:admin;User:zed")
      try deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
      finally spark.conf.unset("spark.sql.graft.super.users")
    }
  }

  test("a session can ENABLE enforcement (never disable): fail-safe both ways") {
    wh
    // no dynamic enable persisted — the pre-dynamic documented mechanism
    // was session conf alone, and it must keep enforcing after upgrade
    spark.conf.set("spark.sql.graft.authorizer.enabled", "true")
    spark.conf.set("spark.sql.graft.principal", "User:nobody")
    try deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
    finally {
      spark.conf.unset("spark.sql.graft.authorizer.enabled")
      spark.conf.unset("spark.sql.graft.principal")
    }
  }

  test("a bound identity provider pins the principal; session assertions are ignored") {
    wh
    graft.core.DynamicConfigs.set(wh, Map(
      "spark.sql.graft.authorizer.enabled" -> "true",
      "spark.sql.graft.super.users" -> "User:admin",
      "spark.sql.graft.identity.provider" ->
        classOf[FixedIdentityProvider].getName))
    // the session claims to be the super user — with a provider bound,
    // that assertion is dead weight: the AUTHENTICATED principal
    // (User:gateway-bob, no grants) is what the authorizer sees
    spark.conf.set("spark.sql.graft.principal", "User:admin")
    try {
      deniedBy(spark.sql("SELECT * FROM acl.db.t").collect())
      // grant the authenticated principal directly; the read opens while
      // the session still claims someone else
      new graft.core.Acls(wh).add(graft.core.AclEntry(
        "db.t", "ALLOW", "User:gateway-bob", "READ", "*"))
      assert(spark.sql("SELECT * FROM acl.db.t").collect().length >= 2)
      new graft.core.Acls(wh).drop(graft.core.AclEntry(
        "db.t", "ANY", "User:gateway-bob", "ANY", "ANY"))
    } finally {
      spark.conf.unset("spark.sql.graft.principal")
      graft.core.DynamicConfigs.reset(wh, Seq(
        "spark.sql.graft.authorizer.enabled", "spark.sql.graft.super.users",
        "spark.sql.graft.identity.provider"))
    }
  }

  test("scala-API catalog surface is gated too") {
    val dir = wh
    val core = new graft.core.Catalog(dir, spark)
    asPrincipal("User:eve") {
      deniedBy(core.getTable("db", "t"))
      deniedBy(core.listTables("db"))
      deniedBy(core.dropTable("db", "t"))
    }
    // gate off: open again (library default)
    assert(core.listTables("db").contains("t"))
  }
}
