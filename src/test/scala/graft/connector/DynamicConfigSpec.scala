package graft.connector

import java.nio.file.Files

import graft.SparkTestBase

/** Dynamic cluster configs (engine-flink/procedures.md "Cluster
  * Configuration Procedures"): validated set/append/subtract/reset,
  * persisted at the warehouse (the ZK-persistence analog), surfaced by
  * get_configs with the DYNAMIC source, and consumed with SESSION >
  * DYNAMIC > DEFAULT precedence.
  */
class DynamicConfigSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-dyncfg").toString
    spark.conf.set("spark.sql.catalog.cfg", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cfg.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cfg.db")
    dir
  }

  /** Session confs shadow the dynamic scope — clear any a prior suite on
    * this shared session may have left behind.
    */
  private def clearSession(): Unit = Seq(
    "spark.sql.graft.authorizer.enabled", "spark.sql.graft.principal",
    "spark.sql.graft.super.users", "spark.sql.graft.read.optimized")
    .foreach(spark.conf.unset)

  private def configRow(key: String): (String, String) = {
    val r = spark.sql(s"CALL cfg.system.get_configs(config_keys => '$key')")
      .collect()
    assert(r.length == 1, s"expected one row for $key")
    (r(0).getString(1), r(0).getString(2))
  }

  test("set persists to the DYNAMIC scope; session overrides; reset clears") {
    wh
    clearSession()
    assert(configRow("spark.sql.graft.read.optimized") == ("false", "DEFAULT"))
    spark.sql("""CALL cfg.system.set_cluster_configs(
      config_pairs => 'spark.sql.graft.read.optimized=true')""")
    assert(configRow("spark.sql.graft.read.optimized") == ("true", "DYNAMIC"))
    // the dynamic value really steers reads: a PK table with an empty
    // snapshot tier reads as EMPTY in read-optimized mode
    spark.sql("""CREATE TABLE cfg.db.ro (k BIGINT, v INT) USING graft
      TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO cfg.db.ro VALUES (1, 1)")
    assert(spark.sql("SELECT * FROM cfg.db.ro").collect().isEmpty,
      "dynamic read.optimized=true must reach the scan path")
    // SESSION wins over DYNAMIC
    spark.conf.set("spark.sql.graft.read.optimized", "false")
    try {
      assert(configRow("spark.sql.graft.read.optimized") == ("false", "SESSION"))
      assert(spark.sql("SELECT * FROM cfg.db.ro").collect().length == 1)
    } finally spark.conf.unset("spark.sql.graft.read.optimized")
    val reset = spark.sql("""CALL cfg.system.reset_cluster_configs(
      config_keys => 'spark.sql.graft.read.optimized')""").collect()(0).getString(0)
    assert(reset == "reset 1")
    assert(configRow("spark.sql.graft.read.optimized") == ("false", "DEFAULT"))
  }

  test("append/subtract operate on collection keys only; unknown keys rejected") {
    wh
    clearSession()
    spark.sql("""CALL cfg.system.append_cluster_configs(
      config_pairs => 'spark.sql.graft.super.users=User:bob')""")
    spark.sql("""CALL cfg.system.append_cluster_configs(
      config_pairs => 'spark.sql.graft.super.users=User:carol')""")
    assert(configRow("spark.sql.graft.super.users") ==
      ("User:bob;User:carol", "DYNAMIC"))
    // duplicate append rejected (reference: existing map key is an error)
    val dup = intercept[Throwable](spark.sql(
      """CALL cfg.system.append_cluster_configs(
        config_pairs => 'spark.sql.graft.super.users=User:bob')"""))
    assert(Iterator.iterate(dup)(_.getCause).takeWhile(_ != null)
      .exists(e => Option(e.getMessage).exists(_.contains("already present"))))
    // subtract removes; absent value is a no-op
    spark.sql("""CALL cfg.system.subtract_cluster_configs(
      config_pairs => 'spark.sql.graft.super.users=User:bob')""")
    spark.sql("""CALL cfg.system.subtract_cluster_configs(
      config_pairs => 'spark.sql.graft.super.users=User:nobody')""")
    assert(configRow("spark.sql.graft.super.users") == ("User:carol", "DYNAMIC"))
    // append to a scalar key rejected
    val scalar = intercept[Throwable](spark.sql(
      """CALL cfg.system.append_cluster_configs(
        config_pairs => 'spark.sql.graft.read.optimized=x')"""))
    assert(Iterator.iterate(scalar)(_.getCause).takeWhile(_ != null)
      .exists(e => Option(e.getMessage).exists(_.contains("not a collection"))))
    // unknown key rejected with the known-keys message
    val unknown = intercept[Throwable](spark.sql(
      """CALL cfg.system.set_cluster_configs(config_pairs => 'no.such.key=1')"""))
    assert(Iterator.iterate(unknown)(_.getCause).takeWhile(_ != null)
      .exists(e => Option(e.getMessage).exists(
        _.contains("not a dynamically-changeable"))))
    spark.sql("""CALL cfg.system.reset_cluster_configs(
      config_keys => 'spark.sql.graft.super.users')""")
  }

  test("stale metadata lock (crashed writer) is broken, mutation proceeds") {
    val dir = wh
    clearSession()
    val lock = java.nio.file.Paths.get(dir, "_configs.json.lock")
    java.nio.file.Files.createFile(lock)
    java.nio.file.Files.setLastModifiedTime(lock,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 120_000)) // older than the 60s break
    spark.sql("""CALL cfg.system.set_cluster_configs(
      config_pairs => 'spark.sql.graft.read.optimized=true')""")
    assert(configRow("spark.sql.graft.read.optimized")._1 == "true")
    assert(!java.nio.file.Files.exists(lock), "lock released after the write")
    spark.sql("""CALL cfg.system.reset_cluster_configs(
      config_keys => 'spark.sql.graft.read.optimized')""")
  }

  test("dynamic super.users + authorizer.enabled reach the ACL gate") {
    val dir = wh
    clearSession()
    // turn the authorizer on DYNAMICALLY (no session conf at all) with a
    // dynamic super-user — both knobs must flow through the same store.
    // The super-user append must land BEFORE enablement: once the gate is
    // on, config mutations themselves require cluster-level ALTER.
    spark.sql("""CALL cfg.system.append_cluster_configs(
      config_pairs => 'spark.sql.graft.super.users=User:root')""")
    spark.sql("""CALL cfg.system.set_cluster_configs(
      config_pairs => 'spark.sql.graft.authorizer.enabled=true')""")
    try {
      val core = new graft.core.Catalog(dir, spark)
      spark.conf.set("spark.sql.graft.principal", "User:nobody")
      try intercept[SecurityException](core.listTables("db"))
      finally spark.conf.unset("spark.sql.graft.principal")
      spark.conf.set("spark.sql.graft.principal", "User:root")
      try core.listTables("db") // super user: no throw
      finally spark.conf.unset("spark.sql.graft.principal")
    } finally {
      // resets run as the dynamic super user (the gate is still on)
      spark.conf.set("spark.sql.graft.principal", "User:root")
      try spark.sql("""CALL cfg.system.reset_cluster_configs(
        config_keys => 'spark.sql.graft.authorizer.enabled,spark.sql.graft.super.users')""")
      finally spark.conf.unset("spark.sql.graft.principal")
    }
  }
}
