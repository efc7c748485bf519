package graft.connector

import java.nio.file.Files

import graft.SparkTestBase

/** SQL UPDATE / MERGE INTO / subquery DELETE on PK catalog tables — the
  * delta-based row-level framework over the engine's mixed merge commit.
  */
class RowLevelSqlSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-rls").toString
    spark.conf.set("spark.sql.catalog.rls", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rls.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rls.db")
    dir
  }

  private def freshKv(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS rls.db.$name")
    spark.sql(s"""
      CREATE TABLE rls.db.$name (k BIGINT, v INT, tag STRING)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
    spark.sql(s"""INSERT INTO rls.db.$name
      SELECT id, CAST(id * 10 AS INT), concat('t', id % 3) FROM range(0, 30)""")
  }

  private def stateOf(name: String): Map[Long, (Int, String)] =
    spark.sql(s"SELECT k, v, tag FROM rls.db.$name").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap

  test("SQL UPDATE: non-key SET applies as one merge commit") {
    wh; freshKv("u1")
    spark.sql("UPDATE rls.db.u1 SET v = v + 1000 WHERE tag = 't1'")
    val got = stateOf("u1")
    assert(got.size == 30)
    (0L until 30L).foreach { k =>
      val exp = if (k % 3 == 1) k.toInt * 10 + 1000 else k.toInt * 10
      assert(got(k)._1 == exp, s"k=$k -> ${got(k)}")
    }
  }

  test("SQL UPDATE of the PRIMARY KEY itself: old key removed, new key in") {
    wh; freshKv("u2")
    spark.sql("UPDATE rls.db.u2 SET k = k + 100 WHERE k = 7")
    val got = stateOf("u2")
    assert(!got.contains(7L) && got(107L) == (70, "t1"), got.get(107L))
    assert(got.size == 30)
  }

  test("SQL MERGE INTO: update, delete and insert in one statement") {
    wh; freshKv("m1")
    spark.sql("""CREATE OR REPLACE TEMP VIEW rls_src AS
      SELECT * FROM VALUES (1L, 111), (2L, 222), (99L, 999) AS s(k, nv)""")
    spark.sql("""
      MERGE INTO rls.db.m1 t USING rls_src s ON t.k = s.k
      WHEN MATCHED AND s.k = 2 THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.nv
      WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.nv, 'new')""")
    val got = stateOf("m1")
    assert(got(1L) == (111, "t1"), got.get(1L))
    assert(!got.contains(2L))
    assert(got(99L) == (999, "new"), got.get(99L))
    assert(got.size == 30, s"30 - 1 delete + 1 insert = 30; got ${got.size}")
    // the merge emitted ordinary changelog rows: the statement's delete
    // shows as -D, the update as +U, the insert as +I/+A — same CDC
    // surface as every other write path
    val ct = new graft.core.Catalog(wh, spark).getTable("db", "m1")
      .changelog().select("_change_type", "k").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(ct.contains("-D" -> 2L), ct.toSeq.sorted.mkString(","))
    assert(ct.exists { case (t, k) => k == 99L && t.startsWith("+") })
  }

  test("DELETE with a subquery predicate (not metadata-translatable)") {
    wh; freshKv("d1")
    spark.sql("""CREATE OR REPLACE TEMP VIEW rls_kill AS
      SELECT * FROM VALUES (3L), (5L), (200L) AS x(kk)""")
    spark.sql(
      "DELETE FROM rls.db.d1 WHERE k IN (SELECT kk FROM rls_kill)")
    val got = stateOf("d1")
    assert(!got.contains(3L) && !got.contains(5L) && got.size == 28)
  }

  test("plain translatable DELETE still takes the metadata-only path") {
    wh; freshKv("d2")
    val df = spark.sql("DELETE FROM rls.db.d2 WHERE k = 11")
    // a metadata delete plans DeleteFromTableExec (no WriteDelta)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("DeleteFromTable"), plan)
    assert(!stateOf("d2").contains(11L))
  }

  test("partitioned + bucketed target: UPDATE moves rows across " +
      "partition dirs") {
    wh
    spark.sql("""CREATE TABLE rls.db.pt (dt STRING, k BIGINT, v INT)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('primary.key' = 'dt,k', 'bucket.num' = '2')""")
    spark.sql("""INSERT INTO rls.db.pt VALUES
      ('a', 1, 10), ('a', 2, 20), ('b', 3, 30)""")
    // SET on the PARTITION column (also part of the PK): the row must
    // move dirs — delete old identity, reinsert under the new one
    spark.sql("UPDATE rls.db.pt SET dt = 'c' WHERE dt = 'a' AND k = 2")
    val got = spark.sql("SELECT dt, k, v FROM rls.db.pt ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq(("a", 1L, 10), ("c", 2L, 20), ("b", 3L, 30)), got)
    // and MERGE with a partitioned target stays exact
    spark.sql("""MERGE INTO rls.db.pt t
      USING (SELECT 'b' AS dt, 3L AS k, 333 AS nv
             UNION ALL SELECT 'd', 9L, 999) s
      ON t.dt = s.dt AND t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.nv
      WHEN NOT MATCHED THEN INSERT (dt, k, v) VALUES (s.dt, s.k, s.nv)""")
    val got2 = spark.sql("SELECT dt, k, v FROM rls.db.pt ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got2 == Seq(("a", 1L, 10), ("c", 2L, 20), ("b", 3L, 333),
      ("d", 9L, 999)), got2)
  }

  test("concurrent SQL UPDATEs on DISJOINT keys both commit with NO " +
      "user retry (bounded internal retry re-stages the loser)") {
    wh; freshKv("cc1")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def run(sql: String): java.util.concurrent.Future[Unit] = pool.submit(
      new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = {
          start.await(30, TimeUnit.SECONDS)
          spark.sql(sql) // ONE attempt — the engine retries internally
          ()
        }
      })
    // tag partitions the key space: write sets are disjoint
    val f1 = run("UPDATE rls.db.cc1 SET v = v + 1 WHERE tag = 't0'")
    val f2 = run("UPDATE rls.db.cc1 SET v = v + 2 WHERE tag = 't1'")
    start.countDown()
    f1.get(120, TimeUnit.SECONDS); f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // BOTH statements' effects present — whichever order they serialized
    val got = stateOf("cc1")
    (0L until 30L).foreach { k =>
      val exp = (k % 3) match {
        case 0 => k.toInt * 10 + 1
        case 1 => k.toInt * 10 + 2
        case _ => k.toInt * 10
      }
      assert(got(k)._1 == exp, s"k=$k got=${got(k)}")
    }
  }

  test("write-set OVERLAP with a commit landed since the scan fails " +
      "loudly — first committer wins, never a silent lost update") {
    wh; freshKv("ov1")
    import org.apache.spark.sql.functions._
    val t = new graft.core.Catalog(wh, spark).getTable("db", "ov1")
    // pin the state a statement's scan would see...
    val pinned = t.latestOffsets
    // ...then an interloper updates key 5
    val up = spark.sql("SELECT 5L AS k, 555 AS v, 'raced' AS tag")
    t.upsert(up, orderBy = Seq(lit(0L)))
    // a staged delta derived from the PINNED scan, touching the SAME key:
    // applying it would overwrite the interloper's value with one derived
    // from a stale read
    def delta(key: Long) = spark.sql(
      s"SELECT 1L AS __seq, $key AS k, 1 AS v, 'mine' AS tag")
      .withColumn("__delete", lit(false))
    val e = intercept[java.util.ConcurrentModificationException](
      GraftRowLevel.checkAndApply(t, delta(5L), pinned))
    assert(e.getMessage.contains("concurrently updated"), e.getMessage)
    assert(stateOf("ov1")(5L) == (555, "raced"), "first committer wins")
    // the SAME stale pin with a DISJOINT write set commits fine — the
    // interloper's rows don't intersect, so re-staging is exact
    GraftRowLevel.checkAndApply(t, delta(7L), pinned)
    assert(stateOf("ov1")(7L) == (1, "mine"))
  }

  test("maintenance during the statement window makes conflicts " +
      "UNPROVABLE: vacuum past the pin refuses even a disjoint delta") {
    wh; freshKv("mv1")
    import org.apache.spark.sql.functions._
    val t = new graft.core.Catalog(wh, spark).getTable("db", "mv1")
    val pinned = t.latestOffsets
    // interloper commit, then compact+vacuum move its rows (and the
    // whole log) OUT of the gated log — the overlap check can no longer
    // SEE what landed since the pin, so it must refuse rather than
    // silently pass a delta whose conflicts are invisible
    val up = spark.sql("SELECT 5L AS k, 555 AS v, 'raced' AS tag")
    t.upsert(up, orderBy = Seq(lit(0L)))
    t.compact(); t.vacuumLog()
    def delta(key: Long) = spark.sql(
      s"SELECT 1L AS __seq, $key AS k, 1 AS v, 'mine' AS tag")
      .withColumn("__delete", lit(false))
    val e = intercept[java.util.ConcurrentModificationException](
      GraftRowLevel.checkAndApply(t, delta(7L), pinned))
    assert(e.getMessage.contains("unprovable"), e.getMessage)
    // a FRESH pin (post-maintenance state) commits fine
    GraftRowLevel.checkAndApply(t, delta(7L), t.latestOffsets)
    assert(stateOf("mv1")(7L) == (1, "mine"))
    assert(stateOf("mv1")(5L) == (555, "raced"))
  }

  test("SERIALIZABLE isolation: a concurrent insert INTO the WHERE range " +
      "fails the statement; the default (write-serializable) commits it") {
    wh; freshKv("ser1")
    import org.apache.spark.sql.functions._
    val t = new graft.core.Catalog(wh, spark).getTable("db", "ser1")
    val pinnedEpoch = t.rollbackEpoch
    val pinned = t.latestOffsets
    // interloper: a NEW key lands inside tag='t1' — not in our write
    // set (key 7 below), so it is a pure predicate PHANTOM
    val up = spark.sql("SELECT 100L AS k, 1 AS v, 't1' AS tag")
    t.upsert(up, orderBy = Seq(lit(0L)))
    def delta(key: Long) = spark.sql(
      s"SELECT 1L AS __seq, $key AS k, 1 AS v, 'mine' AS tag")
      .withColumn("__delete", lit(false))
    val pred = Some(col("tag") === "t1")
    // serializable: phantom detected, statement fails loudly
    val e = intercept[java.util.ConcurrentModificationException](
      GraftRowLevel.checkAndApply(t, delta(7L), pinned, Some(pinnedEpoch),
        pred, serializable = true))
    assert(e.getMessage.contains("phantom"), e.getMessage)
    // a phantom OUTSIDE the predicate range does NOT fail serializable
    val up2 = spark.sql("SELECT 101L AS k, 2 AS v, 'zz' AS tag")
    val pinned2 = t.latestOffsets
    t.upsert(up2, orderBy = Seq(lit(0L)))
    GraftRowLevel.checkAndApply(t, delta(8L), pinned2, Some(t.rollbackEpoch),
      pred, serializable = true)
    assert(stateOf("ser1")(8L) == (1, "mine"))
    // default level: the SAME in-range phantom is tolerated (write-set
    // serializability — key 7 was never concurrently touched)
    GraftRowLevel.checkAndApply(t, delta(7L), pinned, Some(pinnedEpoch),
      pred, serializable = false)
    assert(stateOf("ser1")(7L) == (1, "mine"))
    // serializable with NOTHING pushed: ANY commit since the pin fails
    val e2 = intercept[java.util.ConcurrentModificationException](
      GraftRowLevel.checkAndApply(t, delta(9L), pinned, Some(pinnedEpoch),
        None, serializable = true))
    assert(e2.getMessage.contains("phantom"), e2.getMessage)
    // the conf gate rejects junk values
    spark.conf.set("spark.sql.graft.dml.isolation", "junk")
    try intercept[IllegalArgumentException](
      GraftRowLevel.serializableIsolation(spark))
    finally spark.conf.unset("spark.sql.graft.dml.isolation")
  }

  test("a concurrent ROLLBACK that re-advances offsets to the pin is " +
      "caught by the pinned epoch (ABA), both isolation levels") {
    wh; freshKv("aba1")
    import org.apache.spark.sql.functions._
    val t = new graft.core.Catalog(wh, spark).getTable("db", "aba1")
    val vBefore = t.latestVersion.get
    // commit A advances offsets; a statement pins epoch-then-offsets
    val upA = spark.sql("SELECT 5L AS k, 555 AS v, 'a' AS tag")
    t.upsert(upA, orderBy = Seq(lit(0L)))
    val pinnedEpoch = t.rollbackEpoch
    val pinned = t.latestOffsets
    // rollback erases commit A, then commit B re-advances the SAME
    // bucket by the SAME row count — offsets end EQUAL to the pin while
    // the log's rows in that range are different (the ABA shape)
    t.rollbackTo(vBefore)
    val upB = spark.sql("SELECT 5L AS k, 666 AS v, 'b' AS tag")
    t.upsert(upB, orderBy = Seq(lit(0L)))
    assert(t.latestOffsets == pinned,
      s"fixture must re-advance to the pin: ${t.latestOffsets} vs $pinned")
    def delta(key: Long) = spark.sql(
      s"SELECT 1L AS __seq, $key AS k, 1 AS v, 'mine' AS tag")
      .withColumn("__delete", lit(false))
    val e = intercept[java.util.ConcurrentModificationException](
      GraftRowLevel.checkAndApply(t, delta(7L), pinned, Some(pinnedEpoch)))
    assert(e.getMessage.contains("rollback"), e.getMessage)
    // the pre-r15 behavior (no epoch pinned) would skip every check:
    // prove the delta itself was appliable, so ONLY the epoch caught it
    GraftRowLevel.checkAndApply(t, delta(7L), pinned)
    assert(stateOf("aba1")(7L) == (1, "mine"))
    assert(stateOf("aba1")(5L) == (666, "b"), "commit B survives")
  }

  test("the SQL path pins epoch and captures the pushed WHERE for the " +
      "serializable phantom check") {
    wh; freshKv("cap1")
    import org.apache.spark.sql.connector.write.RowLevelOperationInfo
    import org.apache.spark.sql.connector.read.SupportsPushDownFilters
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val t = new graft.core.Catalog(wh, spark).getTable("db", "cap1")
    val dsT = new GraftDsTable(t,
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("db"), "cap1"))
    val info = new RowLevelOperationInfo {
      override def command() = org.apache.spark.sql.connector.write
        .RowLevelOperation.Command.UPDATE
      override def options() = CaseInsensitiveStringMap.empty()
    }
    val op = dsT.newRowLevelOperationBuilder(info).build()
      .asInstanceOf[GraftRowLevelOperation]
    val sb = op.newScanBuilder(CaseInsensitiveStringMap.empty())
    assert(op.scanPinnedOffsets.contains(t.latestOffsets))
    assert(op.scanPinnedEpoch.contains(t.rollbackEpoch))
    // before any pushdown: conservative (no predicate)
    assert(op.pushedTargetPredicate.isEmpty)
    sb.asInstanceOf[SupportsPushDownFilters]
      .pushFilters(Array(EqualTo("tag", "t1")))
    val pred = op.pushedTargetPredicate
    assert(pred.isDefined)
    // the reconstructed predicate matches exactly the t1 rows
    assert(t.scan().filter(pred.get).count() == 10)
  }

  test("SQL UPDATE under serializable isolation commits when nothing " +
      "raced, and UPDATE semantics are unchanged") {
    wh; freshKv("ser2")
    spark.conf.set("spark.sql.graft.dml.isolation", "serializable")
    try {
      spark.sql("UPDATE rls.db.ser2 SET v = v + 1000 WHERE tag = 't1'")
      val got = stateOf("ser2")
      (0L until 30L).foreach { k =>
        val exp = if (k % 3 == 1) k.toInt * 10 + 1000 else k.toInt * 10
        assert(got(k)._1 == exp, s"k=$k -> ${got(k)}")
      }
    } finally spark.conf.unset("spark.sql.graft.dml.isolation")
  }

  test("orphan GC sweeps crashed-query staging; fresh staging survives") {
    wh; freshKv("gc1")
    val t = new graft.core.Catalog(wh, spark).getTable("db", "gc1")
    val stale = java.nio.file.Paths.get(t.path, "_rowlevel_staging", "dead-q")
    val fresh = java.nio.file.Paths.get(t.path, "_stream_staging", "live-q")
    java.nio.file.Files.createDirectories(stale)
    java.nio.file.Files.createDirectories(fresh)
    assert(stale.toFile.setLastModified(
      System.currentTimeMillis() - 48L * 3600 * 1000))
    t.removeOrphanFiles() // default: older than 24h
    assert(!java.nio.file.Files.exists(stale), "stale staging must sweep")
    assert(java.nio.file.Files.exists(fresh), "fresh staging must survive")
  }

  test("INSERT INTO a PK table from a NULLABLE source still resolves " +
      "(non-null PK schema must not reject parquet-backed selects)") {
    wh; freshKv("ni1")
    // a parquet round-trip makes every column nullable — the common shape
    // of any lake-backed INSERT source. The PK surfaces non-nullable in
    // the DSv2 schema (row-level rewrites require it), so this pins that
    // store assignment still accepts a nullable source with a runtime
    // check instead of failing resolution.
    val src = Files.createTempDirectory("graft-ni-src").toString
    spark.sql("SELECT id + 500 AS k, CAST(id AS INT) AS v, 'p' AS tag " +
      "FROM range(0, 5)").write.mode("overwrite").parquet(src)
    spark.read.parquet(src).createOrReplaceTempView("ni_src")
    assert(spark.table("ni_src").schema.forall(_.nullable),
      "precondition: parquet source must be nullable")
    spark.sql("INSERT INTO rls.db.ni1 SELECT k, v, tag FROM ni_src")
    val got = stateOf("ni1")
    assert(got.size == 35 && got(503L) == (3, "p"), got.get(503L))
    // and an actually-NULL key fails LOUDLY at runtime, not silently
    intercept[Exception](spark.sql(
      "INSERT INTO rls.db.ni1 SELECT CAST(NULL AS BIGINT), 1, 'x'"))
  }

  test("guards: append tables, non-default engines and time travel refuse") {
    wh
    spark.sql("""CREATE TABLE rls.db.applog (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO rls.db.applog VALUES (1, 1)")
    val e1 = intercept[Exception](
      spark.sql("UPDATE rls.db.applog SET v = 2 WHERE k = 1"))
    assert(e1.getMessage.contains("primary-key"), e1.getMessage)
    spark.sql("""CREATE TABLE rls.db.fr (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '2',
        'table.merge-engine' = 'first_row')""")
    spark.sql("INSERT INTO rls.db.fr VALUES (1, 1)")
    val e2 = intercept[Exception](
      spark.sql("UPDATE rls.db.fr SET v = 2 WHERE k = 1"))
    assert(e2.getMessage.contains("merge engine"), e2.getMessage)
  }
}
