package graft.connector

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** S11 DSv2 catalog: DDL / INSERT / SELECT through plain Spark SQL. */
class ConnectorSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-dsv2").toString
    spark.conf.set("spark.sql.catalog.gfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gfs.db")
    dir
  }

  test("create PK table via DDL, INSERT upserts, SELECT reads merged state") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.kv (k BIGINT, v INT, tag STRING)
      USING graft
      TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO gfs.db.kv VALUES (1, 1, 'a'), (2, 2, 'b')")
    spark.sql("INSERT INTO gfs.db.kv VALUES (1, 10, 'a2')")
    val rows = spark.sql("SELECT k, v, tag FROM gfs.db.kv ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 10, "a2"), (2L, 2, "b")))
  }

  test("aggregation merge engine via TBLPROPERTIES") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.agg (k BIGINT, total BIGINT, last STRING)
      USING graft
      TBLPROPERTIES ('primary.key' = 'k', 'table.merge-engine' = 'aggregation',
        'fields.total.agg' = 'sum', 'fields.last.agg' = 'last_value')""")
    spark.sql("INSERT INTO gfs.db.agg VALUES (7, 5, 'x'), (7, 6, 'y'), (8, 1, 'z')")
    val rows = spark.sql("SELECT k, total, last FROM gfs.db.agg ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((7L, 11L, "y"), (8L, 1L, "z")))
  }

  test("append (log) table: inserts accumulate; filter + projection push through") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.log (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gfs.db.log VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO gfs.db.log VALUES (1, 3)")
    assert(spark.sql("SELECT count(*) FROM gfs.db.log").collect()(0).getLong(0) == 3)
    val filtered = spark.sql("SELECT v FROM gfs.db.log WHERE k = 1 AND v > 1")
    assert(filtered.collect().map(_.getInt(0)).toSeq == Seq(3))
    // pushed filters show up in the DSv1-bridge relation's plan
    assert(filtered.queryExecution.executedPlan != null)
  }

  test("catalog surface: list, alter add column, rename, drop") {
    wh
    spark.sql("CREATE TABLE gfs.db.surf (k BIGINT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    assert(spark.sql("SHOW TABLES IN gfs.db").collect()
      .map(_.getString(1)).contains("surf"))
    spark.sql("ALTER TABLE gfs.db.surf ADD COLUMN note STRING")
    spark.sql("INSERT INTO gfs.db.surf VALUES (1, 'n')")
    assert(spark.sql("SELECT note FROM gfs.db.surf").collect()(0).getString(0) == "n")
    spark.sql("ALTER TABLE gfs.db.surf RENAME TO gfs.db.surf2")
    assert(spark.sql("SELECT count(*) FROM gfs.db.surf2").collect()(0).getLong(0) == 1)
    spark.sql("DROP TABLE gfs.db.surf2")
    assert(!spark.sql("SHOW TABLES IN gfs.db").collect()
      .map(_.getString(1)).contains("surf2"))
  }

  test("count(*) on an unpartitioned log table is answered from the offset manifest") {
    wh
    spark.sql("CREATE TABLE gfs.db.cnt (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')")
    spark.sql("INSERT INTO gfs.db.cnt VALUES (1, 1), (2, 2), (3, 3)")
    spark.sql("INSERT INTO gfs.db.cnt VALUES (4, 4)")
    val q = spark.sql("SELECT count(*) FROM gfs.db.cnt")
    assert(q.collect()(0).getLong(0) == 4)
    // the pushed aggregate leaves no parquet scan in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), plan)
  }

  test("min/max pushed to footer stats: no FileScan in the plan, exact values") {
    wh
    spark.sql("CREATE TABLE gfs.db.mmx (k BIGINT, v INT, s STRING) USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')")
    spark.sql("INSERT INTO gfs.db.mmx VALUES (1, 5, 'bb'), (2, 42, 'aa')")
    spark.sql("INSERT INTO gfs.db.mmx VALUES (3, -7, 'zz')")
    val q = spark.sql("SELECT min(v), max(v), max(s), count(*) FROM gfs.db.mmx")
    val row = q.collect()(0)
    assert((row.getInt(0), row.getInt(1), row.getString(2), row.getLong(3)) ==
      (-7, 42, "zz", 3L))
    assert(!q.queryExecution.executedPlan.toString.contains("FileScan"),
      "pushed min/max must not scan data files")
    // filtered aggregates are NOT pushed (stats can't see predicates)
    val filtered = spark.sql("SELECT min(v) FROM gfs.db.mmx WHERE k > 1")
    assert(filtered.collect()(0).getInt(0) == -7)
    assert(filtered.queryExecution.executedPlan.toString.contains("Scan"),
      "filtered aggregate must read data")
    // partitioned table: footer min/max still pushes (count(*) must not —
    // expirePartitions skews the offset manifest there)
    spark.sql("CREATE TABLE gfs.db.mmp (k BIGINT, v INT, dt STRING) USING graft " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('bucket.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.mmp VALUES (1, 4, '2024-01-01'), (2, 11, '2024-01-02')")
    val pq2 = spark.sql("SELECT min(v), max(v) FROM gfs.db.mmp")
    assert(pq2.collect()(0).getInt(0) == 4 && pq2.collect()(0).getInt(1) == 11)
    assert(!pq2.queryExecution.executedPlan.toString.contains("FileScan"))
    // min over the PARTITION column itself must scan (no footer stats)
    val pcol = spark.sql("SELECT min(dt) FROM gfs.db.mmp")
    assert(pcol.collect()(0).getString(0) == "2024-01-01")
    val pcnt = spark.sql("SELECT count(*) FROM gfs.db.mmp")
    assert(pcnt.collect()(0).getLong(0) == 2L)
  }

  test("TIMESTAMP AS OF reads the state as of an earlier commit") {
    wh
    spark.sql("CREATE TABLE gfs.db.tt (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.tt VALUES (1, 1), (2, 2)")
    Thread.sleep(20) // commit timestamps are ms-resolution
    val ts = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    spark.sql("INSERT INTO gfs.db.tt VALUES (1, 99), (3, 3)")
    val now = spark.sql("SELECT k, v FROM gfs.db.tt ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(now == Seq((1L, 99), (2L, 2), (3L, 3)))
    val then_ = spark.sql(
      s"SELECT k, v FROM gfs.db.tt TIMESTAMP AS OF '$ts' ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(then_ == Seq((1L, 1), (2L, 2)))
  }

  test("procedure and metadata-table error surfaces") {
    wh
    spark.sql("CREATE TABLE gfs.db.err (k BIGINT, v INT, dt STRING) USING graft " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('bucket.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.err VALUES (1, 1, '2099-01-01')")
    // maintain_partitions through SQL: pre-creates upcoming day dirs
    val res = spark.sql(
      "CALL gfs.system.maintain_partitions('db.err', 'day', 2, 400)").collect()
    assert(res.head.getString(0).startsWith("pre-created"))
    assert(spark.sql("SELECT count(*) FROM gfs.db.err.partitions")
      .head.getLong(0) >= 3) // data partition + 2 pre-created
    // remove_orphan_files through SQL (no orphans -> clean no-op)
    val ro = spark.sql(
      "CALL gfs.system.remove_orphan_files('db.err', '0s')").collect()
    assert(ro.head.getString(0) == "orphan files removed")
    assert(spark.sql("SELECT count(*) FROM gfs.db.err").head.getLong(0) == 1)
    // unknown procedure name fails with the known list
    val e1 = intercept[Exception](spark.sql("CALL gfs.system.nope('db.err')"))
    assert(e1.getMessage.contains("unknown procedure")
      || Option(e1.getCause).exists(_.getMessage.contains("unknown procedure")))
    // metadata table on a MISSING base table is a clean table-not-found
    val e2 = intercept[Exception](spark.sql("SELECT * FROM gfs.db.typo.changelog"))
    assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND")
      || e2.getMessage.toLowerCase.contains("cannot be found")
      || e2.getMessage.toLowerCase.contains("not found"))
    // non-numeric VERSION AS OF is rejected up front
    val e3 = intercept[Exception](
      spark.sql("SELECT * FROM gfs.db.err VERSION AS OF 'abc'").collect())
    assert(e3.getMessage.contains("numeric commit version")
      || Option(e3.getCause).exists(_.getMessage.contains("numeric commit version")))
  }

  test("scan.startup.mode reader options: earliest/latest/timestamp") {
    wh
    spark.sql("CREATE TABLE gfs.db.su (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.su VALUES (1, 1), (2, 2)")
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    spark.sql("INSERT INTO gfs.db.su VALUES (1, 9)")

    // default read: merged state
    assert(spark.read.table("gfs.db.su").count() == 2)
    // earliest: every log RECORD (+I, +I, -U, +U)
    assert(spark.read.option("scan.startup.mode", "earliest")
      .table("gfs.db.su").count() == 4)
    // timestamp: records committed at/after mid (-U/+U of the second commit)
    val fromMid = spark.read.option("scan.startup.mode", "timestamp")
      .option("scan.startup.timestamp-millis", mid.toString)
      .table("gfs.db.su")
    assert(fromMid.count() == 2)
    // latest: nothing yet
    assert(spark.read.option("scan.startup.mode", "latest")
      .table("gfs.db.su").count() == 0)
    // version: records committed after table version 1 (-U/+U of commit 2)
    assert(spark.read.option("scan.startup.mode", "version")
      .option("scan.startup.version", "1")
      .table("gfs.db.su").count() == 2)
    intercept[Exception](spark.read.option("scan.startup.mode", "bogus")
      .table("gfs.db.su").count())
  }

  test("database descriptors: comment/properties, info times, alter, drop") {
    wh
    spark.sql("CREATE NAMESPACE gfs.dbx COMMENT 'training corpora' " +
      "WITH DBPROPERTIES ('team' = 'data-eng')")
    val meta = spark.sql("DESCRIBE NAMESPACE EXTENDED gfs.dbx").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(meta("Comment") == "training corpora", s"got $meta")
    assert(meta("Properties").contains("team"), s"got $meta")
    // core admin surface (the reference Admin API shape)
    val core = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.gfs.warehouse"), spark)
    val (props, created, modified) = core.getDatabaseInfo("dbx")
    assert(props("comment") == "training corpora" && props("team") == "data-eng")
    assert(created > 0 && modified >= created)
    assert(core.databaseExists("dbx"))
    assert(core.listDatabases().contains("dbx"))
    // ALTER NAMESPACE SET rewrites properties, bumps modified time
    spark.sql("ALTER NAMESPACE gfs.dbx SET DBPROPERTIES ('team' = 'ml-infra')")
    val (props2, created2, modified2) = core.getDatabaseInfo("dbx")
    assert(props2("team") == "ml-infra" && created2 == created &&
      modified2 >= modified)
    // createDatabase: exists → error unless ignoreIfExists
    intercept[IllegalArgumentException](core.createDatabase("dbx"))
    core.createDatabase("dbx", ignoreIfExists = true)
    // non-cascade drop refuses while tables remain
    spark.sql("CREATE TABLE gfs.dbx.t1 (k BIGINT) USING graft " +
      "TBLPROPERTIES ('bucket.num' = '1')")
    intercept[Exception](core.dropDatabase("dbx"))
    assert(core.dropDatabase("dbx", cascade = true))
    assert(!core.databaseExists("dbx"))
    assert(!core.dropDatabase("dbx", ignoreIfNotExists = true))
  }

  test("scan.kv.snapshot.lease options pin history for the reading job") {
    wh
    spark.sql("CREATE TABLE gfs.db.leased (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.leased VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO gfs.db.leased VALUES (1, 9)")
    // planning a read with a lease id acquires the lease (reference
    // options scan.kv.snapshot.lease.{id,duration})
    val leased = spark.read
      .option("scan.kv.snapshot.lease.id", "batch-7")
      .option("scan.kv.snapshot.lease.duration", "1h")
      .option("scan.startup.mode", "earliest")
      .table("gfs.db.leased")
    assert(leased.count() == 4) // +I,+I,-U,+U
    val t = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.gfs.warehouse"), spark)
      .getTable("db", "leased")
    assert(t.kvSnapshotLeases().contains("batch-7"))
    // maintenance cannot cut the leased history
    t.compact(); t.vacuumLog()
    assert(leased.count() == 4, "leased log must survive vacuum")
    spark.sql("CALL gfs.system.drop_kv_snapshot_lease(table => 'db.leased', " +
      "lease_id => 'batch-7')")
    t.vacuumLog()
    assert(spark.read.option("scan.startup.mode", "earliest")
      .table("gfs.db.leased").count() < 4)
  }

  test("metadata tables: SELECT from .changelog/.binlog/.history/.partitions") {
    wh
    spark.sql("CREATE TABLE gfs.db.meta (k BIGINT, v INT, dt STRING) USING graft " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('primary.key' = 'dt,k')")
    spark.sql("INSERT INTO gfs.db.meta VALUES (1, 1, '2024-01-01'), (2, 2, '2024-01-02')")
    spark.sql("INSERT INTO gfs.db.meta VALUES (1, 9, '2024-01-01')")

    val cl = spark.sql("SELECT _change_type FROM gfs.db.meta.changelog")
      .collect().map(_.getString(0))
    assert(cl.count(_ == "+I") == 2 && cl.count(_ == "+U") == 1 && cl.count(_ == "-U") == 1)

    val bl = spark.sql(
      "SELECT _change_type FROM gfs.db.meta.binlog WHERE _change_type = '+U'").collect()
    assert(bl.length == 1)

    val hist = spark.sql(
      "SELECT version, rows_appended FROM gfs.db.meta.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hist.toSeq == Seq((1L, 2L), (2L, 2L))) // commit 2: -U/+U pair

    val parts = spark.sql("SELECT partition FROM gfs.db.meta.partitions ORDER BY 1")
      .collect().map(_.getString(0)).toSeq
    assert(parts == Seq("dt=2024-01-01", "dt=2024-01-02"))

    // files metadata: every visible file accounted for, rows sum to the
    // changelog row count, offset ranges and commit ids populated
    val fl = spark.sql("SELECT file, commit_id, bytes, bucket, n_rows, " +
        "min_offset, max_offset FROM gfs.db.meta.files")
      .collect()
    assert(fl.nonEmpty)
    assert(fl.map(_.getLong(4)).sum == 4)             // 2 + (-U,+U pair) rows
    assert(fl.forall(r => r.getString(0).endsWith(".parquet")
      && r.getString(1) != null && r.getLong(2) > 0
      && r.getLong(6) >= r.getLong(5)))

    // offsets metadata (the reference Admin's listOffsets): next offsets
    // sum to the changelog row count; earliest is 0 pre-vacuum
    val off = spark.sql("SELECT bucket, earliest_offset, next_offset " +
      "FROM gfs.db.meta.offsets").collect()
    assert(off.map(_.getLong(2)).sum == 4)
    assert(off.forall(r => r.getLong(1) == 0L))

    // metrics metadata: this process's engine counters for the table
    val met = spark.sql("SELECT metric, value FROM gfs.db.meta.metrics")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(met(graft.core.GraftMetrics.Commits) >= 2)
    assert(met(graft.core.GraftMetrics.CommittedRows) >= 4)

    // detail metadata (DESCRIBE DETAIL analog): one row of table facts
    val det = spark.sql("SELECT * FROM gfs.db.meta.detail").collect()
    assert(det.length == 1)
    val d = det.head
    assert(d.getAs[String]("format") == "graft")
    assert(d.getAs[Boolean]("is_primary_key"))
    assert(d.getAs[String]("primary_key").split(",").contains("k"))
    assert(d.getAs[Long]("num_log_files") > 0)
    assert(d.getAs[Long]("size_bytes") > 0)
    assert(d.getAs[Long]("version") == 2L)

    // consumer groups: empty until a poller commits, then listed
    assert(spark.sql("SELECT * FROM gfs.db.meta.consumer_groups")
      .collect().isEmpty)
    val core = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.gfs.warehouse"), spark)
    val poller = new graft.streaming.LogPoller(
      core.getTable("db", "meta"), "grp1")
    poller.poll(); poller.commit()
    val cg = spark.sql(
      "SELECT group, committed_position, lag FROM gfs.db.meta.consumer_groups")
      .collect()
    assert(cg.map(_.getString(0)).toSeq == Seq("grp1"))
    assert(cg.head.getLong(1) == 4L) // the full changelog consumed
    assert(cg.head.getLong(2) == 0L) // fully caught up
    // new appends show up as lag until the group polls again
    spark.sql("INSERT INTO gfs.db.meta VALUES (9, 9, '2024-01-03')")
    val lag2 = spark.sql("SELECT lag FROM gfs.db.meta.consumer_groups")
      .collect().head.getLong(0)
    assert(lag2 > 0L, s"expected positive lag after a new append, got $lag2")
    poller.poll(); poller.commit()
    assert(spark.sql("SELECT lag FROM gfs.db.meta.consumer_groups")
      .collect().head.getLong(0) == 0L)

    // schema history (.schemas, the reference's SchemaInfo ids): the DDL
    // ALTER above the connector surface registers version 2
    spark.sql("ALTER TABLE gfs.db.meta ADD COLUMN note STRING")
    val sch = spark.sql(
      "SELECT schema_id, columns FROM gfs.db.meta.schemas ORDER BY schema_id")
      .collect()
    assert(sch.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(!sch(0).getString(1).contains("note"))
    assert(sch(1).getString(1).contains("note"))
  }

  test("CALL system procedures: create/refresh_vector_index probe the IVF index") {
    wh
    spark.sql("CREATE TABLE gfs.db.vx (vid BIGINT, emb ARRAY<DOUBLE>) " +
      "USING graft TBLPROPERTIES ('primary.key' = 'vid', 'bucket.num' = '2')")
    val rnd = new scala.util.Random(5)
    val rows = (1 to 40).map(i =>
      s"($i, array(${Seq.fill(4)(rnd.nextGaussian()).mkString(",")}))")
    spark.sql(s"INSERT INTO gfs.db.vx VALUES ${rows.mkString(",")}")
    val msg = spark.sql(
      "CALL gfs.system.create_vector_index('db.vx', 'db.vx_ivf', 'emb', 4)")
      .head.getString(0)
    assert(msg.contains("4 lists"))
    val core = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.gfs.warehouse"), spark)
    val vi = graft.core.VectorIndex.open(core.getTable("db", "vx"),
      "vid", "emb", core.getTable("db", "vx_ivf"))
    assert(vi.topK(Seq(0.1, -0.2, 0.3, 0.4), k = 5, nprobe = 2).count() == 5)
    // stale after a write; procedure refresh catches up
    spark.sql("INSERT INTO gfs.db.vx VALUES (99, array(1.0, 0.0, 0.0, 0.0))")
    intercept[IllegalArgumentException](vi.topK(Seq(1.0, 0.0, 0.0, 0.0), 3, 2))
    spark.sql("CALL gfs.system.refresh_vector_index('db.vx', 'db.vx_ivf')")
    val top = vi.topK(Seq(1.0, 0.0, 0.0, 0.0), 3, 4)
      .collect().map(_.getLong(0))
    assert(top.head == 99L) // the freshly indexed exact-match vector wins
  }

  test("CALL system procedures: compact, rewrite_files, expire_partitions") {
    wh
    spark.sql("CREATE TABLE gfs.db.mt (k BIGINT, v INT, dt STRING) USING graft " +
      "PARTITIONED BY (dt) TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')")
    spark.sql("INSERT INTO gfs.db.mt VALUES (1, 1, '2024-01-01'), (2, 2, '2024-01-02')")
    spark.sql("INSERT INTO gfs.db.mt VALUES (3, 3, '2024-01-02')")

    val rewritten = spark.sql("CALL gfs.system.rewrite_files('db.mt')").collect()
    assert(rewritten.head.getString(0).contains("rewritten"))
    assert(spark.sql("SELECT count(*) FROM gfs.db.mt").head.getLong(0) == 3)

    // z-ordered variant: layout-only change, rows intact
    val zrw = spark.sql(
      "CALL gfs.system.rewrite_files('db.mt', 0, 'k, v')").collect()
    assert(zrw.head.getString(0).contains("z-ordered by k,v"))
    assert(spark.sql("SELECT count(*) FROM gfs.db.mt").head.getLong(0) == 3)

    // property-driven variant: the spec lives on the table
    spark.sql("ALTER TABLE gfs.db.mt SET TBLPROPERTIES " +
      "('table.rewrite.zorder-by' = 'v,k')")
    val zrw2 = spark.sql(
      "CALL gfs.system.rewrite_files('db.mt', 0, 'table')").collect()
    assert(zrw2.head.getString(0).contains("z-ordered by v,k"))
    assert(spark.sql("SELECT count(*) FROM gfs.db.mt").head.getLong(0) == 3)

    val expired = spark.sql(
      "CALL gfs.system.expire_partitions('db.mt', 'dt', '2024-01-02')").collect()
    assert(expired.head.getInt(0) == 1)
    assert(spark.sql("SELECT count(*) FROM gfs.db.mt").head.getLong(0) == 2)

    // Delta-format lake surface through SQL: tier twice, read back by
    // log replay, then the property-driven maintenance tick
    spark.sql("CREATE TABLE gfs.db.dl (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.dl VALUES (1, 1), (2, 2)")
    val dlOut = java.nio.file.Files
      .createTempDirectory("graft-sql-delta").toString
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_delta('db.dl', '$dlOut')")
      .head.getString(0).contains("delta log version 0"))
    spark.sql("INSERT INTO gfs.db.dl VALUES (1, 99)")
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_delta('db.dl', '$dlOut')")
      .head.getString(0).contains("tiered"))
    assert(graft.core.DeltaExport.readLive(spark, dlOut)
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 99), (2L, 2)))
    assert(spark.sql("CALL gfs.system.maintain_lake('db.dl')")
      .head.getString(0).contains("disabled"))
    spark.sql(s"""ALTER TABLE gfs.db.dl SET TBLPROPERTIES (
      'table.datalake.enabled' = 'true',
      'table.datalake.dir' = '$dlOut',
      'table.datalake.format' = 'delta')""")
    // tiered moments ago -> inside the default 3m freshness window
    assert(spark.sql("CALL gfs.system.maintain_lake('db.dl')")
      .head.getString(0).startsWith("lake fresh"))
    // format-dispatched history expiry through SQL: version 0's
    // tombstoned files are reclaimed, only version 1 remains readable
    val dexp = spark.sql(
      s"CALL gfs.system.expire_lake_snapshots('$dlOut', 1, 'delta')")
      .head.getString(0)
    assert(dexp.contains("retained version(s) 1"), dexp)
    assert(graft.core.DeltaExport.earliestVersion(dlOut).contains(1L))
    assert(graft.core.DeltaExport.readLive(spark, dlOut).count() == 2)

    // Paimon-format lake surface through SQL: tier twice, read back
    // through the snapshot/manifest metadata, then expire to keep-last 1
    val pmOut = java.nio.file.Files
      .createTempDirectory("graft-sql-paimon").toString
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_paimon('db.dl', '$pmOut')")
      .head.getString(0).contains("paimon snapshot 1"))
    spark.sql("INSERT INTO gfs.db.dl VALUES (2, 22)")
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_paimon('db.dl', '$pmOut')")
      .head.getString(0).contains("tiered"))
    assert(graft.core.PaimonExport.readLive(spark, pmOut)
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 99), (2L, 22)))
    val pexp = spark.sql(
      s"CALL gfs.system.expire_lake_snapshots('$pmOut', 1, 'paimon')")
      .head.getString(0)
    assert(pexp.contains("retained snapshot(s) 2"), pexp)
    assert(graft.core.PaimonExport.earliestSnapshotId(pmOut).contains(2L))
    assert(graft.core.PaimonExport.readLive(spark, pmOut).count() == 2)

    // Hudi-format lake surface through SQL: tier twice (the second is a
    // replacecommit), read back through the timeline, then expire to
    // keep-last 1
    val huOut = java.nio.file.Files
      .createTempDirectory("graft-sql-hudi").toString
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_hudi('db.dl', '$huOut')")
      .head.getString(0).contains("hudi timeline instant 1"))
    spark.sql("INSERT INTO gfs.db.dl VALUES (2, 222)")
    assert(spark.sql(s"CALL gfs.system.tier_snapshot_hudi('db.dl', '$huOut')")
      .head.getString(0).contains("tiered"))
    assert(graft.core.HudiExport.readLive(spark, huOut)
      .select("k", "v").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 99), (2L, 222)))
    val hexp = spark.sql(
      s"CALL gfs.system.expire_lake_snapshots('$huOut', 1, 'hudi')")
      .head.getString(0)
    assert(hexp.contains("retained instant(s)"), hexp)
    assert(graft.core.HudiExport.completedInstants(huOut).size == 1)
    assert(graft.core.HudiExport.readLive(spark, huOut).count() == 2)

    // lake union read through the catalog: with the session flag on, a
    // lake-enabled table's batch read resolves cold state from its
    // table.datalake.* lake dir and merges only the fresh (un-tiered)
    // log tail — the delta lake still holds (1,99),(2,2) from tier time,
    // the (2,22)/(2,222) upserts exist only in the log
    spark.conf.set("spark.sql.graft.read.lake-union", "true")
    try assert(spark.sql("SELECT k, v FROM gfs.db.dl ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 99), (2L, 222)))
    finally spark.conf.unset("spark.sql.graft.read.lake-union")

    // the .lake metadata table reports the tier state and freshness lag
    // (the Admin getLatestLakeSnapshot surface): the (2,22)/(2,222)
    // upserts landed after the last tier, so the lake lags the log
    val lakeRow = spark.sql("SELECT * FROM gfs.db.dl.lake").head
    assert(lakeRow.getBoolean(0), lakeRow) // enabled
    assert(lakeRow.getString(2) == "delta", lakeRow)
    assert(lakeRow.getString(3) != null, lakeRow) // latest_snapshot
    assert(lakeRow.getLong(5) > 0L, lakeRow) // lag
    assert(lakeRow.getLong(6) >= 1L, lakeRow) // live_files
    // a table with no datalake policy reports one disabled row
    val off = spark.sql("SELECT * FROM gfs.db.mt.lake").head
    assert(!off.getBoolean(0), off)

    // PK table: compact then vacuum through SQL
    spark.sql("CREATE TABLE gfs.db.mpk (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.mpk VALUES (1, 1), (2, 2)")
    assert(spark.sql("CALL gfs.system.compact('db.mpk')")
      .head.getString(0).contains("snapshot"))
    spark.sql("INSERT INTO gfs.db.mpk VALUES (1, 9)")
    assert(spark.sql("CALL gfs.system.vacuum_log('db.mpk')")
      .head.getString(0).contains("vacuumed"))
    val st = spark.sql("SELECT k, v FROM gfs.db.mpk ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(st == Seq((1L, 9), (2L, 2)))

    // in-place restore through SQL: v1 is reconstructible even after the
    // vacuum (the snapshot cutoff IS v1 — the snapshot tier serves it),
    // so the k=1 -> 9 upsert is undone
    assert(spark.sql("CALL gfs.system.rollback_to_version('db.mpk', 1)")
      .head.getString(0).contains("restored to version 1"))
    assert(spark.sql("SELECT k, v FROM gfs.db.mpk ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("VERSION AS OF reads the state at a recorded commit version") {
    wh
    spark.sql("CREATE TABLE gfs.db.vt (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.vt VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO gfs.db.vt VALUES (1, 99), (3, 3)")
    val v1 = spark.sql("SELECT k, v FROM gfs.db.vt VERSION AS OF 1 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(v1 == Seq((1L, 1), (2L, 2)))
    val v2 = spark.sql("SELECT k, v FROM gfs.db.vt VERSION AS OF 2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(v2 == Seq((1L, 99), (2L, 2), (3L, 3)))
  }

  test("PARTITIONED BY creates a hive-partitioned log table; pruning works") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.part (k BIGINT, v INT, dt STRING)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gfs.db.part VALUES " +
      "(1, 1, '2024-01-01'), (2, 2, '2024-01-02'), (3, 3, '2024-01-02')")
    assert(spark.sql("SELECT count(*) FROM gfs.db.part WHERE dt = '2024-01-02'")
      .collect()(0).getLong(0) == 2)
    // partition keys landed in the descriptor (identity transform mapping)
    assert(spark.table("gfs.db.part").schema.fieldNames.contains("dt"))
  }

  test("DELETE FROM routes through the merge path and logs -D changes") {
    wh
    spark.sql("CREATE TABLE gfs.db.del (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.del VALUES (1, 1), (2, 2), (3, 3)")
    spark.sql("DELETE FROM gfs.db.del WHERE v >= 2")
    assert(spark.sql("SELECT k FROM gfs.db.del").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    // the deletes went through the changelog, not a file rewrite
    val cat = spark.sessionState.catalogManager.catalog("gfs")
      .asInstanceOf[GraftCatalog]
    val t = cat.loadTable(org.apache.spark.sql.connector.catalog.Identifier
      .of(Array("db"), "del")).asInstanceOf[GraftDsTable].table
    assert(t.changelog().filter(org.apache.spark.sql.functions
      .col("_change_type") === "-D").count() == 2)
  }

  test("DELETE FROM errors on engines that treat deletes as no-ops") {
    wh
    spark.sql("""CREATE TABLE gfs.db.ver (k BIGINT, v INT, ts BIGINT)
      USING graft TBLPROPERTIES ('primary.key' = 'k',
        'table.merge-engine' = 'versioned',
        'table.merge-engine.versioned.ver-column' = 'ts')""")
    spark.sql("INSERT INTO gfs.db.ver VALUES (1, 1, 10)")
    // silently succeeding while deleting nothing would be worse than
    // failing: the engine ignores deletes, so the statement must error
    intercept[Exception] {
      spark.sql("DELETE FROM gfs.db.ver WHERE k = 1")
    }
    assert(spark.sql("SELECT count(*) FROM gfs.db.ver").collect()(0).getLong(0) == 1)
  }

  test("DataFrame API reads the same catalog table (spark.table)") {
    wh
    spark.sql("CREATE TABLE gfs.db.dfapi (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.dfapi VALUES (1, 1), (1, 2)")
    val df = spark.table("gfs.db.dfapi").filter(col("k") === 1).select("v")
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("SHOW PARTITIONS / ALTER TABLE ADD|DROP PARTITION") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.pm (k BIGINT, v INT, dt STRING)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gfs.db.pm VALUES (1, 1, '2024-01-01'), (2, 2, '2024-01-02')")
    def parts() = spark.sql("SHOW PARTITIONS gfs.db.pm")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(parts() == Seq("dt=2024-01-01", "dt=2024-01-02"))
    // pre-create an upcoming partition: listed, but scans stay unaffected
    spark.sql("ALTER TABLE gfs.db.pm ADD PARTITION (dt='2024-01-03')")
    assert(parts() == Seq("dt=2024-01-01", "dt=2024-01-02", "dt=2024-01-03"))
    assert(spark.sql("SELECT count(*) FROM gfs.db.pm").collect()(0).getLong(0) == 2)
    intercept[Exception] {
      spark.sql("ALTER TABLE gfs.db.pm ADD PARTITION (dt='2024-01-03')")
    }
    // drop removes data and listing
    spark.sql("ALTER TABLE gfs.db.pm DROP PARTITION (dt='2024-01-01')")
    assert(parts() == Seq("dt=2024-01-02", "dt=2024-01-03"))
    assert(spark.sql("SELECT k FROM gfs.db.pm").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES persists dynamic options") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.props (k BIGINT, v INT) USING graft
      TBLPROPERTIES ('primary.key' = 'k', 'table.log.ttl' = '7d')""")
    def props() = spark.sql("SHOW TBLPROPERTIES gfs.db.props")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("table.log.ttl").contains("7d"))
    spark.sql("""ALTER TABLE gfs.db.props SET TBLPROPERTIES (
      'table.log.ttl' = '3d', 'table.auto-partition.enabled' = 'true')""")
    assert(props().get("table.log.ttl").contains("3d"))
    assert(props().get("table.auto-partition.enabled").contains("true"))
    spark.sql("ALTER TABLE gfs.db.props UNSET TBLPROPERTIES ('table.log.ttl')")
    assert(!props().contains("table.log.ttl"))
    // survives a fresh catalog load (persisted in meta.json)
    val t = new graft.core.Catalog(wh, spark).getTable("db", "props")
    assert(t.desc.properties ==
      Map("table.auto-partition.enabled" -> "true"))
    // structural options stay immutable, like the reference
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gfs.db.props SET TBLPROPERTIES ('primary.key' = 'v')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("fixed at CREATE TABLE time")))
  }

  test("scan reports statistics: small catalog tables broadcast in joins") {
    wh
    graft.plans.BucketPruning.install(spark) // V1StatsRule rides along
    spark.sql("CREATE TABLE gfs.db.statdim (k BIGINT, name STRING) USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')")
    spark.sql("CREATE TABLE gfs.db.statfact (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')")
    spark.sql("INSERT INTO gfs.db.statdim VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gfs.db.statfact VALUES (1, 10), (2, 20), (1, 30)")
    val joined = spark.sql(
      "SELECT f.k, f.v, d.name FROM gfs.db.statfact f JOIN gfs.db.statdim d ON f.k = d.k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tiny dim should broadcast (stats-driven), got:\n$plan")
    assert(joined.count() == 3)
  }

  test("create_index / refresh_index procedures: SQL-visible index table") {
    wh
    spark.sql("CREATE TABLE gfs.db.idxbase (k BIGINT, cat STRING, v INT) " +
      "USING graft TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.idxbase VALUES (1, 'a', 1), (2, 'b', 2), (3, 'a', 3)")
    val created = spark.sql(
      "CALL gfs.system.create_index('db.idxbase', 'db.idxbase_by_cat', 'cat')").collect()
    assert(created.head.getString(0).contains("built"))
    // the index is an ordinary catalog table: SQL probes it directly
    val ks = spark.sql(
      "SELECT k FROM gfs.db.idxbase_by_cat WHERE cat = 'a' ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(ks == Seq(1L, 3L))
    spark.sql("INSERT INTO gfs.db.idxbase VALUES (1, 'b', 10), (4, 'a', 4)")
    val refreshed = spark.sql(
      "CALL gfs.system.refresh_index('db.idxbase', 'db.idxbase_by_cat')").collect()
    assert(refreshed.head.getString(0).contains("refreshed"))
    val ks2 = spark.sql(
      "SELECT k FROM gfs.db.idxbase_by_cat WHERE cat = 'a' ORDER BY k").collect()
      .map(_.getLong(0)).toSeq
    assert(ks2 == Seq(3L, 4L), "k=1 moved from cat a to b")
  }

  test("maintain_partitions reads the policy from table properties") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.autop (k BIGINT, v INT, dt STRING)
      USING graft PARTITIONED BY (dt)
      TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    // not enabled -> clean error
    val e = intercept[Exception] {
      spark.sql("CALL gfs.system.maintain_partitions('db.autop', 'table')").collect()
    }
    assert(e.getMessage.contains("table.auto-partition.enabled"))
    spark.sql("""ALTER TABLE gfs.db.autop SET TBLPROPERTIES (
      'table.auto-partition.enabled' = 'true',
      'table.auto-partition.time-unit' = 'day',
      'table.auto-partition.num-precreate' = '2',
      'table.auto-partition.num-retention' = '7')""")
    val msg = spark.sql("CALL gfs.system.maintain_partitions('db.autop', 'table')")
      .collect()(0).getString(0)
    assert(msg.startsWith("pre-created ["))
    val today = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd")
      .format(java.time.Instant.now().atZone(java.time.ZoneId.of("UTC")))
    assert(spark.sql("SHOW PARTITIONS gfs.db.autop")
      .collect().map(_.getString(0)).contains(s"dt=$today"))
  }

  test("DDL CHAR(n) column: over-length INSERT fails, valid rows read back") {
    wh
    spark.sql("CREATE TABLE gfs.db.chr (k BIGINT, code CHAR(3)) USING graft " +
      "TBLPROPERTIES ('primary.key' = 'k')")
    spark.sql("INSERT INTO gfs.db.chr VALUES (1, 'abc'), (2, 'ab')")
    // Spark's char-padding reads 'ab' back as 'ab ' (charVarcharAsString
    // off) or 'ab'; compare on rtrim to stay semantics-agnostic
    val got = spark.sql("SELECT k, rtrim(code) c FROM gfs.db.chr ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "abc"), (2L, "ab")))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gfs.db.chr VALUES (3, 'abcd')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("value too long") ||
      m.contains("EXCEED_LIMIT_LENGTH") || m.contains("exceeds char/varchar")))
    assert(spark.sql("SELECT count(*) FROM gfs.db.chr").collect()(0).getLong(0) == 2)
  }

  test("<tbl>.buckets metadata table: per-bucket files/bytes/log rows — " +
      "the SQL observability behind CALL sys.suggest_rebucket") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.bload (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    spark.sql("INSERT INTO gfs.db.bload SELECT id, CAST(id AS INT) " +
      "FROM range(1, 101)")
    val rows = spark.sql(
        "SELECT bucket, num_files, bytes, log_rows FROM gfs.db.bload.buckets " +
        "ORDER BY bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0, 1), rows.toSeq)
    assert(rows.forall(r => r._2 > 0 && r._3 > 0), rows.toSeq)
    assert(rows.map(_._4).sum == 100L, rows.toSeq)
    // an operator's hot-bucket query composes like any SQL
    assert(spark.sql("SELECT max(bytes) FROM gfs.db.bload.buckets")
      .collect()(0).getLong(0) > 0)
  }

  test("suggest_rebucket warns and caps when the bucket-key NDV is below " +
      "the volume-based suggestion (more buckets cannot help)") {
    wh
    spark.sql("""
      CREATE TABLE gfs.db.lowndv (k BIGINT, v STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '2')""")
    // 3 distinct keys over many rows: a 1-byte target asks for thousands
    // of buckets by volume, but hashing 3 keys can fill at most 3
    spark.sql("INSERT INTO gfs.db.lowndv SELECT id % 3, repeat('x', 100) " +
      "FROM range(0, 3000)")
    val res = spark.sql("CALL gfs.system.suggest_rebucket('db.lowndv', 1)")
      .collect()(0).getString(0)
    assert(res.contains("WARNING") && res.contains("NDV"), res)
    assert(res.contains("p99_bucket_bytes=") && res.contains("mean_bucket_bytes="), res)
    // capped at the (HLL-estimated) key NDV, not the volume suggestion
    val suggested = "suggested=(\\d+)".r.findFirstMatchIn(res).get.group(1).toInt
    assert(suggested <= 4, s"suggested=$suggested should be ~NDV(3): $res")
    val t = new graft.core.Catalog(wh, spark).getTable("db", "lowndv")
    assert(t.bucketKeyNdv().exists(n => n >= 2 && n <= 4))
  }
}
