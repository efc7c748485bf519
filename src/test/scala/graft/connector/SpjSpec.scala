package graft.connector

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.SparkTestBase

/** Storage-partitioned joins: co-bucketed graft tables joined on their
  * bucket keys plan with NO shuffle exchange on either side when the
  * scan preserves data grouping (GraftKeyGroupedScan +
  * GraftBucketFunction through the catalog's FunctionCatalog).
  */
class SpjSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-spj").toString
    spark.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spj.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.db")
    spark.sql("""
      CREATE TABLE spj.db.facts (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql(
      "INSERT INTO spj.db.facts SELECT id, CAST(id * 2 AS INT) FROM range(0, 50)")
    spark.sql("INSERT INTO spj.db.facts VALUES (7, 700), (13, 1300)")
    spark.sql("""
      CREATE TABLE spj.db.dims (k BIGINT, name STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql(
      "INSERT INTO spj.db.dims SELECT id, concat('n', id) FROM range(0, 50)")
    // co-bucketed PK table + its snapshot tier (read-optimized SPJ side)
    spark.sql("""
      CREATE TABLE spj.db.kv (k BIGINT, state STRING)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
    spark.sql(
      "INSERT INTO spj.db.kv SELECT id, concat('s', id) FROM range(0, 50)")
    new graft.core.Catalog(dir, spark).getTable("db", "kv").compact()
    // a table bucketed the same keys but a DIFFERENT count: never SPJ
    spark.sql("""
      CREATE TABLE spj.db.dims8 (k BIGINT, name STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '8')""")
    spark.sql(
      "INSERT INTO spj.db.dims8 SELECT id, concat('m', id) FROM range(0, 50)")
    dir
  }

  private def shuffles(df: DataFrame): Int = {
    df.collect() // finalize any adaptive plan before inspecting it
    // AQE hides exchanges inside leaf query stages; count through them
    def count(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => count(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        count(q.plan)
      case s: ShuffleExchangeExec => 1 + s.children.map(count).sum
      case other => other.children.map(count).sum
    }
    count(df.queryExecution.executedPlan)
  }

  private def withSpj[T](extra: (String, String)*)(body: => T): T = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.graft.read.preserve-data-grouping" -> "true",
      // SPJ must survive without broadcast shortcuts in the assertion
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") ++ extra
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val joinSql =
    """SELECT f.k, f.v, d.name FROM spj.db.facts f
       JOIN spj.db.dims d ON f.k = d.k"""

  test("co-bucketed append-append join elides both exchanges") {
    wh
    val (expected, base) = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      val df = spark.sql(joinSql)
      (df.collect().map(_.toSeq).toSet, shuffles(df))
    }
    assert(base >= 2, s"control run should shuffle both sides, saw $base")
    withSpj() {
      val df = spark.sql(joinSql)
      assert(shuffles(df) == 0,
        s"expected shuffle-free SPJ plan:\n${df.queryExecution.executedPlan}")
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("read-optimized PK snapshot side joins shuffle-free too") {
    wh
    val sql = """SELECT f.k, f.v, s.state FROM spj.db.facts f
                 JOIN spj.db.kv s ON f.k = s.k"""
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql(sql).collect().map(_.toSeq).toSet
    }
    withSpj("spark.sql.graft.read.optimized" -> "true") {
      val df = spark.sql(sql)
      assert(shuffles(df) == 0,
        s"expected shuffle-free plan:\n${df.queryExecution.executedPlan}")
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("mismatched bucket counts fall back to a shuffled join, correctly") {
    wh
    withSpj() {
      val df = spark.sql(
        """SELECT f.k, d.name FROM spj.db.facts f
           JOIN spj.db.dims8 d ON f.k = d.k""")
      val rows = df.collect()
      assert(shuffles(df) > 0, "4-bucket x 8-bucket must not co-partition")
      assert(rows.length == 52) // 50 ids + the two duplicate-k fact rows
    }
  }

  test("grouping conf off keeps the V1 path byte-identical") {
    wh
    val a = withSpj() { spark.sql(joinSql).collect().map(_.toSeq).toSet }
    val b = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql(joinSql).collect().map(_.toSeq).toSet
    }
    assert(a == b)
  }

  test("aggregation on the bucket keys reuses the grouping (no exchange)") {
    wh
    withSpj() {
      val df = spark.sql(
        "SELECT k, count(*) AS n, sum(v) AS sv FROM spj.db.facts GROUP BY k")
      assert(shuffles(df) == 0,
        s"group-by on bucket keys should not exchange:\n" +
          s"${df.queryExecution.executedPlan}")
      val byK = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(byK(7L) == 2 && byK(1L) == 1)
    }
  }

  test("offset gating holds: uncommitted rows invisible through SPJ scan") {
    wh
    // stage a CRASHED COMMIT's leftover: a real parquet file moved into
    // a bucket dir whose commit id never reached the manifest — the
    // grouped planner must drop it at the file level, like logDF
    val logDir = java.nio.file.Paths.get(wh, "db", "facts", "log")
    val victim = java.nio.file.Files.walk(logDir).iterator().asScala
      .find(_.toString.endsWith(".parquet")).get
    val ghost = victim.getParent.resolve(
      s"cid-${java.util.UUID.randomUUID()}-ghost.parquet")
    java.nio.file.Files.copy(victim, ghost)
    try withSpj() {
      val n = spark.sql("SELECT k, v FROM spj.db.facts").collect().length
      assert(n == 52, "uncommitted (manifest-absent) file rows leaked " +
        "through the grouped scan")
    } finally java.nio.file.Files.delete(ghost)
  }

  test("one side missing buckets still co-partitions (pushPartValues pad)") {
    wh
    // only 3 keys → most of the 4 buckets empty on this side; the join
    // must still plan shuffle-free (Spark pads the missing partition
    // values) and answer exactly
    spark.sql("""
      CREATE TABLE spj.db.sparse (k BIGINT, w INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.sparse VALUES (1, 10), (2, 20), (3, 30)")
    withSpj() {
      val df = spark.sql(
        """SELECT f.k, f.v, s.w FROM spj.db.facts f
           JOIN spj.db.sparse s ON f.k = s.k""")
      val rows = df.collect()
      assert(shuffles(df) == 0,
        s"sparse side should pad, not shuffle:\n" +
          s"${df.queryExecution.executedPlan}")
      assert(rows.map(r => (r.getLong(0), r.getInt(2))).toSet ==
        Set((1L, 10), (2L, 20), (3L, 30)))
    }
  }

  test("sys.rebucket aligns a mismatched dim to the fact's bucket count: " +
      "the join flips from shuffled to co-partitioned, same answer") {
    wh
    // an 8-bucket twin of dims: joins against 4-bucket facts must shuffle
    spark.sql("""
      CREATE TABLE spj.db.dims8r (k BIGINT, name STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '8')""")
    spark.sql(
      "INSERT INTO spj.db.dims8r SELECT id, concat('r', id) FROM range(0, 50)")
    val sql = """SELECT f.k, f.v, d.name FROM spj.db.facts f
                 JOIN spj.db.dims8r d ON f.k = d.k"""
    val (expected, mismatched) = withSpj() {
      val df = spark.sql(sql)
      (df.collect().map(_.toSeq).toSet, shuffles(df))
    }
    assert(mismatched > 0, "4x8 must not co-partition")
    spark.sql("CALL spj.system.rebucket('db.dims8r', 4)")
    withSpj() {
      val df = spark.sql(sql)
      assert(shuffles(df) == 0,
        s"rebucketed dim should co-partition:\n" +
          s"${df.queryExecution.executedPlan}")
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("partially-clustered distribution splits a skewed bucket, same answer") {
    wh
    // facts has two commits → multiple files per bucket; enabling
    // partially-clustered keeps those splits visible on the bigger side
    withSpj("spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled"
        -> "true") {
      val df = spark.sql(joinSql)
      assert(shuffles(df) == 0,
        s"partially-clustered SPJ should not shuffle:\n" +
          s"${df.queryExecution.executedPlan}")
      val expected = withSpj(
        "spark.sql.graft.read.preserve-data-grouping" -> "false") {
        spark.sql(joinSql).collect().map(_.toSeq).toSet
      }
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("grouped state input: PK collapse runs with no exchange, same state") {
    // kv is compacted (snapshot tier) — add a post-compact tail so the
    // grouped relation must union snapshot + gated log correctly
    wh
    spark.sql("INSERT INTO spj.db.kv VALUES (7, 's7b'), (60, 's60')")
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql("SELECT k, state FROM spj.db.kv").collect()
        .map(_.toSeq).toSet
    }
    assert(expected.contains(Seq(7L, "s7b")) &&
      expected.contains(Seq(60L, "s60")) && expected.size == 51)
    withSpj() {
      // catalog path: same answer (collapse inside the V1 bridge)
      val viaSql = spark.sql("SELECT k, state FROM spj.db.kv")
      assert(viaSql.collect().map(_.toSeq).toSet == expected)
      // engine path: the collapse is IN the inspected plan — zero
      // exchanges over the grouped snapshot ∪ tail relation
      val df = new graft.core.Catalog(wh, spark).getTable("db", "kv")
        .scan().select("k", "state")
      assert(df.collect().map(_.toSeq).toSet == expected)
      assert(shuffles(df) == 0,
        s"the PK collapse over the grouped state input should not " +
          s"exchange:\n${df.queryExecution.executedPlan}")
    }
  }

  test("grouped state input: never-compacted PK table reads log-only") {
    wh
    spark.sql("""
      CREATE TABLE spj.db.kvfresh (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.kvfresh VALUES (1, 1), (2, 2)")
    spark.sql("INSERT INTO spj.db.kvfresh VALUES (1, 10)")
    withSpj() {
      val rows = spark.sql("SELECT k, v FROM spj.db.kvfresh").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(rows == Set((1L, 10), (2L, 2)))
    }
  }

  test("grouped state feeds a co-located PK-fact join shuffle-free") {
    // engine-API join: collapse AND join in one plan (the catalog SQL
    // path serves PK reads through the V1 bridge, which re-plans the
    // collapse inside the relation — correct, but the join above it
    // cannot see the grouping)
    wh
    val c = new graft.core.Catalog(wh, spark)
    def join() = c.getTable("db", "facts").scan().as("f")
      .join(c.getTable("db", "kv").scan().as("s"), "k")
      .select("k", "v", "state")
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      join().collect().map(_.toSeq).toSet
    }
    withSpj() {
      val df = join()
      assert(shuffles(df) == 0,
        s"collapse AND join should ride the bucket grouping:\n" +
          s"${df.queryExecution.executedPlan}")
      assert(df.collect().map(_.toSeq).toSet == expected)
    }
  }

  test("runtime filtering prunes the fact scan to the dim keys' buckets") {
    wh
    // a selective dim side: 2 keys → at most 2 of facts' 4 buckets read;
    // force DPP without stats so the tiny test sizes still trigger it
    spark.sql("""
      CREATE TABLE spj.db.seldim (k BIGINT, tag STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.seldim VALUES (7, 'x'), (13, 'x'), (20, 'y')")
    val sql = """SELECT f.k, f.v, d.tag FROM spj.db.facts f
                 JOIN spj.db.seldim d ON f.k = d.k WHERE d.tag = 'x'"""
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql(sql).collect().map(_.toSeq).toSet
    }
    assert(expected.map(_.head).toSet == Set(7L, 13L))
    withSpj(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760") {
      val df = spark.sql(sql)
      val rows = df.collect().map(_.toSeq).toSet
      assert(rows == expected)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("RuntimeFilters: [dynamicpruning"),
        s"expected a runtime filter pushed into the fact scan:\n$plan")
    }
  }

  test("partitioned PK table: grouped state handles dt dirs on both tiers") {
    wh
    val c = new graft.core.Catalog(wh, spark)
    val df0 = spark.range(0, 40).selectExpr("id AS k",
      "CAST(id AS INT) AS v", "CASE WHEN id % 2 = 0 THEN '2024-01-01' ELSE '2024-01-02' END AS dt")
    val t = c.createTable("db", "kvpart", graft.core.TableDescriptor(
      df0.schema, primaryKey = Seq("k", "dt"), partitionKeys = Seq("dt"),
      numBuckets = 4))
    t.upsert(df0, orderBy = Seq(org.apache.spark.sql.functions.col("k")))
    t.compact()
    // post-compact tail touching one partition
    t.upsert(spark.sql("SELECT CAST(1 AS BIGINT) AS k, 111 AS v, '2024-01-02' AS dt"),
      orderBy = Seq(org.apache.spark.sql.functions.col("k")))
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      c.getTable("db", "kvpart").scan().collect().map(_.toSeq).toSet
    }
    assert(expected.contains(Seq(1L, 111, "2024-01-02")) && expected.size == 40)
    withSpj() {
      val df = c.getTable("db", "kvpart").scan()
      assert(df.collect().map(_.toSeq).toSet == expected)
      // partition filter on dt prunes dirs inside the grouped scan
      val one = df.filter("dt = '2024-01-01'")
      assert(one.collect().length == 20)
      assert(one.queryExecution.executedPlan.toString
        .contains("PartitionFilters: [dt = 2024-01-01]"))
    }
  }

  test("streaming read still works on a grouped catalog table") {
    // the Scan served under preserve-data-grouping must carry
    // toMicroBatchStream: Spark decides batch-vs-stream after build()
    wh
    withSpj() {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.table("spj.db.facts")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) =>
          buf ++= df.select("k").collect().map(_.getLong(0)); ()
        }
        .option("checkpointLocation",
          Files.createTempDirectory("graft-spj-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assert(buf.length == 52, s"drained ${buf.length} rows")
    }
  }

  test("grouped scans emit columnar batches (vectorized decode path)") {
    wh
    withSpj() {
      // append table: id-gated manifest proves the offset gate redundant
      // → the scan reports columnar and Spark plans ColumnarToRow on top
      val c = new graft.core.Catalog(wh, spark)
      val ap = c.getTable("db", "facts").scan().select("k", "v")
      val apRows = ap.collect()
      assert(apRows.length == 52)
      assert(ap.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"),
        s"grouped append scan should decode columnar:\n" +
          s"${ap.queryExecution.executedPlan}")
      // PK state input: the exact tail gate moved above the scan, so
      // snapshot AND tail partitions decode columnar under the collapse
      val pk = c.getTable("db", "kv").scan().select("k", "state")
      pk.collect()
      assert(pk.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"),
        s"grouped PK state scan should decode columnar:\n" +
          s"${pk.queryExecution.executedPlan}")
      // and the collapse above the columnar scan still plans no exchange
      assert(shuffles(pk) == 0)
    }
  }

  test("legacy manifest (no commit-id set) keeps the row-gated reader") {
    wh
    spark.sql("""
      CREATE TABLE spj.db.legacy (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.legacy VALUES (1, 10), (2, 20), (3, 30)")
    // strip the "ids" field — the pre-id-gating manifest format, where
    // the row-level offset gate is load-bearing (directory is the truth)
    val mf = java.nio.file.Paths.get(wh, "db", "legacy", "_offsets.json")
    val json = org.json4s.jackson.JsonMethods
      .parse(new String(java.nio.file.Files.readAllBytes(mf), "UTF-8"))
      .asInstanceOf[org.json4s.JObject]
    val stripped = org.json4s.JObject(json.obj.filterNot(_._1 == "ids"))
    java.nio.file.Files.write(mf, org.json4s.jackson.JsonMethods
      .compact(org.json4s.jackson.JsonMethods.render(stripped))
      .getBytes("UTF-8"))
    withSpj() {
      val df = new graft.core.Catalog(wh, spark).getTable("db", "legacy")
        .scan().select("k", "v")
      assert(df.collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
        Set((1L, 10), (2L, 20), (3L, 30)))
      assert(!df.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"),
        "legacy manifest must keep the row-gated reader (the gate can " +
          "fire; columnar output would skip it)")
    }
  }

  test("grouped lake union read: per-bucket merge, no exchange, columnar") {
    wh
    val c = new graft.core.Catalog(wh, spark)
    spark.sql("""
      CREATE TABLE spj.db.kvlake (k BIGINT, state STRING)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4',
        'table.datalake.layout' = 'bucket')""")
    spark.sql("INSERT INTO spj.db.kvlake SELECT id, concat('s', id) FROM range(0, 30)")
    val t = c.getTable("db", "kvlake")
    val lake = Files.createTempDirectory("graft-spj-lake").toString
    t.tierSnapshot(lake)
    // un-tiered tail: one update, one delete, one insert
    spark.sql("INSERT INTO spj.db.kvlake VALUES (7, 's7b'), (40, 's40')")
    spark.sql("DELETE FROM spj.db.kvlake WHERE k = 3")
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      t.scanLakeUnion(lake).select("k", "state").collect()
        .map(_.toSeq).toSet
    }
    assert(expected.contains(Seq(7L, "s7b")) &&
      expected.contains(Seq(40L, "s40")) &&
      !expected.exists(_.head == 3L) && expected.size == 30)
    withSpj() {
      val df = t.scanLakeUnion(lake).select("k", "state")
      assert(df.collect().map(_.toSeq).toSet == expected)
      assert(shuffles(df) == 0,
        s"the lake-union collapse should merge per bucket with no " +
          s"exchange:\n${df.queryExecution.executedPlan}")
      assert(df.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"),
        "grouped lake-union scan should decode columnar")
    }
  }

  test("catalog SQL PK read plans the grouped collapse (PkCollapseRule)") {
    wh
    graft.plans.BucketPruning.install(spark)
    val sql = """SELECT f.k, f.v, s.state FROM spj.db.facts f
                 JOIN spj.db.kv s ON f.k = s.k"""
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql(sql).collect().map(_.toSeq).toSet
    }
    withSpj() {
      // the PK side is the collapse over the grouped state input, IN
      // the SQL plan (not hidden inside a V1 bridge): the join sees the
      // bucket grouping on both sides and plans exchange-free
      val df = spark.sql(sql)
      assert(df.collect().map(_.toSeq).toSet == expected)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftKeyGroupedScan") &&
        plan.contains("State"),
        s"PK side should be the grouped state scan in-plan:\n$plan")
      assert(shuffles(df) == 0,
        s"catalog SQL join over the PK collapse should ride the " +
          s"grouping:\n$plan")
      // a full-PK point predicate reaches the grouped scan's bucket
      // pruning through the substitution's own optimization pass
      val point = spark.sql("SELECT k, state FROM spj.db.kv WHERE k = 7")
      assert(point.collect().map(_.toSeq).toSet ==
        expected.collect { case Seq(7L, _, s) => Seq(7L, s) }.toSet)
    }
    // DPP through the substitution: the built-in PartitionPruning batch
    // ran before the relation was swapped, so install() re-runs the rule
    // after PkCollapseRule — a selective dim join should still plant its
    // runtime filter over the substituted grouped scan
    spark.sql("""
      CREATE TABLE spj.db.seldim2 (k BIGINT, tag STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.seldim2 VALUES (7, 'x'), (13, 'y')")
    withSpj(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760") {
      val dpp = spark.sql(
        """SELECT s.k, s.state, d.tag FROM spj.db.kv s
           JOIN spj.db.seldim2 d ON s.k = d.k WHERE d.tag = 'x'""")
      val rows = dpp.collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(7L), rows.toSeq)
      val plan = dpp.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"selective dim should runtime-filter the substituted PK " +
          s"scan:\n$plan")
    }
    // conf off: the V1 bridge unchanged, same answer
    val off = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql(sql).collect().map(_.toSeq).toSet
    }
    assert(off == expected)
  }

  test("PkCollapseRule never touches writes or time travel") {
    wh
    graft.plans.BucketPruning.install(spark)
    withSpj() {
      // INSERT INTO a PK table (write target must stay a V1 write)
      spark.sql("INSERT INTO spj.db.kv VALUES (70, 's70')")
      assert(spark.sql("SELECT state FROM spj.db.kv WHERE k = 70")
        .collect().map(_.getString(0)).toSeq == Seq("s70"))
      // INSERT ... SELECT from the SAME table: target untouched, the
      // source read may substitute — both must work
      spark.sql("""INSERT INTO spj.db.kv
                   SELECT k + 1000, state FROM spj.db.kv WHERE k = 70""")
      assert(spark.sql("SELECT state FROM spj.db.kv WHERE k = 1070")
        .collect().map(_.getString(0)).toSeq == Seq("s70"))
      // DELETE (SupportsDelete path matches the bare relation)
      spark.sql("DELETE FROM spj.db.kv WHERE k = 1070")
      assert(spark.sql("SELECT * FROM spj.db.kv WHERE k = 1070")
        .collect().isEmpty)
      spark.sql("DELETE FROM spj.db.kv WHERE k = 70")
    }
  }

  test("grouped lake union on an APPEND table: concatenation reports " +
      "the grouping, join above plans exchange-free") {
    wh
    val c = new graft.core.Catalog(wh, spark)
    spark.sql("""
      CREATE TABLE spj.db.loglake (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4',
        'table.datalake.layout' = 'bucket')""")
    spark.sql("INSERT INTO spj.db.loglake SELECT id, CAST(id AS INT) FROM range(0, 30)")
    val t = c.getTable("db", "loglake")
    val lake = Files.createTempDirectory("graft-spj-loglake").toString
    t.tierSnapshot(lake)
    spark.sql("INSERT INTO spj.db.loglake VALUES (40, 40), (41, 41)")
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      t.scanLakeUnion(lake).select("k", "v").collect().map(_.toSeq).toSet
    }
    assert(expected.size == 32)
    withSpj() {
      val df = t.scanLakeUnion(lake).select("k", "v")
      assert(df.collect().map(_.toSeq).toSet == expected)
      assert(df.queryExecution.executedPlan.toString
        .contains("ColumnarToRow"))
      // a co-bucketed join ABOVE the union rides the reported grouping
      val joined = df.as("u")
        .join(c.getTable("db", "dims").scan().as("d"), "k")
        .select("k", "v", "name")
      val got = joined.collect().map(_.toSeq).toSet
      assert(got.size == 32, s"30 tiered + 2 tail rows, all in " +
        s"dims(0..49): ${got.size}")
      assert(shuffles(joined) == 0,
        s"append lake union should report the grouping to the join:\n" +
          s"${joined.queryExecution.executedPlan}")
    }
  }

  test("grouped state read refuses loudly when a compact moves the " +
      "pinned cutoffs mid-read") {
    wh
    spark.sql("""
      CREATE TABLE spj.db.kvrace (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("INSERT INTO spj.db.kvrace SELECT id, CAST(id AS INT) FROM range(0, 20)")
    val t = new graft.core.Catalog(wh, spark).getTable("db", "kvrace")
    t.compact()
    spark.sql("INSERT INTO spj.db.kvrace VALUES (1, 111)")
    withSpj() {
      // stateInput pins the snapshot cutoffs at DataFrame construction
      // and applies the exact tail gate above the scan from them; scan
      // planning re-checks the LIVE cutoffs — a compact landing in
      // between would otherwise double-deliver the re-tiered window
      val df = t.scan().select("k", "v")
      t.compact() // cutoffs move
      val e = intercept[Throwable](df.collect())
      def messages(x: Throwable): Seq[String] =
        Option(x).toSeq.flatMap(t =>
          Option(t.getMessage).toSeq ++ messages(t.getCause))
      assert(messages(e).exists(_.contains("concurrent compact")),
        s"expected the pinned-cutoff refusal, got: ${messages(e)}")
      // a freshly built plan reads the new state fine
      val rows = t.scan().select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(rows(1L) == 111 && rows.size == 20)
    }
  }

  test("catalog SQL lake-union read plans the grouped union, join " +
      "above rides it (PkCollapseRule)") {
    wh
    graft.plans.BucketPruning.install(spark)
    val c = new graft.core.Catalog(wh, spark)
    val lake = Files.createTempDirectory("graft-spj-lusql").toString
    spark.sql(s"""
      CREATE TABLE spj.db.kvlu (k BIGINT, state STRING)
      USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4',
        'table.datalake.enabled' = 'true', 'table.datalake.dir' = '$lake',
        'table.datalake.format' = 'iceberg',
        'table.datalake.layout' = 'bucket')""")
    spark.sql(
      "INSERT INTO spj.db.kvlu SELECT id, concat('s', id) FROM range(0, 40)")
    c.getTable("db", "kvlu").tierSnapshot(lake)
    // fresh tail: updates landing AFTER the tier
    spark.sql("INSERT INTO spj.db.kvlu VALUES (7, 'fresh7'), (41, 's41')")
    val sql = """SELECT u.k, u.state, d.name FROM spj.db.kvlu u
                 JOIN spj.db.dims d ON u.k = d.k"""
    // V1 lake-union read (grouping off) pins the expected answer
    val expected = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false",
      "spark.sql.graft.read.lake-union" -> "true") {
      spark.sql(sql).collect().map(_.toSeq).toSet
    }
    assert(expected.exists(_ == Seq(7L, "fresh7", "n7")), expected)
    withSpj("spark.sql.graft.read.lake-union" -> "true") {
      val df = spark.sql(sql)
      assert(df.collect().map(_.toSeq).toSet == expected)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GraftKeyGroupedScan") &&
        plan.contains("LakeUnion"),
        s"SQL lake-union read should be the grouped union in-plan:\n$plan")
      assert(shuffles(df) == 0,
        s"catalog SQL join over the lake union should ride the " +
          s"grouping:\n$plan")
    }
    // mode off again: plain PK read, fresh tail still wins (log holds all)
    val off = withSpj() {
      spark.sql("SELECT state FROM spj.db.kvlu WHERE k = 7")
        .collect().map(_.getString(0)).toSeq
    }
    assert(off == Seq("fresh7"))
  }

  test("MERGE: source read substitutes, target subtree stays untouched") {
    // rule-level test: graft tables don't execute MERGE (no row-level
    // MERGE support), but a graft PK table can be the SOURCE of a merge
    // into another catalog's table — the rule must substitute that read
    // while leaving the target relation alone (the strategy pattern-
    // matches it)
    wh
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, MergeIntoTable}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
    // un-substituted source relation, captured with grouping off
    val src = withSpj(
      "spark.sql.graft.read.preserve-data-grouping" -> "false") {
      spark.sql("SELECT k, state FROM spj.db.kv")
        .queryExecution.optimizedPlan
    }
    assert(src.collectFirst {
      case sr: DataSourceV2ScanRelation => sr }.isDefined, src)
    val target = LocalRelation(src.output.map(_.newInstance()))
    val merge = MergeIntoTable(target, src, Literal(true), Nil, Nil, Nil,
      withSchemaEvolution = false)
    withSpj() {
      val out = graft.plans.PkCollapseRule(merge)
        .asInstanceOf[MergeIntoTable]
      assert(out.targetTable eq target, "target subtree must not change")
      assert(out.sourceTable.collectFirst {
        case sr: DataSourceV2ScanRelation
            if sr.relation.table.isInstanceOf[GraftDsTable] => sr
      }.isEmpty,
        s"source should be the substituted collapse:\n${out.sourceTable}")
      assert(out.sourceTable.toString.contains("graft_grouped"),
        s"substituted source should read the grouped state input:\n" +
          s"${out.sourceTable}")
    }
  }

  test("auto grouping (default): rides bucket-count-vs-cores and " +
      "per-bucket-bytes thresholds") {
    wh
    // no session conf, no warehouse dynamic -> registry default 'auto';
    // the test session is local[8]
    assert(spark.sparkContext.defaultParallelism == 8)
    spark.sql("""
      CREATE TABLE spj.db.auto8 (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '8')""")
    spark.sql(
      "INSERT INTO spj.db.auto8 SELECT id, CAST(id AS INT) FROM range(0, 40)")
    spark.sql("""
      CREATE TABLE spj.db.auto4 (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql(
      "INSERT INTO spj.db.auto4 SELECT id, CAST(id AS INT) FROM range(0, 40)")
    val prev = spark.conf.getOption(graft.core.GroupedReads.Key)
    spark.conf.unset(graft.core.GroupedReads.Key)
    try {
      val wide = spark.sql("SELECT k, v FROM spj.db.auto8")
      assert(wide.queryExecution.executedPlan.toString
        .contains("GraftKeyGroupedScan"),
        "8 buckets on 8 cores: grouping costs no parallelism -> auto " +
          s"groups\n${wide.queryExecution.executedPlan}")
      assert(wide.collect().length == 40)
      // 4 buckets < 8 cores BUT tiny per-bucket bytes: the flat scan
      // would cut ~one split per bucket anyway -> auto still groups
      // (the saved exchange is free)
      val small = spark.sql("SELECT k, v FROM spj.db.auto4")
      assert(small.queryExecution.executedPlan.toString
        .contains("GraftKeyGroupedScan"),
        "tiny 4-bucket table should auto-group (no parallelism to " +
          s"lose)\n${small.queryExecution.executedPlan}")
      assert(small.collect().length == 40)
      // between the thresholds (few buckets AND per-bucket data past
      // maxPartitionBytes — simulated by shrinking the conf): the cap
      // is real, auto stays V1
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      try {
        val big = spark.sql("SELECT k, v FROM spj.db.auto4")
        assert(!big.queryExecution.executedPlan.toString
          .contains("GraftKeyGroupedScan"),
          "4 buckets on 8 cores with big buckets would cap scan " +
            s"parallelism -> auto stays V1\n" +
            s"${big.queryExecution.executedPlan}")
        assert(big.collect().length == 40)
      } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
    } finally prev.foreach(spark.conf.set(graft.core.GroupedReads.Key, _))
  }

  test("catalog bucket function is callable and matches the writer") {
    wh
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val viaSql = spark.sql(
      "SELECT spj.bucket(4, CAST(13 AS BIGINT))").collect()(0).getInt(0)
    val viaExpr = spark.range(13, 14)
      .select(pmod(hash(col("id")), lit(4))).collect()(0).getInt(0)
    assert(viaSql == viaExpr)
  }
}
