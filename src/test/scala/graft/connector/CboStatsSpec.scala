package graft.connector

import java.nio.file.Files

import graft.SparkTestBase

/** Column-level planner statistics: footer min/max/nulls reach Spark's
  * CBO through the DSv2 `columnStats()` surface (forwarded across the V1
  * bridge by V1StatsRule), so a SELECTIVE filter on a graft scan shrinks
  * the size estimate and flips a join to broadcast at PLAN time — not
  * AQE-late after the first map stage. AQE is disabled in these tests so
  * the assertion is on the initial plan.
  */
class CboStatsSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-cbo").toString
    spark.conf.set("spark.sql.catalog.cbo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cbo.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cbo.db")
    spark.sql("""
      CREATE TABLE cbo.db.facts (k BIGINT, v INT)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("""INSERT INTO cbo.db.facts
      SELECT id % 20000, CAST(id AS INT) FROM range(0, 60000)""")
    spark.sql("""
      CREATE TABLE cbo.db.dim (k BIGINT, name STRING)
      USING graft TBLPROPERTIES ('bucket.key' = 'k', 'bucket.num' = '4')""")
    spark.sql("""INSERT INTO cbo.db.dim
      SELECT id, concat('name-', id, '-', repeat('x', 30))
      FROM range(0, 20000)""")
    dir
  }

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val sql =
    """SELECT f.k, f.v, d.name FROM cbo.db.facts f
       JOIN cbo.db.dim d ON f.k = d.k WHERE d.k < 200"""

  test("footer column stats flip a selectively-filtered join to " +
      "broadcast at plan time") {
    wh
    graft.plans.BucketPruning.install(spark)
    // threshold sits between the dim's full size (hundreds of KB) and
    // the filtered 1% estimate — only selectivity estimation crosses it
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "65536")
    val planned = withConfs(confs :+
        ("spark.sql.cbo.enabled" -> "true"): _*) {
      val df = spark.sql(sql)
      val plan = df.queryExecution.sparkPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"selective filter should broadcast the dim at plan time:\n$plan")
      df.collect().map(_.toSeq).toSet
    }
    // control: CBO off -> filter does not shrink the estimate -> the
    // initial plan keeps the sort-merge join. Same answer either way.
    val control = withConfs(confs :+
        ("spark.sql.cbo.enabled" -> "false"): _*) {
      val df = spark.sql(sql)
      val plan = df.queryExecution.sparkPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"control should stay sort-merge without selectivity stats:\n$plan")
      df.collect().map(_.toSeq).toSet
    }
    assert(planned == control && planned.size == 600,
      s"${planned.size} rows") // 200 dim keys × 3 fact rows each
  }

  test("columnPlannerStats: exact bounds and null counts, cached and " +
      "capped") {
    wh
    val t = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.cbo.warehouse"), spark)
      .getTable("db", "dim")
    val stats = t.columnPlannerStats()
    val k = stats("k")
    assert(k.min == 0L && k.max == 19999L && k.nullCount == 0L, k)
    // strings are not estimation-usable; never reported
    assert(!stats.contains("name"))
    // identical state -> the SAME cached map instance (no re-sweep)
    assert(t.columnPlannerStats() eq stats)
  }

  test("partition-key columns report exact dir-value stats (no footers)") {
    wh
    val c = new graft.core.Catalog(
      spark.conf.get("spark.sql.catalog.cbo.warehouse"), spark)
    import org.apache.spark.sql.types._
    val t = c.createTable("db", "pstats", graft.core.TableDescriptor(
      StructType(Seq(StructField("dt", IntegerType),
        StructField("k", LongType), StructField("v", IntegerType))),
      bucketKeys = Seq("k"), numBuckets = 2, partitionKeys = Seq("dt")))
    val df = spark.range(0, 300).selectExpr(
      "CAST(id % 3 + 10 AS INT) AS dt", "id AS k", "CAST(id AS INT) AS v")
    t.append(df, orderBy = Seq(df("k")))
    val stats = t.columnPlannerStats()
    val dt = stats("dt")
    // bounds and the TRUE distinct count from the dir names
    assert(dt.min == 10 && dt.max == 12 && dt.nonNullCount == 3L, dt)
    assert(stats("k").min == 0L && stats("k").max == 299L)
  }
}
