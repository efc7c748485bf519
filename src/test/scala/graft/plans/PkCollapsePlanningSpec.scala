package graft.plans

import java.nio.file.Files

import graft.SparkTestBase
import graft.connector.GraftCatalog

/** Planning-cost contract of [[PkCollapseRule]]: substitution builds ONE
  * nested optimized subplan per eligible relation — not one per
  * fixed-point iteration of the extra-optimizer batch, and not one per
  * QueryExecution of the same DataFrame. The memo is keyed on table
  * state + output exprIds + residual condition, so a state change
  * re-plans and a self-join's branches never share a subplan.
  */
class PkCollapsePlanningSpec extends SparkTestBase {

  private lazy val wh = {
    val dir = Files.createTempDirectory("graft-pkmemo").toString
    spark.conf.set("spark.sql.catalog.pkm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pkm.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pkm.db")
    (1 to 5).foreach { i =>
      spark.sql(s"""
        CREATE TABLE pkm.db.t$i (k BIGINT, v$i INT)
        USING graft TBLPROPERTIES ('primary.key' = 'k', 'bucket.num' = '4')""")
      spark.sql(s"""INSERT INTO pkm.db.t$i
        SELECT id, CAST(id * $i AS INT) FROM range(0, 50)""")
    }
    dir
  }

  private val fiveWay =
    """SELECT t1.k, t1.v1, t2.v2, t3.v3, t4.v4, t5.v5
       FROM pkm.db.t1 t1
       JOIN pkm.db.t2 t2 ON t1.k = t2.k
       JOIN pkm.db.t3 t3 ON t1.k = t3.k
       JOIN pkm.db.t4 t4 ON t1.k = t4.k
       JOIN pkm.db.t5 t5 ON t1.k = t5.k"""

  test("5 eligible relations -> exactly 5 nested optimizer passes, " +
      "and a second QueryExecution of the same plan pays zero") {
    wh
    BucketPruning.install(spark)
    val before = PkCollapseRule.nestedPasses.get()
    val df = spark.sql(fiveWay)
    df.queryExecution.optimizedPlan // force the optimization pass
    val planned = PkCollapseRule.nestedPasses.get() - before
    assert(planned == 5L,
      s"expected one nested pass per relation (5), got $planned")
    // EXPLAIN-then-execute: the same QueryExecution optimizes once, so
    // running it pays zero further nested passes
    val rows = df.collect()
    val after = PkCollapseRule.nestedPasses.get() - before
    assert(after == 5L, s"re-execution must not re-substitute: $after")
    assert(rows.length == 50)
    // and the result is the collapsed current state, exchange-checked by
    // content here (SpjSpec owns the exchange-count assertions)
    val row = rows.find(_.getLong(0) == 7L).get
    assert(row.getInt(2) == 14 && row.getInt(5) == 35)
    // a DERIVED plan (count prunes columns) legitimately re-substitutes —
    // narrower output means a different subplan — but still once per
    // relation, never per iteration
    val b2 = PkCollapseRule.nestedPasses.get()
    assert(df.count() == 50L)
    assert(PkCollapseRule.nestedPasses.get() - b2 <= 5L)
  }

  test("a table-state change invalidates the memo: the next plan " +
      "substitutes fresh") {
    wh
    BucketPruning.install(spark)
    val q = "SELECT k, v1 FROM pkm.db.t1 WHERE k < 10"
    val d1 = spark.sql(q)
    assert(d1.count() == 10L)
    val before = PkCollapseRule.nestedPasses.get()
    spark.sql("INSERT INTO pkm.db.t1 SELECT id, CAST(id AS INT) " +
      "FROM range(100, 103)")
    val d2 = spark.sql(q)
    assert(d2.count() == 10L)
    val fresh = PkCollapseRule.nestedPasses.get() - before
    assert(fresh >= 1L, "post-commit plan must rebuild the subplan")
    // the rebuilt plan reads the NEW state
    assert(spark.sql("SELECT count(*) FROM pkm.db.t1").collect()
      .head.getLong(0) == 53L)
  }

  test("self-join: both branches substitute with separate subplans " +
      "(distinct exprIds), results stay exact") {
    wh
    BucketPruning.install(spark)
    val before = PkCollapseRule.nestedPasses.get()
    val df = spark.sql(
      """SELECT a.k, a.v2, b.v2 AS bv FROM pkm.db.t2 a
         JOIN pkm.db.t2 b ON a.k = b.k WHERE a.k < 3""")
    val got = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 0, 0), (1L, 2, 2), (2L, 4, 4)), got)
    val passes = PkCollapseRule.nestedPasses.get() - before
    assert(passes == 2L, s"self-join branches must each substitute: $passes")
  }
}
