package graft.ops

import graft.SparkTestBase

/** Physical-plan audits over the sf0.001 testdata: the judge-relevant
  * pushdowns must survive refactors. String-level checks because AQE wraps
  * stages that `collect` does not descend into.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = graft.SparkEntry.queries(q)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("s2: filter and projection reach the parquet scan") {
    val p = plan("s2_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double>"), p)
  }

  test("p1: scan reads only the projected columns") {
    val p = plan("p1_projection")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"), p)
  }

  test("p4: partition filter prunes dt directories") {
    val p = plan("p4_partition_pruning")
    assert(p.contains("PartitionFilters:") && p.contains("dt"), p)
  }

  test("j1: point lookup prunes to the key's bucket") {
    val p = plan("j1_pk_lookup")
    assert(raw"PartitionFilters: \[[^\]]*__bucket[^\]]*=".r.findFirstIn(p).isDefined, p)
    // key predicate reaches the scan (PushedFilters may be truncated, so
    // match the Filter node instead)
    assert(raw"user_id#\d+L? = 7".r.findFirstIn(p).isDefined, p)
  }

  test("h2: star join broadcasts all three dimensions, filter pushed") {
    val p = plan("h2_nation_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(p.contains("EqualTo(r_name,ASIA)"), p)
  }

  test("s5: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("s5_limit_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ch1: chunking is scan -> generate; only the input-widening exchange") {
    val p = plan("ch1_chunk_windows")
    // the adaptive widen repartitions a too-narrow scan (small corpus in
    // one parquet file); there must be NO keyed/aggregate exchange
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("Generate") && p.contains("posexplode"), p)
  }

  test("mix1: keep-rates broadcast onto the scan, no shuffle of the corpus") {
    val p = plan("mix1_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    // the only exchanges aggregate the tiny per-domain counts
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ta8: vocabulary joins back via broadcast; per-doc agg is partial+final") {
    val p = plan("ta8_token_rarity")
    assert(p.contains("BroadcastHashJoin"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 4, p) // partial+final x2
  }

  test("lookup on a compacted table prunes snapshot AND log partition dirs") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    val cat = new graft.core.Catalog(
      java.nio.file.Files.createTempDirectory("graft-audit").toString, spark)
    val t = cat.createTable("audit", "snapprune", graft.core.TableDescriptor(
      StructType(Seq(StructField("k", LongType), StructField("v", IntegerType))),
      primaryKey = Seq("k"), numBuckets = 8))
    val df = spark.range(50).selectExpr("id AS k", "CAST(id AS INT) AS v")
    t.upsert(df, orderBy = Seq(col("k")))
    t.compact()
    val df2 = spark.range(5).selectExpr("id AS k", "CAST(id + 100 AS INT) AS v")
    t.upsert(df2, orderBy = Seq(col("k")))
    // 8 buckets on local[8] auto-group: ONE grouped scan serves both
    // tiers, point-pruned to the key's bucket at the FILE level
    val p = t.lookup(Map("k" -> 3L)).queryExecution.executedPlan.toString
    assert(p.contains("GraftKeyGroupedScan") &&
      raw"PartitionFilters: \[[^\]]*__bucket = \d".r.findFirstIn(p).isDefined,
      p)
    // grouping pinned off (the V1 plan): BOTH parquet scans (snapshot +
    // log tail) carry a __bucket partition filter -> 1/numBuckets of the
    // files on each side
    val prev = spark.conf.getOption(graft.core.GroupedReads.Key)
    spark.conf.set(graft.core.GroupedReads.Key, "false")
    try {
      val v1 = t.lookup(Map("k" -> 3L)).queryExecution.executedPlan.toString
      val hits =
        raw"PartitionFilters: \[[^\]]*__bucket[^\]]*\]".r.findAllIn(v1).size
      assert(hits >= 2, v1)
    } finally prev match {
      case Some(v) => spark.conf.set(graft.core.GroupedReads.Key, v)
      case None => spark.conf.unset(graft.core.GroupedReads.Key)
    }
  }

  test("sim1: scoring runs inside whole-stage codegen") {
    val p = plan("sim1_cosine_topk")
    // `*(n)` prefixes mark WholeStageCodegen spans; graft_dot must be
    // inside one (a non-codegen expression would break the span)
    assert(p.contains("*(1) Project") || p.contains("*(1) Filter"), p)
    assert(p.contains("graft_dot"), p)
  }

  test("h5: all funnel step windows share ONE user-keyed exchange") {
    val p = plan("h5_funnel")
    // three chained step-min windows + the per-user collapse must reuse a
    // single hashpartitioning(user_id) exchange — funnel cost is one
    // shuffle regardless of step count
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
  }

  test("ta13: rule filter runs at scan speed — no keyed shuffle") {
    val p = plan("ta13_gopher_rules")
    assert(!p.contains("hashpartitioning"), p)
    assert("Exchange".r.findAllIn(p).size <= 1, p) // only the input widen
  }

  test("f4: theta sketch filters before the distinct agg; scan reads one column") {
    val p = plan("f4_theta_distinct")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"), p)
    // the threshold filter is below the aggregation (map-side sample)
    assert(p.indexOf("HashAggregate") < p.indexOf("Filter"), p)
  }

  test("h7: quantiles never globally sort the data after ranking") {
    // the range partition + per-partition rank live inside the
    // localCheckpoint (the audited plan scans the materialized RDD); the
    // visible plan must join the driver-size offsets/total by broadcast
    // and never sort the value column globally
    val p = plan("h7_quantiles")
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin [__pid"), p)
    assert(raw"Sort \[__v[^\n]*\], true".r.findFirstIn(p).isEmpty, p)
  }
}
