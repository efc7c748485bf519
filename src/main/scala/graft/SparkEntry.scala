package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Bitmaps
import graft.ops.Fixtures

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query names reference SURVEY.md §2 operator ids so the inventory can be
  * checked line by line. Every oracle-checked query keeps inexact doubles
  * out of distributed aggregates (decimal casts) so hash comparison is
  * order-independent.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Fixtures.read(s, dir, n)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * pricing-summary aggregate over the lineitem log (Catalyst handles
    * scan+filter pushdown; one shuffle, map-side partial agg).
    */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- S2: bounded scan with projection + filter (pushed to parquet)
    "s2_scan_filter" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 45)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))),

    // ----- P1: projection pushdown (column pruning to the scan)
    "p1_projection" -> ((s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))),

    // ----- P2: the full leaf-predicate set (Equal..Contains)
    "p2_predicates" -> ((s, dir) =>
      t(s, dir, "part").filter(
        col("p_size") >= 5 && col("p_size") <= 40 && col("p_size") =!= 13 &&
        col("p_brand").isin("Brand#1", "Brand#2", "Brand#3", "Brand#10",
          "Brand#17", "Brand#22") &&
        !col("p_type").isin("STANDARD") &&
        (col("p_name").startsWith("s") || col("p_name").endsWith("t") ||
          col("p_name").contains("gear")) &&
        col("p_retailprice").isNotNull)),

    // ----- S5/O1: LIMIT pushdown (deterministic top-k form)
    "s5_limit_topk" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(20)),

    // ----- A6: count(*) answered from parquet metadata
    "a6_count_star" -> ((s, dir) =>
      t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))),

    // ----- S8+S2: append->scan roundtrip through the graft log table
    "s8_append_scan" -> ((s, dir) => {
      val roundtrip = Fixtures.lineitemLog(s, dir).scan()
      roundtrip.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).as("sum_qty"))
    }),

    // ----- A1: default merge engine (last-write-wins upsert)
    "a1_upsert_lww" -> ((s, dir) => Fixtures.usersLww(s, dir).scan()),

    // ----- A1 + DeleteBehavior.ALLOW: deletes remove, later upserts re-add
    "a1_upsert_delete" -> ((s, dir) => Fixtures.usersLwwDeletes(s, dir).scan()),

    // ----- A2: partial update (declared column subset)
    "a2_partial_update" -> ((s, dir) => Fixtures.usersPartial(s, dir).scan()),

    // ----- A3: FIRST_ROW merge engine
    "a3_first_row" -> ((s, dir) => Fixtures.usersFirst(s, dir).scan()),

    // ----- A4: VERSIONED merge engine (max ts wins, later offset on ties)
    "a4_versioned" -> ((s, dir) => Fixtures.usersVersioned(s, dir).scan()),

    // ----- A5: AGGREGATION merge engine (sum/max/listagg/last_value)
    "a5_aggregation" -> ((s, dir) => Fixtures.userAggs(s, dir).scan()),

    // ----- T3: changelog generation (+I / -U / +U)
    "t3_changelog" -> ((s, dir) =>
      Fixtures.usersLww(s, dir).changelog()
        .select(col("_change_type"), col("user_id"), col("ts"), col("value"))),

    // ----- J1: primary-key point lookup (bucket-pruned)
    "j1_pk_lookup" -> ((s, dir) =>
      Fixtures.usersLww(s, dir).lookup(Map("user_id" -> 7L))),

    // ----- J2: prefix-key lookup (bucket key = PK prefix)
    "j2_prefix_lookup" -> ((s, dir) =>
      Fixtures.userTypeState(s, dir).prefixLookup(Map("user_id" -> 7L))),

    // ----- J3: lookup join (stream side enriched against PK state)
    "j3_lookup_join" -> ((s, dir) => {
      val state = Fixtures.usersLww(s, dir).scan()
      val cust = t(s, dir, "customer")
      state.join(broadcast(cust), state("user_id") === cust("c_custkey"))
        .select(col("user_id"), col("event_type"), col("value"),
          col("c_name"), col("c_mktsegment"))
    }),

    // ----- §2.8: roaring-bitmap agg: distinct users per event type
    "f1_rb_cardinality" -> ((s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(Bitmaps.rbCardinality(Bitmaps.rb_build_agg(col("user_id")))
          .as("distinct_users"))),

    // ----- §2.8: rb_and/rb_or of two bitmaps (users in click AND view)
    "f2_rb_intersect" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val bm = ev.filter(col("event_type").isin("click", "view"))
        .groupBy(col("event_type"))
        .agg(Bitmaps.rb_build_agg(col("user_id")).as("bm"))
        .groupBy()
        .agg(Bitmaps.rbCardinality(Bitmaps.rb_and_agg(col("bm"))).as("n_both"),
          Bitmaps.rbCardinality(Bitmaps.rb_or_agg(col("bm"))).as("n_either"))
      bm
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "s2_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45""".stripMargin,

    "p1_projection" -> "SELECT o_orderkey, o_totalprice FROM orders",

    "p2_predicates" ->
      """SELECT * FROM part
        |WHERE p_size >= 5 AND p_size <= 40 AND p_size <> 13
        |  AND p_brand IN ('Brand#1','Brand#2','Brand#3','Brand#10','Brand#17','Brand#22')
        |  AND p_type NOT IN ('STANDARD')
        |  AND (p_name LIKE 's%' OR p_name LIKE '%t' OR p_name LIKE '%gear%')
        |  AND p_retailprice IS NOT NULL""".stripMargin,

    "s5_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""".stripMargin,

    "a6_count_star" -> "SELECT count(*) AS cnt FROM lineitem",

    "s8_append_scan" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "a1_upsert_lww" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "a1_upsert_delete" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    "a2_partial_update" ->
      """WITH base AS (
        |  SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, CAST(arg_max(value, event_id) * 2 AS DECIMAL(18,6)) AS v2
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT b.ts, b.user_id, b.event_type, COALESCE(p.v2, b.value) AS value, b.props
        |FROM base b LEFT JOIN p USING (user_id) WHERE b.rn = 1""".stripMargin,

    "a3_first_row" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id ASC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "a4_versioned" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,

    "a5_aggregation" ->
      """SELECT max(ts) AS ts, user_id,
        |  string_agg(event_type, '|' ORDER BY event_id) AS event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6)) AS value,
        |  arg_max(props, event_id) AS props
        |FROM events GROUP BY user_id""".stripMargin,

    "t3_changelog" ->
      """WITH o AS (
        |  SELECT user_id, ts, CAST(value AS DECIMAL(18,6)) AS value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS pts,
        |         lag(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
        |  FROM events)
        |SELECT CASE WHEN rn = 1 THEN '+I' ELSE '+U' END AS _change_type, user_id, ts, value FROM o
        |UNION ALL
        |SELECT '-U' AS _change_type, user_id, pts AS ts, pv AS value FROM o WHERE rn > 1""".stripMargin,

    "j1_pk_lookup" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 AND user_id = 7""".stripMargin,

    "j2_prefix_lookup" ->
      """SELECT ts, user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value, props
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1 AND user_id = 7""".stripMargin,

    "j3_lookup_join" ->
      """WITH state AS (
        |  SELECT user_id, event_type, CAST(value AS DECIMAL(18,6)) AS value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |        FROM events) WHERE rn = 1)
        |SELECT s.user_id, s.event_type, s.value, c.c_name, c.c_mktsegment
        |FROM state s JOIN customer c ON s.user_id = c.c_custkey""".stripMargin,

    "f1_rb_cardinality" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users
        |FROM events GROUP BY event_type""".stripMargin,

    "f2_rb_intersect" ->
      """SELECT
        |  (SELECT count(*) FROM ((SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        |    INTERSECT (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'))) AS n_both,
        |  (SELECT count(*) FROM ((SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
        |    UNION (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'))) AS n_either""".stripMargin
  )
}
