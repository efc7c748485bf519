package graft.ops

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {

  test("asof join: inclusive match, carry-forward, null before first right row") {
    import spark.implicits._
    val left = Seq(
      (1L, 5L, "l1"),   // before any right row -> null
      (1L, 10L, "l2"),  // equal ts -> inclusive match r@10
      (1L, 30L, "l3"),  // carries r@20 past it
      (2L, 50L, "l4"))  // other key
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, 100), (1L, 20L, 200), (2L, 49L, 300), (2L, 51L, 400))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toSet
    assert(got == Set(
      (1L, 5L, "l1", -1),
      (1L, 10L, "l2", 100),
      (1L, 30L, "l3", 200),
      (2L, 50L, "l4", 300)))
  }

  test("asof join: multi-column keys and multi-column payload") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L), (1L, "b", 10L)).toDF("k1", "k2", "t")
    val right = Seq((1L, "a", 5L, 1, "x"), (1L, "b", 20L, 2, "y"))
      .toDF("k1", "k2", "t", "v", "s")
    val got = AsOfJoin.asofJoin(left, right, Seq("k1", "k2"), "t", "t")
      .collect().map(r => (r.getString(1),
        if (r.isNullAt(3)) -1 else r.getInt(3),
        if (r.isNullAt(4)) "-" else r.getString(4))).toSet
    assert(got == Set(("a", 1, "x"), ("b", -1, "-")))
  }
}
