package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {

  test("point-in-interval: inclusive bounds, empty intervals, bin crossings") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 15L), (3L, 20L), (4L, 99L), (5L, -3L))
      .toDF("pid", "v")
    val ivals = Seq(
      (10L, 10L, 20L),  // matches 10 (inclusive start), 15, 20 (inclusive end)
      (11L, 21L, 30L),  // matches nothing
      (12L, 30L, 25L),  // empty (end < start) -> no matches, no crash
      (13L, -5L, -1L))  // negative range (floor-div binning must hold)
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivals, "v", "s", "e", binWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (5L, 13L)))
  }

  test("point-in-interval: equals the naive theta-join on random data, any binWidth") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1L to 300L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "v")
    val ivals = (1L to 80L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(60).toLong)
    }.toDF("iid", "s", "e")
    val naive = points.join(ivals, col("v") >= col("s") && col("v") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (bw <- Seq(1L, 13L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, ivals, "v", "s", "e", bw)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == naive, s"binWidth=$bw")
    }
  }

  test("point-in-interval: equi-keys ride along; timestamp columns bin on micros") {
    import spark.implicits._
    val points = Seq(("u1", "2024-01-01 00:10:00"), ("u2", "2024-01-01 00:10:00"))
      .toDF("user", "tss").withColumn("t", to_timestamp(col("tss"))).drop("tss")
    val ivals = Seq(("u1", "2024-01-01 00:00:00", "2024-01-01 01:00:00", 1L))
      .toDF("user", "ss", "es", "iid")
      .withColumn("s", to_timestamp(col("ss")))
      .withColumn("e", to_timestamp(col("es"))).drop("ss", "es")
    val got = RangeJoin.pointInInterval(points, ivals, "t", "s", "e",
      binWidth = 15L * 60 * 1000000, keys = Seq("user"))
    assert(got.select("user").as[String].collect().toSeq == Seq("u1"))
    assert(got.columns.toSet == Set("user", "t", "s", "e", "iid"))
  }

  test("interval-overlap: each overlapping pair exactly once, vs naive join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = (1L to 120L).map { i =>
      val s = rnd.nextInt(500).toLong; (i, s, s + rnd.nextInt(80).toLong)
    }.toDF("aid", "as", "ae")
    val b = (1L to 120L).map { i =>
      val s = rnd.nextInt(500).toLong; (i, s, s + rnd.nextInt(80).toLong)
    }.toDF("bid", "bs", "be")
    val naive = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
      .select("aid", "bid").as[(Long, Long)].collect()
    assert(naive.length == naive.toSet.size) // sanity: naive join has no dups
    for (bw <- Seq(1L, 37L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be", bw)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at binWidth=$bw")
      assert(got.toSet == naive.toSet, s"binWidth=$bw")
    }
  }

  test("range join plans as a shuffle equi-join, not a nested loop") {
    import spark.implicits._
    val points = (1L to 100L).map(i => (i, i * 3 % 97)).toDF("pid", "v")
    val ivals = (1L to 30L).map(i => (i, i * 2, i * 2 + 10)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, ivals, "v", "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
