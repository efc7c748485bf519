package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Native codegen expressions vs their HOF reference formulations. */
class VectorExprsSpec extends SparkTestBase {

  test("DotProduct matches aggregate(zip_with) incl. empty and null rows") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(0.5), Seq(-2.0))).toDF("a", "b")
      .union(Seq((null, null)).asInstanceOf[Seq[(Seq[Double], Seq[Double])]]
        .toDF("a", "b"))
    val got = df.select(
      VectorExprs.dot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("ref")).collect()
    got.foreach { r =>
      assert((r.isNullAt(0) && r.isNullAt(1)) || r.getDouble(0) == r.getDouble(1))
    }
  }

  test("SortedIntersectCount matches size(array_intersect) on sorted sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val got = rows.toDF("a", "b").select(
      VectorExprs.sortedIntersectCount(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }
}
