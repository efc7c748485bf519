package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkTestBase {

  test("exactQuantiles matches a single-node sort at every requested q") {
    import spark.implicits._
    // non-uniform values with duplicates: (i*17 % 1000) over 5000 rows
    val df = (1L to 5000L).map(i => (i * 17) % 1000).toDF("v")
    val qs = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 1.0)
    val sorted = df.orderBy($"v").collect().map(_.getLong(0))
    val expected = qs.map(q =>
      q -> sorted(math.ceil(q * sorted.length).toInt - 1)).toMap
    val got = Quantiles.exactQuantiles(df, "v", qs)
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("exactQuantiles is deterministic under repartitioning and AQE") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i * 31) % 500).toDF("v")
    val base = Quantiles.exactQuantiles(df, "v", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val shuffled = Quantiles.exactQuantiles(df.repartition(13), "v", Seq(0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
    assert(base.keySet == Set(0.5, 0.9))
  }

  test("groupedQuantiles matches per-key single-node sorts") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (s"k${i % 3}", (i * 13) % 700))
      .toDF("k", "v")
    val qs = Seq(0.5, 0.9)
    val expected = df.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.map(_._2).sorted
        qs.map(q => (k, q, sorted(math.ceil(q * sorted.length).toInt - 1)))
      }.toSet
    val got = Quantiles.groupedQuantiles(df, "k", "v", qs)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("exactQuantiles rejects out-of-range quantiles") {
    import spark.implicits._
    val df = Seq(1L).toDF("v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "v", Seq(1.5))
    }
  }
}
