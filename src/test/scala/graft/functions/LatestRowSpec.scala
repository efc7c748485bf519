package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.LatestRow.{earliestBy, latestBy}

/** Direct contract tests for the hash-plannable argmax/argmin aggregate
  * behind every PK materialization: max_by/min_by agreement, null-order
  * skipping, struct order keys, physical plan (ObjectHashAggregate, both
  * phases), and buffer survival across shuffles/spill boundaries via a
  * many-partition run.
  */
class LatestRowSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L, "a1"), ("a", 3L, "a3"), ("a", 2L, "a2"),
    ("b", 10L, "b10"), ("b", 5L, "b5"),
    ("c", 7L, "c7")).toDF("k", "off", "v")

  test("matches max_by/min_by on scalar and struct payloads") {
    val got = df.groupBy($"k")
      .agg(latestBy($"v", $"off").as("last"), earliestBy($"v", $"off").as("first"),
        latestBy(struct($"v", $"off"), $"off")("v").as("last_s"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(got == Set(("a", "a3", "a1", "a3"), ("b", "b10", "b5", "b10"),
      ("c", "c7", "c7", "c7")))
    val ref = df.groupBy($"k")
      .agg(max_by($"v", $"off"), min_by($"v", $"off")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ref == got.map(t => (t._1, t._2, t._3)))
  }

  test("null order values never contribute; all-null group yields null") {
    val d = Seq(("a", Some(1L), "keep"), ("a", None, "skip"),
      ("b", None, "skip2")).toDF("k", "off", "v")
    val got = d.groupBy($"k").agg(latestBy($"v", $"off").as("last"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "keep", "b" -> null))
  }

  test("struct order key: lexicographic with null-rank field (versioned shape)") {
    val d = Seq(("a", Some(5), 1L, "v5"), ("a", None, 9L, "null-late"),
      ("a", Some(5), 2L, "v5-later"), ("a", Some(7), 0L, "v7"))
      .toDF("k", "ver", "off", "v")
    val key = struct($"ver".isNotNull.as("h"), $"ver".as("v"), $"off".as("o"))
    val got = d.groupBy($"k").agg(latestBy($"v", key).as("best")).head.getString(1)
    assert(got == "v7") // max version wins; null = -inf despite later offset
  }

  test("plans as ObjectHashAggregate at both phases, never SortAggregate") {
    val plan = df.groupBy($"k").agg(latestBy($"v", $"off"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)
  }

  test("partition-invariant and shuffle-safe at scale (buffers serialized)") {
    // 50k rows, 1k keys, scattered over 64 partitions: partial buffers
    // cross the exchange serialized; result must equal the window answer
    val big = spark.range(50000).select(
      (col("id") % 1000).as("k"),
      // unique per key: offset = id (monotone), value derived from id
      col("id").as("off"),
      concat(lit("v"), col("id")).as("v"))
      .repartition(64)
    val got = big.groupBy($"k").agg(latestBy($"v", $"off").as("last"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 1000)
    // latest id for key k is 49000 + k
    (0L until 1000L).foreach { k =>
      assert(got(k) == s"v${49000 + k}", s"key $k")
    }
  }

  test("ensureHashFallbackThreshold: explicit user setting always respected") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val tagKey = "spark.sql.graft.internal.hashFallbackSetByEngine"
    val before = spark.conf.getAll.get(key)
    try {
      // a deployment that explicitly pins Spark's own default (128) to
      // keep early spill protection must NOT be silently overridden
      spark.conf.unset(tagKey)
      spark.conf.set(key, "128")
      LatestRow.ensureHashFallbackThreshold(spark)
      assert(spark.conf.get(key) == "128")
      // ...nor any other explicit choice
      spark.conf.set(key, "4096")
      LatestRow.ensureHashFallbackThreshold(spark)
      assert(spark.conf.get(key) == "4096")
      // unset -> the engine applies its raise and tags it as its own
      spark.conf.unset(key)
      LatestRow.ensureHashFallbackThreshold(spark)
      assert(spark.conf.get(key) == "1000000")
      assert(spark.conf.get(tagKey) == "1000000")
      // an engine-set value may be re-tuned by the engine on later calls
      spark.conf.set("spark.sql.graft.objectHashFallbackThreshold", "500000")
      LatestRow.ensureHashFallbackThreshold(spark)
      assert(spark.conf.get(key) == "500000")
    } finally {
      spark.conf.unset("spark.sql.graft.objectHashFallbackThreshold")
      spark.conf.unset(tagKey)
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("unorderable order type fails at analysis time") {
    val d = Seq(("a", Map(1 -> 2), "x")).toDF("k", "m", "v")
    val e = intercept[Exception](
      d.groupBy($"k").agg(latestBy($"v", $"m")).collect())
    assert(e.getMessage.toLowerCase.contains("order")
      || e.getMessage.contains("latest_row"), e.getMessage)
  }
}
