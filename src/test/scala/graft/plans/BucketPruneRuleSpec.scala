package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core._

/** P5 point-query rewrite + A7 auto-increment + T1 timestamp startup. */
class BucketPruneRuleSpec extends SparkTestBase {

  private lazy val warehouse = {
    val wh = Files.createTempDirectory("graft-plans").toString
    // this spec pins the V1 read path (BucketPruneRule targets the
    // LogicalRelation plan): 8-bucket tables on local[8] would otherwise
    // auto-group (GroupedReads) and take the grouped scan's own bucket
    // pruning instead — covered by SpjSpec
    DynamicConfigs.set(wh,
      Map("spark.sql.graft.read.preserve-data-grouping" -> "false"))
    wh
  }
  private lazy val cat = new Catalog(warehouse, spark)

  private def usersTable(): GraftTable = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val t = cat.createTable("plans", "users_" + System.nanoTime(),
      TableDescriptor(schema, primaryKey = Seq("user_id"), numBuckets = 8))
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("user_id", "v")
    t.upsert(df, orderBy = Seq(df("user_id")))
    t
  }

  // AQE wraps the physical tree in query stages `collect` won't descend
  // into, so assert on the rendered final plan instead.
  private val prunedScan = raw"PartitionFilters: \[[^\]]*__bucket[^\]]*=".r

  test("PK equality filter prunes to one bucket partition") {
    BucketPruning.install(spark)
    val t = usersTable()
    val q = t.scan().filter(col("user_id") === 7L)
    assert(q.collect().toSeq == Seq(Row(7L, "v7")))
    val plan = q.queryExecution.executedPlan.toString
    assert(prunedScan.findFirstIn(plan).isDefined,
      s"no __bucket partition filter in:\n$plan")
  }

  test("rule is a no-op when not all bucket keys are pinned") {
    BucketPruning.install(spark)
    val t = usersTable()
    val q = t.scan().filter(col("v") === "v7")
    assert(q.collect().toSeq == Seq(Row(7L, "v7")))
    // the rule must not have added a top-level `__bucket = b` conjunct
    // (the offset-gate filter legitimately references __bucket inside a
    // CASE, so only TOP-LEVEL conjuncts count)
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, Literal}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    val pruned = q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }.flatMap(f => conjuncts(f.condition).collect {
      case e @ EqualTo(a: AttributeReference, _: Literal) if a.name == Meta.Bucket => e
      case e @ EqualTo(_: Literal, a: AttributeReference) if a.name == Meta.Bucket => e
    })
    assert(pruned.isEmpty)
  }

  test("auto-increment assigns contiguous unique ids across commits") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("row_id", LongType)))
    val t = cat.createTable("plans", "ai_" + System.nanoTime(),
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 4,
        autoIncrementColumn = Some("row_id")))
    import spark.implicits._
    val b1 = (1L to 40L).map(i => (i, -1L)).toDF("k", "row_id")
    t.append(b1, orderBy = Seq(b1("k")))
    val b2 = (41L to 60L).map(i => (i, -1L)).toDF("k", "row_id")
    t.append(b2, orderBy = Seq(b2("k")))
    val ids = t.scan().select("row_id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 60L).toSeq)
  }

  test("scanFromTimestamp reads only commits at or after the split") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val t = cat.createTable("plans", "ts_" + System.nanoTime(),
      TableDescriptor(schema, bucketKeys = Seq("k"), numBuckets = 4))
    import spark.implicits._
    val b1 = (1L to 10L).map(i => (i, "old")).toDF("k", "v")
    t.append(b1, orderBy = Seq(b1("k")))
    Thread.sleep(20)
    val split = new java.sql.Timestamp(System.currentTimeMillis())
    val b2 = (11L to 15L).map(i => (i, "new")).toDF("k", "v")
    t.append(b2, orderBy = Seq(b2("k")))
    val got = t.scanFromTimestamp(split).select("v").distinct()
      .as[String].collect().toSeq
    assert(got == Seq("new"))
    assert(t.scanFromTimestamp(split).count() == 5)
  }
}
