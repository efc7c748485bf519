package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

class SecondaryIndexSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-idx-wh").toString, spark)

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("cat", StringType),
    StructField("v", IntegerType)))

  private def df(rows: (Long, String, Integer)*) = spark.createDataFrame(
    rows.zipWithIndex.map { case ((k, c, v), i) => Row(k, c, v, i.toLong) }.asJava,
    StructType(schema.fields :+ StructField("ord", LongType)))

  test("index build, probe, incremental refresh, and value moves") {
    val cat = newCatalog()
    val t = cat.createTable("db", "base1",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, "a", 1), (2L, "b", 2), (3L, "a", 3)), orderBy = Seq(col("ord")))

    val si = SecondaryIndex.create(cat, "db", "base1_by_cat", t, Seq("cat"))
    assertSameRows(si.lookup("a").select("k", "cat", "v").collect().toSeq,
      Seq(Row(1L, "a", 1), Row(3L, "a", 3)))
    assert(si.lookup("nope").count() == 0)

    // update moves k=1 from cat a -> b; new row in c; delete k=2
    t.upsert(df((1L, "b", 10), (4L, "c", 4)), orderBy = Seq(col("ord")))
    t.delete(df((2L, null, null)), orderBy = Seq(col("ord")))

    // stale index refuses rather than answering wrong
    val e = intercept[IllegalArgumentException](si.lookup("a"))
    assert(e.getMessage.contains("refresh"))

    si.refresh()
    assertSameRows(si.lookup("a").select("k", "cat", "v").collect().toSeq,
      Seq(Row(3L, "a", 3)))
    assertSameRows(si.lookup("b").select("k", "cat", "v").collect().toSeq,
      Seq(Row(1L, "b", 10)))
    assert(si.lookup("c").count() == 1)
    // deleted key gone from its category
    assert(si.lookup("b").filter(col("k") === 2L).count() == 0)
    // refresh is incremental: applied version tracks the base
    assert(si.appliedVersion == t.latestVersion.get)
    // idempotent refresh
    si.refresh()
    assert(si.lookup("a").count() == 1)
  }

  test("base-table restore invalidates the index; refresh() rebuilds it") {
    val cat = newCatalog()
    val t = cat.createTable("db", "rbx1",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, "a", 1), (2L, "b", 2)), orderBy = Seq(col("ord"))) // v1
    val si = SecondaryIndex.create(cat, "db", "rbx1_by_cat", t, Seq("cat"))
    t.upsert(df((3L, "c", 3), (1L, "c", 10)), orderBy = Seq(col("ord"))) // v2
    si.refresh()
    assert(si.lookup("c").count() == 2)

    t.rollbackTo(1)
    // the stale index must REFUSE, not loop or silently serve undone rows
    val e = intercept[IllegalArgumentException](si.lookup("c"))
    assert(e.getMessage.contains("restore"))
    si.refresh() // epoch mismatch -> full truncate + rebuild
    assert(si.lookup("c").count() == 0)
    assert(si.lookup("a").collect().map(_.getLong(0)).toSeq == Seq(1L))

    // version-number REUSE after the rollback stays correct: new commits
    // advance to v2 again with different data, incremental refresh works
    t.upsert(df((5L, "c", 5)), orderBy = Seq(col("ord"))) // new v2
    si.refresh()
    assert(si.lookup("c").collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("hot indexed value falls back to a semi-join, never a driver collect") {
    val cat = newCatalog()
    val t = cat.createTable("db", "hot1",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    // 400 rows in cat 'hot', 100 spread elsewhere
    val rows = (1L to 500L).map(k =>
      Row(k, if (k <= 400) "hot" else s"c${k % 5}", k.toInt, k))
    t.upsert(spark.createDataFrame(rows.asJava,
      StructType(schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    val si = SecondaryIndex.create(cat, "db", "hot1_by_cat", t, Seq("cat"))

    // under the cutover: batched point lookups (plan carries no join)
    val cold = si.lookupWithThreshold(50, "c1")
    assert(!cold.queryExecution.optimizedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      s"cold probe should be a point lookup:\n${cold.queryExecution.optimizedPlan}")

    // over the cutover: the plan IS a semi-join of base state vs probe —
    // the matched-key set never lands on the driver
    val hot = si.lookupWithThreshold(50, "hot")
    assert(hot.queryExecution.analyzed.exists {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _ => false
    }, s"hot probe should be a semi-join:\n${hot.queryExecution.analyzed}")
    assert(hot.count() == 400)
    assert(hot.select(sum("v")).collect().head.getLong(0) ==
      (1 to 400).map(_.toLong).sum)
    // both paths agree with each other
    assertSameRows(si.lookupWithThreshold(1000000, "hot")
        .select("k").collect().toSeq,
      hot.select("k").collect().toSeq)
  }

  test("index entries live in the probe value's bucket (pruned reads)") {
    val cat = newCatalog()
    val t = cat.createTable("db", "base2",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, "x", 1), (2L, "y", 2), (3L, "x", 3), (4L, "z", 4)),
      orderBy = Seq(col("ord")))
    val si = SecondaryIndex.create(cat, "db", "base2_by_cat", t, Seq("cat"))
    // all entries for one value share one bucket — the prefix lookup prunes
    val buckets = si.idx.logDF.filter(col("cat") === "x")
      .select(Meta.Bucket).distinct().collect().map(_.getInt(0))
    assert(buckets.length == 1)
    // reopen from its table: same answers without a rebuild
    val si2 = SecondaryIndex.open(t, si.idx, Seq("cat"))
    assert(si2.appliedVersion == t.latestVersion.get)
    assert(si2.lookup("x").count() == 2)
  }

  test("snapshot build path after vacuum; guards against bad definitions") {
    val cat = newCatalog()
    val t = cat.createTable("db", "base3",
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2))
    t.upsert(df((1L, "a", 1), (2L, "b", 2)), orderBy = Seq(col("ord")))
    t.upsert(df((1L, "c", 10)), orderBy = Seq(col("ord")))
    t.compact()
    t.vacuumLog() // changelog below the cutoff is gone
    val si = SecondaryIndex.create(cat, "db", "base3_by_cat", t, Seq("cat"))
    assertSameRows(si.lookup("c").select("k", "cat", "v").collect().toSeq,
      Seq(Row(1L, "c", 10)))
    assert(si.lookup("a").count() == 0) // pre-vacuum value never indexed
    // incremental after the snapshot build
    t.upsert(df((3L, "a", 3)), orderBy = Seq(col("ord")))
    si.refresh()
    assert(si.lookup("a").count() == 1)

    intercept[IllegalArgumentException](
      SecondaryIndex.create(cat, "db", "bad1", t, Seq("k"))) // PK column
    intercept[IllegalArgumentException](
      SecondaryIndex.create(cat, "db", "bad2", t, Seq("nope")))
  }
}
