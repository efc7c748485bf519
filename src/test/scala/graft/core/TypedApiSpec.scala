package graft.core

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

case class KV(user_id: Long, v: String)

/** Typed Dataset surface (TypedLogScanner / TypedLookuper analogs) and
  * row-level DELETE/UPDATE.
  */
class TypedApiSpec extends SparkTestBase {

  private lazy val cat =
    new Catalog(Files.createTempDirectory("graft-typed").toString, spark)

  private def build(): GraftTable = {
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val t = cat.createTable("typed", "t_" + System.nanoTime(),
      TableDescriptor(schema, primaryKey = Seq("user_id"), numBuckets = 4))
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, s"v$i")).toDF("user_id", "v")
    t.upsert(df, orderBy = Seq(df("user_id")))
    t
  }

  test("scanAs/lookupAs return typed rows") {
    import spark.implicits._
    val t = build()
    val ds = t.scanAs[KV]()
    assert(ds.filter(_.user_id == 3L).collect().toSeq == Seq(KV(3L, "v3")))
    assert(t.lookupAs[KV](Map("user_id" -> 7L)) == Some(KV(7L, "v7")))
    assert(t.lookupAs[KV](Map("user_id" -> 999L)).isEmpty)
  }

  test("lookupAll prunes to the union of the keys' buckets") {
    val t = build()
    val keys = Seq(3L, 7L, 11L).map(k => Map[String, Any]("user_id" -> k))
    val got = t.lookupAll(keys).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "v3", 7L -> "v7", 11L -> "v11"))
  }

  test("schema evolution: ADD COLUMN LAST reads old rows as null") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val name = "evo_" + System.nanoTime()
    val t0 = cat.createTable("typed", name,
      TableDescriptor(schema, primaryKey = Seq("user_id"), numBuckets = 4))
    val df0 = Seq((1L, "a"), (2L, "b")).toDF("user_id", "v")
    t0.upsert(df0, orderBy = Seq(df0("user_id")))
    // append a nullable column; old rows read it as null, new writes fill it
    val t1 = cat.addColumn("typed", name,
      StructField("score", IntegerType, nullable = true))
    val df1 = Seq((2L, "b2", 20), (3L, "c", 30)).toDF("user_id", "v", "score")
    t1.upsert(df1, orderBy = Seq(df1("user_id")))
    val got = t1.scan().collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.get(2))).toMap
    assert(got == Map(1L -> ("a", null), 2L -> ("b2", 20), 3L -> ("c", 30)))
    // non-nullable or duplicate adds are rejected
    intercept[IllegalArgumentException] {
      cat.addColumn("typed", name, StructField("x", IntegerType, nullable = false))
    }
    intercept[IllegalArgumentException] {
      cat.addColumn("typed", name, StructField("v", IntegerType, nullable = true))
    }
  }

  test("cloneTable: clone is independent of the source") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("v", StringType)))
    val name = "src_" + System.nanoTime()
    val src = cat.createTable("typed", name,
      TableDescriptor(schema, primaryKey = Seq("user_id"), numBuckets = 4))
    val df = Seq((1L, "a"), (2L, "b")).toDF("user_id", "v")
    src.upsert(df, orderBy = Seq(df("user_id")))
    val clone = cat.cloneTable("typed", name, name + "_clone")
    val df2 = Seq((1L, "MUT")).toDF("user_id", "v")
    clone.upsert(df2, orderBy = Seq(df2("user_id")))
    assert(clone.lookupAs[KV](Map("user_id" -> 1L)) == Some(KV(1L, "MUT")))
    assert(src.lookupAs[KV](Map("user_id" -> 1L)) == Some(KV(1L, "a")))
    assert(src.latestOffsets.values.sum == 2)
    assert(clone.latestOffsets.values.sum == 4) // +I,+I then the -U,+U pair
  }

  test("compact + vacuumLog: state survives, changelog starts at cutoff") {
    import spark.implicits._
    val t = build()
    t.compact()
    val df2 = (1L to 5L).map(i => (i, s"w$i")).toDF("user_id", "v")
    t.upsert(df2, orderBy = Seq(df2("user_id")))
    val before = t.scan().collect().toSeq
    t.vacuumLog()
    assertSameRows(t.scan().collect().toSeq, before)
    // only the post-snapshot tail remains in the changelog (5 keys updated
    // after compact -> -U,+U pairs)
    assert(t.changelog().count() == 10)
    assert(t.lookupAs[KV](Map("user_id" -> 3L)) == Some(KV(3L, "w3")))
    // a key never touched after compact lives ONLY in the snapshot after
    // vacuum — the lookup must union snapshot + log, not scan the log alone
    assert(t.lookupAs[KV](Map("user_id" -> 10L)) == Some(KV(10L, "v10")))
    // time travel after vacuum: a current-time read still sees all 20
    // keys (snapshot ∪ tail), and a read predating the snapshot fails
    // loudly instead of returning partial state
    val now = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    assert(t.scanAsOf(now).count() == 20)
    intercept[IllegalArgumentException] {
      t.scanAsOf(new java.sql.Timestamp(0L)).count()
    }
  }

  test("deleteWhere / updateWhere route through the merge path") {
    import spark.implicits._
    val t = build()
    t.deleteWhere(col("user_id") > 15L)
    t.updateWhere(col("user_id") <= 5L, Map("v" -> upper(col("v"))))
    val state = t.scanAs[KV]().collect().sortBy(_.user_id).toSeq
    assert(state.size == 15)
    assert(state.take(5).map(_.v) == Seq("V1", "V2", "V3", "V4", "V5"))
    assert(state.last == KV(15L, "v15"))
    // changelog carries -D for deletes and -U/+U pairs for updates
    val cts = t.changelog().groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cts(ChangeType.Delete) == 5)
    assert(cts(ChangeType.UpdateBefore) == 5)
    assert(cts(ChangeType.UpdateAfter) == 5)
  }
}
