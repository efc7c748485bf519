package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Index freshness as part of a maintenance tick: indexes register
  * themselves (kind + base path) in their table properties at create
  * time, so [[IndexMaintenance.refreshAll]] discovers and refreshes
  * every derived structure of a base table without per-index arguments.
  */
class IndexMaintenanceSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val dim = 8
  private def vec(seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextGaussian())
  }

  private def mkBase(n: Int): (Catalog, GraftTable) = {
    val cat = new Catalog(
      Files.createTempDirectory("graft-im").toString, spark)
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("cat", StringType),
      StructField("emb", ArrayType(DoubleType), nullable = false)))
    val t = cat.createTable("db", "base",
      TableDescriptor(schema, primaryKey = Seq("vid"), numBuckets = 2))
    upsert(t, 1 to n, 0L)
    (cat, t)
  }

  private def upsert(t: GraftTable, ids: Range, ordBase: Long): Unit = {
    val rows = ids.map(i =>
      Row(i.toLong, s"c${i % 3}", vec(i), ordBase + i))
    t.upsert(spark.createDataFrame(rows.asJava,
      StructType(t.desc.schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
  }

  test("registered indexes are discovered from the base and refreshed together") {
    val (cat, t) = mkBase(40)
    val si = SecondaryIndex.create(cat, "db", "base_by_cat", t, Seq("cat"))
    val vi = VectorIndex.create(cat, "db", "base_ivf", t, "vid", "emb",
      nlist = 4)
    // registration landed in the index tables' properties
    assert(si.idx.desc.properties("index.kind") == "secondary")
    assert(si.idx.desc.properties("index.base.path") == t.path)
    assert(si.idx.desc.properties("index.columns") == "cat")
    assert(vi.idx.desc.properties("index.kind") == "vector")
    assert(vi.idx.desc.properties("index.base.path") == t.path)
    val found = IndexMaintenance.indexesOf(cat, t)
    assert(found.map(f => f._1 -> f._2).toSet ==
      Set("db.base_by_cat" -> "secondary", "db.base_ivf" -> "vector"))

    // base advances; both indexes go stale; one tick refreshes both
    upsert(t, 41 to 60, 1000L)
    val latest = t.latestVersion.get
    assert(si.appliedVersion < latest && vi.appliedVersion < latest)
    val refreshed = IndexMaintenance.refreshAll(cat, t)
    assert(refreshed.map(r => r._1 -> r._3).toSet ==
      Set("db.base_by_cat" -> latest, "db.base_ivf" -> latest))
    // and the refreshed secondary index actually serves the new rows
    val hit = SecondaryIndex.open(t, si.idx, Seq("cat"))
      .lookup("c0").collect()
    assert(hit.map(_.getAs[Long]("vid")).contains(60L))
    // a vector probe sees a new vector
    val probe = VectorIndex.open(t, "vid", "emb", vi.idx)
      .topK(vec(55), k = 1, nprobe = 4).collect()
    assert(probe.head.getLong(0) == 55L)
  }

  test("property-driven tick: table.index.* freshness-gates the refresh; " +
      "a stale ADC index re-arms and serves post-refresh rows") {
    val (cat, t0) = mkBase(40)
    val vi = VectorIndex.create(cat, "db", "base_pq", t0, "vid", "emb",
      nlist = 4, pq = Some((4, 8)))
    // no policy -> the tick skips the table (explicit refresh still works)
    assert(IndexMaintenance.maintainIndexes(
      cat, t0, System.currentTimeMillis()).isEmpty)
    val t = cat.updateProperties("db", "base", Map(
      "table.index.auto-refresh" -> "true",
      "table.index.freshness" -> "1h"), Nil)
    val now = System.currentTimeMillis()
    // first tick: no stamp yet -> refresh runs (a no-op compare, the
    // index is current) and the gate arms
    val first = IndexMaintenance.maintainIndexes(cat, t, now).get
    assert(first.contains("db.base_pq (vector) refreshed"), first)
    // base advances -> the index is stale; a direct ADC probe refuses
    upsert(t, 41 to 60, 1000L)
    intercept[IllegalArgumentException](
      VectorIndex.open(t, "vid", "emb", vi.idx)
        .topKAdc(vec(55), k = 1, nprobe = 4))
    // in-window tick is a one-stat no-op: the index stays stale
    val inWin = IndexMaintenance.maintainIndexes(cat, t, now + 60000L).get
    assert(inWin.startsWith("indexes fresh"), inWin)
    assert(vi.appliedVersion < t.latestVersion.get)
    // past the window: the tick refreshes, and the ADC probe serves the
    // POST-refresh rows through the PQ codes + exact re-rank
    val tick = IndexMaintenance.maintainIndexes(
      cat, t, now + 2 * 3600000L).get
    assert(tick.contains("refreshed to base version " +
      t.latestVersion.get), tick)
    val hit = VectorIndex.open(t, "vid", "emb", vi.idx)
      .topKAdc(vec(55), k = 1, nprobe = 4, cand = 60).collect()
    assert(hit.head.getLong(0) == 55L)
    // the gate re-armed at the refresh tick's timestamp
    val rearmed = IndexMaintenance.maintainIndexes(
      cat, t, now + 2 * 3600000L + 60000L).get
    assert(rearmed.startsWith("indexes fresh"), rearmed)
  }

  test("tables without index registration are ignored; unknown kind is loud") {
    val (cat, t) = mkBase(10)
    // an ordinary table in the same catalog must not be treated as index
    cat.createTable("db", "plain", TableDescriptor(StructType(Seq(
      StructField("x", LongType))), bucketKeys = Seq("x")))
    assert(IndexMaintenance.indexesOf(cat, t).isEmpty)
    assert(IndexMaintenance.refreshAll(cat, t).isEmpty)
    // a corrupted registration fails loudly, not silently skipped
    cat.createTable("db", "weird", TableDescriptor(StructType(Seq(
      StructField("x", LongType))), bucketKeys = Seq("x"),
      properties = Map("index.kind" -> "bogus",
        "index.base.path" -> t.path)))
    val e = intercept[IllegalStateException](
      IndexMaintenance.refreshAll(cat, t))
    assert(e.getMessage.contains("bogus"))
  }
}
