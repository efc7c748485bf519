package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** `CALL sys.rebucket` — full log re-hash to a new storage bucket count
  * through the atomic rewrite/visibility-flip protocol: scan equality,
  * changelog order, stale-handle fencing, crash recovery from the intent
  * marker, and derived-index refusal-then-rebuild. (The SPJ co-partition
  * case lives in SpjSpec, next to its plan-shape helpers.)
  */
class RebucketSpec extends SparkTestBase {

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-rebucket").toString, spark)

  private val kvSchema = StructType(Seq(
    StructField("k", LongType), StructField("v", IntegerType)))

  private def kvDf(rows: (Long, Integer)*) = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava,
      StructType(kvSchema.fields :+ StructField("ord", LongType)))
  }

  test("log table: scan set, fast count and bucket-pruned reads survive " +
      "a rebucket in both directions") {
    val cat = newCatalog()
    val t = cat.createTable("db", "lg", TableDescriptor(kvSchema,
      bucketKeys = Seq("k"), numBuckets = 4))
    import spark.implicits._
    t.append((1L to 200L).map(i => (i, i.toInt)).toDF("k", "v"))
    val before = t.scan().collect().map(_.toSeq).toSet
    val t8 = cat.rebucket("db", "lg", 8)
    assert(t8.desc.numBuckets == 8)
    assert(t8.scan().collect().map(_.toSeq).toSet == before)
    assert(t8.fastCount == 200L)
    // pruned point read finds its row under the NEW hashing (scanPruned
    // returns the key's bucket; callers apply the residual predicate)
    assert(t8.scanPruned(Map("k" -> 7L)).filter(col("k") === 7L)
      .collect().toSeq == Seq(Row(7L, 7)))
    // shrink back down; appends keep working on the fresh handle
    val t2 = cat.rebucket("db", "lg", 2)
    assert(t2.scan().collect().map(_.toSeq).toSet == before)
    t2.append(Seq((201L, 201)).toDF("k", "v"))
    assert(t2.fastCount == 201L)
  }

  test("PK table: state, lookups and per-key changelog order survive; " +
      "the snapshot tier is dropped and recompacts") {
    val cat = newCatalog()
    val t = cat.createTable("db", "kv", TableDescriptor(kvSchema,
      primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(kvDf((1L to 50L).map(i => (i, Integer.valueOf(i.toInt))): _*),
      orderBy = Seq(col("ord")))
    t.upsert(kvDf((1L, 100), (2L, 200)), orderBy = Seq(col("ord")))
    t.compact() // snapshot tier in the OLD bucketing
    val before = t.scan().collect().map(_.toSeq).toSet
    val t8 = cat.rebucket("db", "kv", 8)
    assert(t8.scan().collect().map(_.toSeq).toSet == before)
    assert(t8.lookup(Map("k" -> 1L)).collect().toSeq == Seq(Row(1L, 100)))
    // per-key changelog order preserved exactly: k=1 is +I then -U/+U
    val ct = t8.changelog().filter(col("k") === 1L)
      .orderBy(col("_log_offset"))
      .select("_change_type", "v").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(ct == Seq(("+I", 1), ("-U", 1), ("+U", 100)), ct)
    // the old-bucketing snapshot tier is gone; compacting rebuilds it
    // in the new layout and reads stay exact
    t8.compact()
    assert(t8.scan().collect().map(_.toSeq).toSet == before)
    t8.upsert(kvDf((3L, 300)), orderBy = Seq(col("ord")))
    assert(t8.lookup(Map("k" -> 3L)).collect().toSeq == Seq(Row(3L, 300)))
  }

  test("partitioned table: rows stay in their partition dirs, partition " +
      "pruning and state both survive the rebucket") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      StructField("dt", StringType), StructField("k", LongType),
      StructField("v", IntegerType)))
    val t = cat.createTable("db", "pt", TableDescriptor(schema,
      primaryKey = Seq("dt", "k"), partitionKeys = Seq("dt"),
      numBuckets = 4))
    import scala.jdk.CollectionConverters._
    val rows = (1L to 40L).map(i =>
      Row(if (i % 2 == 0) "a" else "b", i, i.toInt, i))
    t.upsert(spark.createDataFrame(rows.asJava,
        StructType(schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    val before = t.scan().collect().map(_.toSeq).toSet
    val t8 = cat.rebucket("db", "pt", 8)
    assert(t8.scan().collect().map(_.toSeq).toSet == before)
    assert(t8.scan().filter(col("dt") === "a").count() == 20)
    // hive layout intact: partition dirs above the new bucket dirs
    assert(WarehouseIO.walkFiles(s"${t8.path}/log")
      .exists(e => e.path.contains("dt=a/") && e.path.contains("__bucket=")))
    assert(t8.lookup(Map("dt" -> "a", "k" -> 2L)).collect().toSeq ==
      Seq(Row("a", 2L, 2)))
  }

  test("handles opened before the rebucket refuse to commit (stale " +
      "bucket count); vacuumed tables refuse up front") {
    val cat = newCatalog()
    val stale = cat.createTable("db", "st", TableDescriptor(kvSchema,
      bucketKeys = Seq("k"), numBuckets = 4))
    import spark.implicits._
    stale.append(Seq((1L, 1)).toDF("k", "v"))
    cat.rebucket("db", "st", 8)
    val e = intercept[java.util.ConcurrentModificationException](
      stale.append(Seq((2L, 2)).toDF("k", "v")))
    assert(e.getMessage.contains("rebucketed"), e.getMessage)
    // ...while its bucket-pruned READS self-heal against the published
    // descriptor (hashing k=1 with the old count would probe the wrong
    // dir and silently miss)
    assert(stale.scanPruned(Map("k" -> 1L)).filter(col("k") === 1L)
      .collect().toSeq == Seq(Row(1L, 1)))
    // fresh handle commits fine
    cat.getTable("db", "st").append(Seq((2L, 2)).toDF("k", "v"))
    assert(cat.getTable("db", "st").fastCount == 2L)

    val vac = cat.createTable("db", "vc", TableDescriptor(kvSchema,
      primaryKey = Seq("k"), numBuckets = 4))
    vac.upsert(kvDf((1L, 1), (2L, 2)), orderBy = Seq(col("ord")))
    vac.compact(); vac.vacuumLog()
    val ev = intercept[IllegalArgumentException](cat.rebucket("db", "vc", 8))
    assert(ev.getMessage.contains("vacuum"), ev.getMessage)
  }

  test("crash recovery: a pre-swap marker fences mutation and aborts; a " +
      "post-swap marker replays the descriptor flip") {
    val cat = newCatalog()
    val t = cat.createTable("db", "cr", TableDescriptor(kvSchema,
      bucketKeys = Seq("k"), numBuckets = 4))
    import spark.implicits._
    t.append((1L to 20L).map(i => (i, i.toInt)).toDF("k", "v"))
    val before = t.scan().collect().map(_.toSeq).toSet
    val marker = s"${t.path}/_rebucket.json"

    // (a) crash AFTER the marker, BEFORE the swap: ids in the marker
    // still match the manifest. Every mutator refuses loudly...
    val ids: org.json4s.JValue = org.json4s.jackson.JsonMethods
      .parse(WarehouseIO.readString(s"${t.path}/_offsets.json"))
      .asInstanceOf[org.json4s.JObject].obj
      .toMap[String, org.json4s.JValue].apply("ids")
    CatalogJson.atomicWrite(marker, org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(List(
        "to" -> (org.json4s.JInt(8): org.json4s.JValue), "ids" -> ids)))))
    val e = intercept[java.util.ConcurrentModificationException](
      t.append(Seq((21L, 21)).toDF("k", "v")))
    assert(e.getMessage.contains("rebucket"), e.getMessage)
    // ...and the next rebucket call recovers (abort) then re-runs clean
    val t8 = cat.rebucket("db", "cr", 8)
    assert(t8.desc.numBuckets == 8 && !WarehouseIO.exists(marker))
    assert(t8.scan().collect().map(_.toSeq).toSet == before)

    // (b) crash AFTER the swap, BEFORE the meta flip: reconstruct that
    // state from the completed rebucket — descriptor reverted to the old
    // count, marker pinning the PRE-swap id set (≠ current ids)
    val d = CatalogJson.read(WarehouseIO.readString(s"${t8.path}/meta.json"))
    CatalogJson.atomicWrite(s"${t8.path}/meta.json",
      CatalogJson.write(d.copy(numBuckets = 4)))
    CatalogJson.atomicWrite(marker, org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(org.json4s.JObject(List(
        "to" -> (org.json4s.JInt(8): org.json4s.JValue), "ids" -> ids)))))
    // recovery proves the swap published (ids moved) and replays step 3
    val fixed = cat.rebucket("db", "cr", 8)
    assert(fixed.desc.numBuckets == 8 && !WarehouseIO.exists(marker))
    assert(fixed.scan().collect().map(_.toSeq).toSet == before)
  }

  test("vector index refuses after a base rebucket (epoch) and refresh() " +
      "rebuilds it") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    val t = cat.createTable("db", "vx", TableDescriptor(schema,
      primaryKey = Seq("vec_id"), numBuckets = 4))
    import scala.jdk.CollectionConverters._
    val rnd = new scala.util.Random(5)
    val rows = (1L to 16L).map(i =>
      Row(i, Seq.fill(8)(rnd.nextGaussian()), i))
    t.upsert(spark.createDataFrame(rows.asJava,
        StructType(schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    val vi = VectorIndex.create(cat, "db", "vx_ivf", t, "vec_id",
      "embedding", nlist = 2)
    val q = Seq.fill(8)(rnd.nextGaussian())
    val before = vi.topK(q, k = 3, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(before.length == 3)
    cat.rebucket("db", "vx", 8)
    val e = intercept[IllegalArgumentException](vi.topK(q, 3, 2))
    assert(e.getMessage.contains("refresh"), e.getMessage)
    vi.refresh() // epoch mismatch -> full rebuild against the new layout
    assert(vi.topK(q, 3, 2).collect().map(_.getLong(0)).toSeq == before)
  }

  test("bucketLoadStats + suggestBucketCount: the advisory half of the " +
      "rebalance twin, through the engine API and CALL sys.suggest_rebucket") {
    val whDir = Files.createTempDirectory("graft-rebucket-adv").toString
    val cat = new Catalog(whDir, spark)
    val t = cat.createTable("db", "adv", TableDescriptor(kvSchema,
      bucketKeys = Seq("k"), numBuckets = 2))
    import spark.implicits._
    t.append((1L to 500L).map(i => (i, i.toInt)).toDF("k", "v"))
    val load = t.bucketLoadStats()
    assert(load.keySet.subsetOf(Set(0, 1)) && load.nonEmpty)
    val total = load.values.map(_._2).sum
    assert(total > 0L && load.values.forall(_._1 > 0L))
    // a tiny per-bucket target recommends growing; an unbounded one
    // collapses to a single bucket; the defaults stay sane
    assert(t.suggestBucketCount(targetBytes = 1L) > 2)
    assert(t.suggestBucketCount(targetBytes = Long.MaxValue) == 1)
    assert(t.suggestBucketCount() == 1) // 1 GiB target, KB-scale table
    // the SQL surface reports load, skew and the recommendation
    spark.conf.set("spark.sql.catalog.rbadv",
      classOf[graft.connector.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rbadv.warehouse", whDir)
    val res = spark.sql("CALL rbadv.system.suggest_rebucket('db.adv', 1)")
      .collect()(0).getString(0)
    assert(res.contains("buckets=2") && res.contains("suggested=") &&
      res.contains("CALL sys.rebucket"), res)
    val balanced = spark.sql(
        s"CALL rbadv.system.suggest_rebucket('db.adv', $total)")
      .collect()(0).getString(0)
    assert(balanced.contains("suggested=1"), balanced)

    // LIVE load, not scannable bytes: compacting a PK table materializes
    // the live state into the snapshot tier — the pre-cutoff changelog
    // history must not double-count, or suggest_rebucket recommends ~2x
    // the buckets the live volume warrants
    val pk = cat.createTable("db", "advpk", TableDescriptor(kvSchema,
      primaryKey = Seq("k"), numBuckets = 2))
    pk.upsert(kvDf((1L to 300L).map(i =>
      (i, Integer.valueOf(i.toInt))): _*), orderBy = Seq(col("ord")))
    val beforeCompact = pk.bucketLoadStats().values.map(_._2).sum
    pk.compact() // snapshot now duplicates every live row
    val afterCompact = pk.bucketLoadStats().values.map(_._2).sum
    assert(afterCompact < beforeCompact * 3 / 2,
      s"live-bytes metric double-counted: $beforeCompact -> $afterCompact")
  }

  test("derived secondary index refuses after a rebucket (epoch) and " +
      "refresh() rebuilds it") {
    val cat = newCatalog()
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("cat", StringType),
      StructField("v", IntegerType)))
    import scala.jdk.CollectionConverters._
    def df(rows: (Long, String, Integer)*) = spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, c, v), i) =>
        Row(k, c, v, i.toLong) }.asJava,
      StructType(schema.fields :+ StructField("ord", LongType)))
    val t = cat.createTable("db", "ix", TableDescriptor(schema,
      primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(df((1L, "a", 1), (2L, "b", 2), (3L, "a", 3)),
      orderBy = Seq(col("ord")))
    val si = SecondaryIndex.create(cat, "db", "ix_by_cat", t, Seq("cat"))
    assert(si.lookup("a").count() == 2)
    cat.rebucket("db", "ix", 8)
    // epoch bumped: the index must refuse, not serve rows keyed to a
    // bucketing that no longer exists
    intercept[IllegalArgumentException](si.lookup("a"))
    si.refresh() // epoch mismatch -> full rebuild against the new layout
    assert(si.lookup("a").select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
  }

  test("state-seeded rebucket: a vacuumed PK table re-hashes its CURRENT " +
      "state with a fresh history; vacuumed append tables still refuse") {
    val cat = newCatalog()
    val t = cat.createTable("db", "ss", TableDescriptor(kvSchema,
      primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(kvDf((1L to 40L).map(i => (i, Integer.valueOf(i.toInt))): _*),
      orderBy = Seq(col("ord")))
    t.upsert(kvDf((1L, 100), (2L, 200)), orderBy = Seq(col("ord")))
    t.deleteWhere(col("k") === 3L)
    t.compact(); t.vacuumLog()
    val before = t.scan().collect().map(_.toSeq).toSet
    assert(before.size == 39)
    // the plain form refuses, pointing at the state-seeded escape hatch
    val e = intercept[IllegalArgumentException](cat.rebucket("db", "ss", 8))
    assert(e.getMessage.contains("stateSeeded"), e.getMessage)
    val t8 = cat.rebucket("db", "ss", 8, stateSeeded = true)
    assert(t8.desc.numBuckets == 8)
    assert(t8.scan().collect().map(_.toSeq).toSet == before)
    assert(t8.lookup(Map("k" -> 1L)).collect().toSeq == Seq(Row(1L, 100)))
    assert(t8.lookup(Map("k" -> 3L)).collect().isEmpty) // stays deleted
    // history restarted: changelog is all +I from offset 0, vacuum floor
    // cleared, ONE fresh version entry
    assert(t8.changelog().select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("+I"))
    assert(t8.retainedFloorOffsets.isEmpty)
    assert(t8.history().count() == 1)
    // the table keeps working: upserts, compact, lookups
    t8.upsert(kvDf((5L, 500)), orderBy = Seq(col("ord")))
    assert(t8.lookup(Map("k" -> 5L)).collect().toSeq == Seq(Row(5L, 500)))
    t8.compact()
    assert(t8.lookup(Map("k" -> 2L)).collect().toSeq == Seq(Row(2L, 200)))

    // append table: no collapsed state to seed from — refuse always
    val ap = cat.createTable("db", "ssa", TableDescriptor(kvSchema,
      bucketKeys = Seq("k"), numBuckets = 4))
    import spark.implicits._
    ap.append(Seq((1L, 1)).toDF("k", "v"))
    val ea = intercept[IllegalArgumentException](
      cat.rebucket("db", "ssa", 8, stateSeeded = true))
    assert(ea.getMessage.contains("PK tables only"), ea.getMessage)

    // partitioned PK table: rows stay in their partition dirs and the
    // fresh per-bucket numbering spans partitions (offsets are
    // per-bucket, not per-(partition, bucket))
    val pschema = StructType(Seq(
      StructField("dt", StringType), StructField("k", LongType),
      StructField("v", IntegerType)))
    val pt = cat.createTable("db", "ssp", TableDescriptor(pschema,
      primaryKey = Seq("dt", "k"), partitionKeys = Seq("dt"),
      numBuckets = 4))
    import scala.jdk.CollectionConverters._
    val prows = (1L to 24L).map(i =>
      Row(if (i % 2 == 0) "a" else "b", i, i.toInt, i))
    pt.upsert(spark.createDataFrame(prows.asJava,
        StructType(pschema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    pt.compact(); pt.vacuumLog()
    val pBefore = pt.scan().collect().map(_.toSeq).toSet
    val pt8 = cat.rebucket("db", "ssp", 8, stateSeeded = true)
    assert(pt8.scan().collect().map(_.toSeq).toSet == pBefore)
    assert(pt8.scan().filter(col("dt") === "a").count() == 12)
    assert(pt8.lookup(Map("dt" -> "a", "k" -> 2L)).collect().toSeq ==
      Seq(Row("a", 2L, 2)))
    assert(WarehouseIO.walkFiles(s"${pt8.path}/log")
      .exists(e => e.path.contains("dt=b/") && e.path.contains("__bucket=")))
  }

  test("pruned reads fall back to unpruned while a rebucket marker " +
      "exists: the swap-to-meta-flip crash window serves correct rows") {
    val cat = newCatalog()
    val t = cat.createTable("db", "rf", TableDescriptor(kvSchema,
      primaryKey = Seq("k"), numBuckets = 4))
    t.upsert(kvDf((1L to 30L).map(i => (i, Integer.valueOf(i.toInt))): _*),
      orderBy = Seq(col("ord")))
    val before = t.scan().collect().map(_.toSeq).toSet
    val t8 = cat.rebucket("db", "rf", 8)
    // reconstruct the crash window: log ALREADY in the 8-space, meta.json
    // reverted to the old count, intent marker still present (its pinned
    // ids deliberately ≠ current so recovery replays the flip)
    val d = CatalogJson.read(WarehouseIO.readString(s"${t8.path}/meta.json"))
    CatalogJson.atomicWrite(s"${t8.path}/meta.json",
      CatalogJson.write(d.copy(numBuckets = 4)))
    CatalogJson.atomicWrite(s"${t8.path}/_rebucket.json",
      """{"to":8,"ids":null}""")
    // a handle opened NOW believes numBuckets=4 over an 8-space log:
    // hashing with 4 would probe the wrong __bucket= dirs for ~half the
    // keys and silently return empty — the marker forces the unpruned
    // (always-correct) form on every pruned read surface
    val h = cat.getTable("db", "rf")
    assert(h.desc.numBuckets == 4)
    assert(h.lookup(Map("k" -> 7L)).collect().toSeq == Seq(Row(7L, 7)))
    assert(h.lookupAll((1L to 30L).map(i => Map[String, Any]("k" -> i)))
      .count() == 30)
    assert(h.scanPruned(Map("k" -> 9L)).filter(col("k") === 9L)
      .collect().toSeq == Seq(Row(9L, 9)))
    import spark.implicits._
    assert(h.scanPrunedToKeys(Seq(7L, 9L).toDF("k"))
      .filter(col("k").isin(7L, 9L)).count() == 2)
    // mutation stays loudly fenced through the same window
    intercept[java.util.ConcurrentModificationException](
      h.upsert(kvDf((31L, 31)), orderBy = Seq(col("ord"))))
    // recovery replays the flip; pruned reads prune again and stay exact
    val fixed = cat.rebucket("db", "rf", 8)
    assert(fixed.desc.numBuckets == 8)
    assert(fixed.scan().collect().map(_.toSeq).toSet == before)
    assert(fixed.lookup(Map("k" -> 7L)).collect().toSeq == Seq(Row(7L, 7)))
  }
}
