package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Producer offset snapshots + undo recovery — mirrors the reference's
  * UndoComputerTest / RecoveryOffsetManagerTest / ProducerOffsetsStoreTest
  * scenarios (fluss-flink/.../sink/undo/, fluss-server/.../coordinator/
  * producer/): atomic check-and-register, TTL expiry, and the per-key
  * first-change undo rules (+I→delete, -U→restore, +U ignored,
  * -D→re-insert).
  */
class UndoRecoverySpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-undo-wh").toString, spark)

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("s", StringType)))

  private def df(rows: (Long, Integer, String)*) =
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((k, v, s), i) =>
        Row(k, v, s, i.toLong)
      }.asJava,
      StructType(schema.fields :+ StructField("ord", LongType)))

  private def pkTable(cat: Catalog, name: String) =
    cat.createTable("db", name,
      TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4))

  private def state(t: GraftTable): Map[Long, (Int, String)] =
    t.scan().collect().map(r =>
      r.getAs[Long]("k") -> ((r.getAs[Int]("v"), r.getAs[String]("s")))).toMap

  // ---- registry semantics (ProducerOffsetsStoreTest shapes) ----

  test("register is atomic check-and-create; never overwrites") {
    val cat = newCatalog()
    val offs = Map("db.t" -> Map(0 -> 5L, 1 -> 3L))
    assert(cat.registerProducerOffsets("job1", offs) == ProducerOffsets.Created)
    // second register with DIFFERENT offsets: refused, original kept
    assert(cat.registerProducerOffsets("job1", Map("db.t" -> Map(0 -> 99L)))
      == ProducerOffsets.AlreadyExists)
    val snap = cat.getProducerOffsets("job1").get
    assert(snap.tables == offs)
    // delete, then the id is registrable again
    assert(cat.deleteProducerOffsets("job1"))
    assert(!cat.deleteProducerOffsets("job1"))
    assert(cat.getProducerOffsets("job1").isEmpty)
    assert(cat.registerProducerOffsets("job1", offs) == ProducerOffsets.Created)
  }

  test("expired snapshots read as absent and are pruned on write") {
    val cat = newCatalog()
    val wh = cat.warehouse
    val now = 1000000L
    assert(ProducerOffsets.register(wh, "stale", Map("db.t" -> Map(0 -> 1L)),
      ttlMillis = 10L, nowMillis = now) == ProducerOffsets.Created)
    // within TTL: present; register under the same id refused
    assert(ProducerOffsets.get(wh, "stale", nowMillis = now + 5).isDefined)
    assert(ProducerOffsets.register(wh, "stale", Map.empty,
      nowMillis = now + 5) == ProducerOffsets.AlreadyExists)
    // past TTL: absent, and a new register under the same id CREATES
    assert(ProducerOffsets.get(wh, "stale", nowMillis = now + 11).isEmpty)
    assert(ProducerOffsets.register(wh, "stale", Map("db.t" -> Map(0 -> 2L)),
      nowMillis = now + 11) == ProducerOffsets.Created)
    assert(ProducerOffsets.list(wh, nowMillis = now + 11).size == 1)
  }

  // ---- undo rules (UndoComputerTest shapes) ----

  test("undo: insert after checkpoint is deleted") {
    val cat = newCatalog()
    val t = pkTable(cat, "u1")
    t.upsert(df((1L, 10, "a")), orderBy = Seq(col("ord")))
    val reg = t.latestOffsets
    t.upsert(df((2L, 20, "b")), orderBy = Seq(col("ord")))
    assert(t.undoTo(reg) == 1L)
    assert(state(t) == Map(1L -> ((10, "a"))))
  }

  test("undo: update after checkpoint restores the pre-image") {
    val cat = newCatalog()
    val t = pkTable(cat, "u2")
    t.upsert(df((1L, 10, "a"), (2L, 20, "b")), orderBy = Seq(col("ord")))
    val reg = t.latestOffsets
    t.upsert(df((1L, 11, "a2")), orderBy = Seq(col("ord")))
    assert(t.undoTo(reg) == 1L)
    assert(state(t) == Map(1L -> ((10, "a")), 2L -> ((20, "b"))))
  }

  test("undo: delete after checkpoint is re-inserted") {
    val cat = newCatalog()
    val t = pkTable(cat, "u3")
    t.upsert(df((1L, 10, "a"), (2L, 20, "b")), orderBy = Seq(col("ord")))
    val reg = t.latestOffsets
    t.delete(df((2L, 0, "")))
    assert(t.undoTo(reg) == 1L)
    assert(state(t) == Map(1L -> ((10, "a")), 2L -> ((20, "b"))))
  }

  test("undo: only the FIRST change per key governs") {
    val cat = newCatalog()
    val t = pkTable(cat, "u4")
    t.upsert(df((1L, 10, "a"), (2L, 20, "b"), (3L, 30, "c")),
      orderBy = Seq(col("ord")))
    val reg = t.latestOffsets
    // k=1: update then delete  -> first is -U, restore (10, a)
    // k=2: delete then insert  -> first is -D, restore (20, b)
    // k=4: insert then update  -> first is +I, delete
    t.upsert(df((1L, 11, "a2"), (4L, 40, "d")), orderBy = Seq(col("ord")))
    t.delete(df((1L, 0, ""), (2L, 0, "")))
    t.upsert(df((2L, 22, "b2"), (4L, 44, "d2")), orderBy = Seq(col("ord")))
    assert(t.undoTo(reg) == 3L)
    assert(state(t) ==
      Map(1L -> ((10, "a")), 2L -> ((20, "b")), 3L -> ((30, "c"))))
  }

  test("undo: nothing past the registered point is a no-op") {
    val cat = newCatalog()
    val t = pkTable(cat, "u5")
    t.upsert(df((1L, 10, "a")), orderBy = Seq(col("ord")))
    val versionBefore = t.latestVersion
    assert(t.undoTo(t.latestOffsets) == 0L)
    assert(t.latestVersion == versionBefore) // no empty compensating commit
  }

  test("undo refuses non-default merge engines and WAL-image tables") {
    val cat = newCatalog()
    val first = cat.createTable("db", "u6", TableDescriptor(schema,
      primaryKey = Seq("k"), mergeEngine = MergeEngine.FirstRow))
    intercept[IllegalArgumentException] { first.undoTo(Map.empty) }
    val wal = cat.createTable("db", "u7", TableDescriptor(schema,
      primaryKey = Seq("k"), changelogImage = ChangelogImage.Wal))
    intercept[IllegalArgumentException] { wal.undoTo(Map.empty) }
  }

  // ---- end-to-end coordinator flow (UndoRecoveryManager shape) ----

  test("recoverProducer compensates every table in the snapshot") {
    val cat = newCatalog()
    val t1 = pkTable(cat, "r1")
    val t2 = pkTable(cat, "r2")
    t1.upsert(df((1L, 10, "a")), orderBy = Seq(col("ord")))
    t2.upsert(df((5L, 50, "e")), orderBy = Seq(col("ord")))
    // startup: register BEFORE writing — first run is CREATED
    assert(cat.registerProducerOffsets("flink-job",
      cat.currentOffsetsFor(Seq("db.r1", "db.r2"))) == ProducerOffsets.Created)
    // ... the job writes, then crashes before its first checkpoint
    t1.upsert(df((1L, 11, "a2"), (2L, 20, "b")), orderBy = Seq(col("ord")))
    t2.delete(df((5L, 0, "")))
    // restart: same id registers ALREADY_EXISTS -> undo to the snapshot
    assert(cat.registerProducerOffsets("flink-job", Map.empty)
      == ProducerOffsets.AlreadyExists)
    val undone = cat.recoverProducer("flink-job")
    assert(undone == Map("db.r1" -> 2L, "db.r2" -> 1L))
    assert(state(t1) == Map(1L -> ((10, "a"))))
    assert(state(t2) == Map(5L -> ((50, "e"))))
    // first checkpoint lands: snapshot deleted, id reusable
    assert(cat.deleteProducerOffsets("flink-job"))
  }
}
