package graft.core

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** The object-store commit-coordination SPI: on a scheme whose
  * exclusive-create is NOT atomic ([[RacyMockFs]] — existence check and
  * write are separate requests, like S3), the engine must never corrupt
  * silently. Without a coordinator it REFUSES loudly; with the
  * file-lease reference coordinator, racing committers serialize to
  * exactly one winner; `graft.commit.allow-non-atomic` is the documented
  * escape hatch for externally-serialized deployments.
  */
class CommitCoordinatorSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private def setupRacyfs(): Unit = {
    WarehouseIO.setConf("fs.racyfs.impl", classOf[RacyMockFs].getName)
    spark.sparkContext.hadoopConfiguration
      .set("fs.racyfs.impl", classOf[RacyMockFs].getName)
    spark.conf.set("spark.hadoop.fs.racyfs.impl", classOf[RacyMockFs].getName)
    CommitCoordinators.markNonAtomic("racyfs")
  }

  private def allowNonAtomic[T](body: => T): T = {
    WarehouseIO.setConf("graft.commit.allow-non-atomic", "true")
    try body
    finally WarehouseIO.setConf("graft.commit.allow-non-atomic", "false")
  }

  /** `n` threads rendezvous on a barrier, then all attempt the exclusive
    * create of `lock`; returns how many won.
    */
  private def raceExclusive(lock: String, n: Int): Int = {
    val barrier = new CyclicBarrier(n)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { _ =>
      new Thread(() => {
        try {
          barrier.await()
          if (WarehouseIO.createExclusive(lock)) wins.incrementAndGet()
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    // load-tolerant budget: under a full parallel suite the racers are
    // CPU-starved; a short join would undercount wins and flake
    threads.foreach(_.start()); threads.foreach(_.join(180000))
    assert(threads.forall(!_.isAlive), "racer still running after 180 s")
    assert(errs.isEmpty, s"racer threw: ${errs.asScala.headOption}")
    wins.get()
  }

  test("the hazard is real: on a non-atomic scheme every racer 'wins' the lock") {
    setupRacyfs()
    val dir = "racyfs://test" + Files.createTempDirectory("graft-racy-hazard")
    // opt out of the refusal to observe what raw object-store semantics do
    val winners = allowNonAtomic {
      raceExclusive(s"$dir/_commit.lock", 4)
    }
    assert(winners >= 2,
      s"expected the non-atomic create to admit multiple winners, got $winners")
  }

  test("without a coordinator, commit-side IO on a non-atomic scheme refuses loudly") {
    setupRacyfs()
    val dir = "racyfs://test" + Files.createTempDirectory("graft-racy-refuse")
    val e1 = intercept[IllegalStateException](
      WarehouseIO.createExclusive(s"$dir/_commit.lock"))
    assert(e1.getMessage.contains("CommitCoordinator"))
    val e2 = intercept[IllegalStateException](
      WarehouseIO.atomicWriteString(s"$dir/manifest.json", "{}"))
    assert(e2.getMessage.contains("CommitCoordinator"))
    // reads never need coordination
    assert(!WarehouseIO.exists(s"$dir/manifest.json"))
    assert(WarehouseIO.listDir(dir).isEmpty)
  }

  test("file-lease coordinator: exactly one winner per race, every iteration") {
    setupRacyfs()
    val leases = Files.createTempDirectory("graft-leases").toString
    CommitCoordinators.register("racyfs", new FileLeaseCommitCoordinator(leases))
    try {
      val dir = "racyfs://test" + Files.createTempDirectory("graft-racy-coord")
      (0 until 10).foreach { i =>
        val winners = raceExclusive(s"$dir/lock-$i", 4)
        assert(winners == 1, s"iteration $i: $winners winners")
      }
      // release + re-acquire works (the lock file is a real store object)
      assert(WarehouseIO.exists(s"$dir/lock-0"))
      WarehouseIO.deleteIfExists(s"$dir/lock-0")
      assert(WarehouseIO.createExclusive(s"$dir/lock-0"))
      // coordinated publish: readers see old-or-new, and the temp is gone
      WarehouseIO.atomicWriteString(s"$dir/m.json", "v1")
      WarehouseIO.atomicWriteString(s"$dir/m.json", "v2")
      assert(WarehouseIO.readString(s"$dir/m.json") == "v2")
      assert(WarehouseIO.listDir(dir).count(_.name.contains(".tmp-")) == 0)
    } finally CommitCoordinators.unregister("racyfs")
  }

  test("end-to-end on a coordinated object-store scheme: commits work, a held lock aborts loudly") {
    setupRacyfs()
    val leases = Files.createTempDirectory("graft-leases-e2e").toString
    CommitCoordinators.register("racyfs", new FileLeaseCommitCoordinator(leases))
    try {
      val wh = "racyfs://test" + Files.createTempDirectory("graft-racy-wh")
      val cat = new Catalog(wh, spark)
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("v", IntegerType)))
      val t = cat.createTable("db", "t",
        TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 2))
      def rows(kv: (Long, Integer)*) = spark.createDataFrame(
        kv.zipWithIndex.map { case ((k, v), i) => Row(k, v, i.toLong) }.asJava,
        StructType(schema.fields :+ StructField("ord", LongType)))
      t.upsert(rows(1L -> Int.box(1), 2L -> Int.box(2)), orderBy = Seq(col("ord")))
      t.upsert(rows(1L -> Int.box(10)), orderBy = Seq(col("ord")))
      assert(t.scan().orderBy("k").collect().map(_.getInt(1)).toSeq == Seq(10, 2))
      // a racing committer (the held lock) must abort loudly, not corrupt
      assert(WarehouseIO.createExclusive(s"${t.path}/_commit.lock"))
      val e = intercept[java.util.ConcurrentModificationException](
        t.upsert(rows(3L -> Int.box(3)), orderBy = Seq(col("ord"))))
      assert(e.getMessage.contains("another commit holds the lock"))
      WarehouseIO.deleteIfExists(s"${t.path}/_commit.lock")
      t.upsert(rows(3L -> Int.box(3)), orderBy = Seq(col("ord")))
      assert(t.scan().count() == 3)
    } finally CommitCoordinators.unregister("racyfs")
  }

  test("a vanished lease root is recreated, never a silent unlocked run") {
    setupRacyfs()
    val leases = Files.createTempDirectory("graft-leases-gone").toString
    CommitCoordinators.register("racyfs", new FileLeaseCommitCoordinator(leases))
    try {
      val dir = "racyfs://test" + Files.createTempDirectory("graft-racy-gone")
      // first commit cycle leaves the lease dir EMPTY (locks delete after
      // use) — exactly the state a tmp cleaner would reap
      assert(raceExclusive(s"$dir/lock-a", 4) == 1)
      WarehouseIO.deleteRecursively(leases)
      assert(!WarehouseIO.exists(leases))
      // next acquisition must still serialize (root recreated per lease),
      // not inherit withFileLock's run-unlocked missing-parent fallback
      (0 until 5).foreach { i =>
        val winners = raceExclusive(s"$dir/lock-b$i", 4)
        assert(winners == 1, s"after lease-root removal: $winners winners")
      }
    } finally CommitCoordinators.unregister("racyfs")
  }

  test("withFileLock missingParentFatal refuses instead of running unlocked") {
    val root = Files.createTempDirectory("graft-lock-fatal").toString
    val under = s"$root/gone/meta.json"
    // default posture: vanished parent falls through to the body (the
    // catalog-metadata contract — the body surfaces the real error)
    var ran = false
    CatalogJson.withFileLock(under) { ran = true }
    assert(ran)
    // commit-coordination posture: loud refusal, body never runs
    val e = intercept[IllegalStateException](
      CatalogJson.withFileLock(under, missingParentFatal = true) {
        fail("body must not run unlocked")
      })
    assert(e.getMessage.contains("unlocked"))
  }

  test("the lease root itself must live on an atomic filesystem") {
    setupRacyfs()
    val e = intercept[IllegalArgumentException](
      new FileLeaseCommitCoordinator("racyfs://test/tmp/leases"))
    assert(e.getMessage.contains("atomic"))
  }
}
