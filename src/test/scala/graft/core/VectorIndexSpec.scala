package graft.core

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.pipeline.Similarity

/** Persisted IVF vector index: identical answers to the query-side IVF
  * path, incremental maintenance from the changelog (including list
  * moves), partition-pruned probes, and the staleness/rollback guards.
  */
class VectorIndexSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val dim = 8

  private def vec(seed: Int): Seq[Double] = {
    val r = new scala.util.Random(seed)
    Seq.fill(dim)(r.nextGaussian())
  }

  private def mkTable(n: Int): (Catalog, GraftTable) = {
    val cat = new Catalog(Files.createTempDirectory("graft-vi").toString, spark)
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType), nullable = false)))
    val t = cat.createTable("db", "vecs",
      TableDescriptor(schema, primaryKey = Seq("vid"), numBuckets = 4))
    val rows = (1 to n).map(i => Row(i.toLong, vec(i), i.toLong))
    t.upsert(spark.createDataFrame(rows.asJava,
      StructType(schema.fields :+ StructField("ord", LongType))),
      orderBy = Seq(col("ord")))
    (cat, t)
  }

  test("index probe == query-side ivfAssign/ivfTopK answer; probes prune partitions") {
    val (cat, t) = mkTable(120)
    val vi = VectorIndex.create(cat, "db", "vecs_ivf", t, "vid", "emb",
      nlist = 8)
    val q = vec(999)
    val got = vi.topK(q, k = 10, nprobe = 3)
      .collect().map(_.getLong(0)).toSeq
    // reference: the ephemeral query-side path on the same state
    val (assigned, cents) = Similarity.ivfAssign(t.scan(), "vid", "emb", 8, spark)
    val want = Similarity.ivfTopK(assigned, cents, "vid", "emb", q, 10, 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // the index table is hive-partitioned by list: a probe's scan reads
    // only the probed partitions (partition pruning in the plan)
    val lists = WarehouseIO.listDir(s"${vi.idx.path}/log")
      .filter(_.isDir).map(_.name).filter(_.startsWith("ivf_list="))
    assert(lists.size > 1, s"expected multiple list partitions, got $lists")
    // the probe's list filter reaches the scan as a PARTITION filter —
    // asserting on the PartitionFilters clause, not the schema echo
    val plan = vi.topK(q, 10, 3).queryExecution.executedPlan.toString
    // V1 form `ivf_list#12 IN (...)` or the grouped scan's description
    // form `ivf_list IN (...)` — both mean the probe pruned partitions
    assert("PartitionFilters: \\[.*ivf_list(#\\d+)? IN ".r
        .findFirstIn(plan).isDefined,
      s"expected a pushed partition filter on ivf_list, plan:\n$plan")
  }

  test("incremental refresh: new vectors, updates that move lists, deletes") {
    val (cat, t) = mkTable(60)
    val vi = VectorIndex.create(cat, "db", "vecs_ivf2", t, "vid", "emb",
      nlist = 4)
    val q = vec(777)
    def addRows(rows: Seq[(Long, Seq[Double])], del: Boolean = false): Unit = {
      val schema = StructType(Seq(
        StructField("vid", LongType, nullable = false),
        StructField("emb", ArrayType(DoubleType), nullable = false),
        StructField("ord", LongType)))
      val df = spark.createDataFrame(rows.zipWithIndex.map {
        case ((id, e), i) => Row(id, e, i.toLong) }.asJava, schema)
      if (del) t.delete(df, orderBy = Seq(col("ord")))
      else t.upsert(df, orderBy = Seq(col("ord")))
    }
    // stale index refuses before refresh
    addRows(Seq(200L -> vec(200)))
    val e = intercept[IllegalArgumentException](vi.topK(q, 5, 2))
    assert(e.getMessage.contains("refresh"))
    vi.refresh()
    // an update that moves the vector to a different centroid's list:
    // replace vid=1's embedding with (almost) another centroid's vector
    addRows(Seq(1L -> vec(3).map(_ * 1.01)))
    // and a delete
    addRows(Seq(2L -> vec(2)), del = true)
    vi.refresh()
    // the index now matches the ephemeral path on current state exactly
    val (assigned, cents0) = Similarity.ivfAssign(t.scan(), "vid", "emb", 4, spark)
    // NOTE: query-side centroids are recomputed from current state; the
    // index keeps its stored quantizer. Compare against the STORED
    // centroids applied to current state — the index's own contract.
    val stored = vi.centroids
    val v = col("emb").cast("array<double>")
    val best = stored.map { case (i, c) =>
      struct((Similarity.dot(v, typedlit(c)) /
        (Similarity.l2norm(v) * lit(math.sqrt(c.map(x => x * x).sum)))).as("s"),
        lit(i).as("i"))
    }
    val wantAssigned = t.scan().withColumn("__list",
      greatest(best.toIndexedSeq: _*)("i"))
    val want = Similarity.ivfTopK(wantAssigned, stored, "vid", "emb", q, 8, 2)
      .collect().map(_.getLong(0)).toSeq
    val got = vi.topK(q, 8, 2).collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // index content agrees row-for-row with the stored-quantizer assignment
    val idxRows = vi.idx.scan()
      .select(col("vid"), col(VectorIndex.ListCol)).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val wantRows = wantAssigned.select(col("vid"), col("__list")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(idxRows == wantRows)
    assert(!idxRows.contains(2L))
    // unchanged since stored cents came from pre-mutation state on 4 lists
    assert(cents0.length == 4 && assigned.columns.contains("__list"))
  }

  test("IVF-PQ: stored codes match pqEncode with the persisted codebook; " +
      "ADC probe with full candidate width == exact probe; refresh maintains codes") {
    val (cat, t) = mkTable(60)
    val vi = VectorIndex.create(cat, "db", "vecs_pq", t, "vid", "emb",
      nlist = 4, pq = Some((4, 8)))
    val cb = vi.pqCodebook.get
    assert(cb.length == 4 && cb(0).length == 8 && cb(0)(0).length == dim / 4)
    def codesInIndex(): Map[Long, Seq[Int]] =
      vi.idx.scan().select(col("vid"), col(VectorIndex.CodeCol)).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    def wantCodes(): Map[Long, Seq[Int]] =
      Similarity.pqEncode(t.scan(), "vid", "emb", cb)
        .select(col("vid"), col("__code")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codesInIndex() == wantCodes())
    // cand >= every probed row => the exact re-rank sees everything the
    // plain probe sees: ADC answer must equal the exact probe's
    val q = vec(555)
    val got = vi.topKAdc(q, k = 6, nprobe = 2, cand = 60)
      .collect().map(_.getLong(0)).toSeq
    val want = vi.topK(q, k = 6, nprobe = 2)
      .select(col("vid")).collect().map(_.getLong(0)).toSeq
    assert(got == want)
    // a narrow candidate width still returns k rows, all from the index
    assert(vi.topKAdc(q, k = 3, nprobe = 2, cand = 5).count() == 3)
    // incremental refresh: new vector + an update; codes stay in lockstep
    // with the PERSISTED codebook (never recomputed from the new state)
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType), nullable = false),
      StructField("ord", LongType)))
    t.upsert(spark.createDataFrame(
      Seq(Row(500L, vec(500), 0L), Row(1L, vec(77), 1L)).asJava, schema),
      orderBy = Seq(col("ord")))
    vi.refresh()
    assert(vi.pqCodebook.get.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.map(_.map(_.toSeq).toSeq).toSeq)
    assert(codesInIndex() == wantCodes())
    // a plain IVF index refuses ADC probes loudly
    val plain = VectorIndex.create(cat, "db", "vecs_noPq", t, "vid", "emb",
      nlist = 4)
    val e = intercept[IllegalStateException](plain.topKAdc(q, 3, 2))
    assert(e.getMessage.contains("PQ codebook"))
  }

  test("WAL-image base tables are refused (suppressed -U strands stale entries)") {
    val cat = new Catalog(Files.createTempDirectory("graft-vi-wal").toString, spark)
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType), nullable = false)))
    val t = cat.createTable("db", "walv", TableDescriptor(schema,
      primaryKey = Seq("vid"), numBuckets = 2,
      changelogImage = ChangelogImage.Wal))
    val e = intercept[IllegalArgumentException](
      VectorIndex.create(cat, "db", "walv_ivf", t, "vid", "emb", nlist = 2))
    assert(e.getMessage.contains("FULL"))
    // ...and the failed create leaves no orphaned index table behind
    assert(!cat.tableExists("db", "walv_ivf"))
  }

  test("vacuum past the applied version re-baselines instead of refusing forever") {
    val (cat, t) = mkTable(50)
    val vi = VectorIndex.create(cat, "db", "vecs_ivf4", t, "vid", "emb",
      nlist = 4)
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType), nullable = false),
      StructField("ord", LongType)))
    t.upsert(spark.createDataFrame(
      Seq(Row(400L, vec(400), 0L), Row(401L, vec(401), 1L)).asJava, schema),
      orderBy = Seq(col("ord")))
    t.compact(); t.vacuumLog() // truncate the changelog the refresh needed
    vi.refresh() // must re-baseline from state, not throw
    val ids = vi.idx.scan().select("vid").collect().map(_.getLong(0)).toSet
    assert(ids.contains(400L) && ids.contains(401L) && ids.size == 52)
    assert(vi.topK(vec(400), 3, 4).head.getLong(0) == 400L)
  }

  test("rollback forces a rebuild with the SAME stored centroids") {
    val (cat, t) = mkTable(40)
    val vi = VectorIndex.create(cat, "db", "vecs_ivf3", t, "vid", "emb",
      nlist = 4)
    val centsBefore = vi.centroids.map { case (i, c) => (i, c) }.toSeq
    val v0 = t.latestVersion.get
    // mutate then restore
    val schema = StructType(Seq(
      StructField("vid", LongType, nullable = false),
      StructField("emb", ArrayType(DoubleType), nullable = false),
      StructField("ord", LongType)))
    t.upsert(spark.createDataFrame(
      Seq(Row(300L, vec(300), 0L)).asJava, schema), orderBy = Seq(col("ord")))
    t.rollbackTo(v0)
    val e = intercept[IllegalArgumentException](vi.topK(vec(1), 3, 2))
    assert(e.getMessage.contains("restore") || e.getMessage.contains("refresh"))
    vi.refresh()
    assert(vi.centroids.map { case (i, c) => (i, c) }.toSeq == centsBefore)
    assert(vi.topK(vec(1), 3, 2).count() == 3)
  }
}
