package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.pipeline.Similarity

/** Persisted IVF vector index over a PK table's embedding column: a
  * derived PK table PARTITIONED by the coarse-quantizer list id, so an
  * ANN probe reads only `nprobe`/`nlist` of the data through ordinary
  * partition pruning — the storage-level design [[Similarity.ivfAssign]]
  * documents ("at scale the assignment column becomes the partition key
  * of the stored table") made a first-class, durable artifact. The
  * complement of [[SecondaryIndex]] for vector search: centroids persist
  * in the index metadata (an index retrains by REBUILD, never silently
  * on refresh — moving centroids would strand existing assignments), and
  * assignments maintain INCREMENTALLY from the base table's changelog in
  * log-offset order, with the rollback-epoch full-rebuild guard.
  *
  * At 100 TB: the index table is the only thing a query touches — a
  * probe is a partition-pruned scan of nprobe lists plus an exact
  * re-rank inside them; the base table's raw vectors are read only at
  * (re)build. The reference has no vector search (SURVEY §2.3); this
  * extends the engine's index machinery to the embedding workloads the
  * pipeline family (sim1–sim6) already serves query-side.
  */
final class VectorIndex private[core] (val table: GraftTable,
    val idCol: String, val vecCol: String, val idx: GraftTable) {

  private def metaFile = s"${idx.path}/_vector_index_meta.json"

  private def jnum(v: JValue, where: => String): Double = v match {
    case JDouble(d) => d
    case JInt(n) => n.toDouble // whole-valued coordinate round-trip
    case other => throw new IllegalStateException(s"bad $where: $other")
  }

  private def readMeta()
      : (Array[(Int, Seq[Double])], Long, Long, Option[Array[Array[Array[Double]]]]) = {
    val s = WarehouseIO.readString(metaFile)
    val f = JsonMethods.parse(s).asInstanceOf[JObject].obj.toMap
    val cents = f("centroids").asInstanceOf[JArray].arr.zipWithIndex.map {
      case (JArray(xs), i) =>
        (i, xs.map(jnum(_, s"centroid coordinate in $metaFile")): Seq[Double])
      case (other, i) => throw new IllegalStateException(
        s"bad centroid $i in $metaFile: $other")
    }.toArray
    def long(k: String) = f(k).asInstanceOf[JInt].num.toLong
    val pq = f.get("pqCodebook").map { cb =>
      cb.asInstanceOf[JArray].arr.map { sub =>
        sub.asInstanceOf[JArray].arr.map { c =>
          c.asInstanceOf[JArray].arr
            .map(jnum(_, s"pq centroid coordinate in $metaFile")).toArray
        }.toArray
      }.toArray
    }
    (cents, long("appliedVersion"), long("epoch"), pq)
  }

  private def writeMeta(cents: Array[(Int, Seq[Double])], v: Long,
      epoch: Long, pq: Option[Array[Array[Array[Double]]]]): Unit =
    WarehouseIO.atomicWriteString(metaFile, JsonMethods.compact(
      JsonMethods.render(JObject(List(
        "centroids" -> (JArray(cents.sortBy(_._1).toList.map { case (_, c) =>
          JArray(c.toList.map(JDouble(_)))
        }): JValue),
        "appliedVersion" -> (JInt(v): JValue),
        "epoch" -> (JInt(epoch): JValue)) ++
        pq.map(cb => "pqCodebook" -> (JArray(cb.toList.map(sub =>
          JArray(sub.toList.map(c =>
            JArray(c.toList.map(JDouble(_))))))): JValue))))))

  /** The persisted coarse centroids (list id → vector). */
  def centroids: Array[(Int, Seq[Double])] = readMeta()._1

  /** Base-table version the index reflects. */
  def appliedVersion: Long = readMeta()._2

  /** The persisted PQ codebook (subspace → centroid → coordinates) when
    * the index stores ADC codes; None on a plain IVF index.
    */
  def pqCodebook: Option[Array[Array[Array[Double]]]] = readMeta()._4

  /** Nearest-list assignment with the STORED centroids — delegates to
    * the one shared definition ([[Similarity.ivfListOf]]) so the index's
    * assignment can never drift from the ephemeral query path's.
    */
  private def listOf(vec: org.apache.spark.sql.Column,
      cents: Array[(Int, Seq[Double])]): org.apache.spark.sql.Column =
    Similarity.ivfListOf(vec, cents)

  /** Catch the index up to the base table's latest version: the
    * changelog slice since the last applied version, each entry assigned
    * with the stored centroids. `+I/+U` upsert into their list; `-U/-D`
    * delete the OLD (list, id) entry — a vector whose embedding moves
    * lists is deleted from the old partition and inserted into the new
    * one atomically (both changes ride one changelog pair). A base-table
    * restore (rollback epoch change) forces a full rebuild with the SAME
    * centroids.
    */
  def refresh(): Unit = {
    val epoch = table.rollbackEpoch
    val (cents, from, appliedEp, pqCb) = readMeta()
    // a vacuum past the applied version truncated the changelog slice we
    // would need: re-baseline from the current state (same centroids)
    // instead of refusing forever
    def vacuumedPast(fromV: Long): Boolean =
      try table.retainedFloorOffsets.exists { floor =>
        val fromOff = table.offsetsAtVersion(fromV)
        floor.exists { case (b, f) => fromOff.getOrElse(b, 0L) < f }
      } catch {
        // the applied version itself fell out of recorded history
        case _: IllegalArgumentException => true
      }
    if (appliedEp != epoch || vacuumedPast(from)) rebuildFromState(cents, epoch, pqCb)
    else table.latestVersion.foreach { to =>
      if (to > from) {
        val ch = table.changesBetween(from, to)
        idx.upsertMixed(indexRows(ch, cents, pqCb,
            offset = col(Meta.LogOffset),
            delete = col(Meta.ChangeTypeCol).isin(
              ChangeType.UpdateBefore, ChangeType.Delete)),
          orderBy = Seq(col(SecondaryIndex.SourceOffsetCol)))
        writeMeta(cents, to, epoch, pqCb)
      }
    }
  }

  /** The index-row projection every write path shares: coarse-list
    * assignment with the stored centroids, plus — when the index carries
    * a PQ codebook — the vector's `m` quantization codes
    * ([[Similarity.pqEncode]] with the PERSISTED codebook, so
    * incrementally-maintained codes can never drift from build-time
    * ones). `-U/-D` rows encode too (their OLD vector — changelog image
    * FULL guarantees it), which keys the delete to the right list.
    */
  private def indexRows(src: DataFrame, cents: Array[(Int, Seq[Double])],
      pq: Option[Array[Array[Array[Double]]]], offset: org.apache.spark.sql.Column,
      delete: org.apache.spark.sql.Column): DataFrame = {
    val enc = pq.map(cb => Similarity.pqEncode(src, idCol, vecCol, cb))
      .getOrElse(src)
    enc.select(Seq(
      listOf(col(vecCol), cents).as(VectorIndex.ListCol),
      col(idCol), col(vecCol)) ++
      pq.map(_ => col("__code").as(VectorIndex.CodeCol)).toSeq ++ Seq(
      offset.as(SecondaryIndex.SourceOffsetCol),
      delete.as("__delete")): _*)
  }

  private def rebuildFromState(cents: Array[(Int, Seq[Double])],
      epoch: Long, pq: Option[Array[Array[Array[Double]]]]): Unit = {
    idx.truncate()
    val v = table.latestVersion.getOrElse(0L)
    if (v > 0L) {
      idx.upsertMixed(indexRows(table.scan(), cents, pq,
          offset = lit(0L), delete = lit(false)),
        orderBy = Seq(col(SecondaryIndex.SourceOffsetCol)))
    }
    writeMeta(cents, v, epoch, pq)
  }

  /** ANN top-k through the index: rank the stored centroids by query
    * cosine, probe the nearest `nprobe` lists (a PARTITION-PRUNED scan of
    * the index table — nprobe/nlist of the data), exact cosine re-rank
    * inside them. Stale indexes refuse (same posture as
    * [[SecondaryIndex]]: stale ANN results are silent wrong answers).
    */
  def topK(query: Seq[Double], k: Int, nprobe: Int): DataFrame = {
    val (cents, version, epoch, _) = readMeta()
    requireFresh(version, epoch)
    Similarity.ivfTopK(idx.scan().withColumnRenamed(
        VectorIndex.ListCol, "__list"),
      cents, idCol, vecCol, query, k, nprobe)
  }

  private def requireFresh(version: Long, epoch: Long): Unit = {
    require(epoch == table.rollbackEpoch,
      s"vector index at ${idx.path} predates a base-table restore — " +
        "call refresh() to rebuild")
    val latest = table.latestVersion.getOrElse(0L)
    require(version == latest,
      s"vector index at ${idx.path} reflects base version $version but " +
        s"the table is at $latest — call refresh() first")
  }

  /** ANN top-k through the PQ codes (asymmetric distance computation):
    * the query builds the m×ksub LUT once on the driver
    * ([[Similarity.adcLut]] against the PERSISTED codebook), a
    * partition-pruned scan of the `nprobe` nearest lists ranks rows by
    * m array lookups over the STORED code column — the raw vector
    * column is never read in this pass — and the top-`cand` candidate
    * ids are exactly re-ranked by a second pruned scan that reads
    * vectors for ONLY those ids. At 100 TB the first pass touches
    * nprobe/nlist of an m-bytes-per-vector column (the index that fits
    * the page cache); the exact pass reads `cand` rows. Past
    * m·ksub=`broadcastThreshold` the LUT rides a broadcast variable
    * instead of codegen literals (the [[Similarity.pqTopK]] convention),
    * keeping plan size constant in codebook size.
    */
  def topKAdc(query: Seq[Double], k: Int, nprobe: Int, cand: Int = 50,
      broadcastThreshold: Int = 512): DataFrame = {
    val (cents, version, epoch, pqCb) = readMeta()
    requireFresh(version, epoch)
    val cb = pqCb.getOrElse(throw new IllegalStateException(
      s"vector index at ${idx.path} has no PQ codebook — create it with " +
        "pq = Some((m, ksub)) to enable ADC probes"))
    require(cand >= k, s"cand=$cand must be >= k=$k")
    val probeLists = Similarity.probeListsFor(cents, query, nprobe)
      .toIndexedSeq
    val lut = Similarity.adcLut(cb, query)
    val m = cb.length
    val codes = idx.scan()
      .filter(col(VectorIndex.ListCol).isin(probeLists: _*))
    var bcLut: Option[org.apache.spark.broadcast.Broadcast[
      Array[Array[Double]]]] = None
    val scored =
      if (m * cb(0).length <= broadcastThreshold) {
        val adc = (0 until m).map { j =>
          element_at(typedlit(lut(j)), col(VectorIndex.CodeCol)(j) + 1)
        }.reduce(_ + _)
        codes.select(col(idCol), adc.as("__adc"))
      } else {
        val bc = idx.sparkSession.sparkContext.broadcast(lut.map(_.toArray))
        bcLut = Some(bc)
        val adcOf = udf { (code: Seq[Int]) =>
          val l = bc.value
          var acc = 0.0; var j = 0
          while (j < code.length) { acc += l(j)(code(j)); j += 1 }
          acc
        }
        codes.select(col(idCol), adcOf(col(VectorIndex.CodeCol)).as("__adc"))
      }
    // bounded by construction: `cand` ids (default 50) reach the driver.
    // The collect is the broadcast's ONLY consumer — destroy it after,
    // or a long-lived session leaks one LUT per ADC query
    val ids =
      try scored.orderBy(col("__adc").asc, col(idCol)).limit(cand)
        .select(col(idCol)).collect().map(_.get(0)).toIndexedSeq
      finally bcLut.foreach(_.destroy())
    val qn = math.sqrt(query.map(x => x * x).sum)
    val v = col(vecCol).cast("array<double>")
    idx.scan()
      .filter(col(VectorIndex.ListCol).isin(probeLists: _*) &&
        col(idCol).isin(ids: _*))
      .select(col(idCol),
        (Similarity.dot(v, typedlit(query)) /
          (Similarity.l2norm(v) * lit(qn))).as("__cos"))
      .orderBy(col("__cos").desc, col(idCol))
      .limit(k)
      .select(col(idCol))
  }
}

object VectorIndex {

  /** The coarse-list partition column of the index table. No leading
    * underscore: `_`-prefixed partition DIRECTORIES are hidden from
    * Spark's file listing, which would silently empty every probe.
    */
  val ListCol = "ivf_list"

  /** The stored PQ-code column (`array<int>`, m entries): what an ADC
    * probe scans instead of the raw vectors. Present only on indexes
    * created with `pq = Some((m, ksub))`.
    */
  val CodeCol = "__pq_code"

  /** Create and build an IVF index on `table.vecCol` as `db.name` with
    * `nlist` coarse lists. Centroids come from the base table's CURRENT
    * state via the deterministic first-`nlist`-by-id rule
    * ([[Similarity.ivfAssign]] — oracle-replayable); pass
    * `kmeans = true` for spherical k-means centroids
    * ([[Similarity.ivfAssignKMeans]] — balanced lists on skewed data,
    * centroid coordinates deterministic up to float summation order).
    */
  def create(catalog: Catalog, db: String, name: String, table: GraftTable,
      idCol: String, vecCol: String, nlist: Int,
      kmeans: Boolean = false, pq: Option[(Int, Int)] = None): VectorIndex = {
    require(table.desc.isPrimaryKeyTable, "vector index requires a PK base table")
    require(table.desc.primaryKey == Seq(idCol),
      s"vector index expects the single-column PK $idCol")
    require(table.desc.schema.fieldNames.contains(vecCol),
      s"vector column $vecCol not in base schema")
    pq.foreach { case (m, ksub) =>
      require(m >= 1 && ksub >= 1,
        s"pq requires m >= 1 subspaces and ksub >= 1 centroids, got ($m, $ksub)")
    }
    // incremental maintenance deletes old (list, id) entries via the
    // changelog's -U/-D rows; a WAL-image table suppresses -U, so a
    // vector moving lists would leave its stale entry behind — refuse
    require(table.desc.changelogImage == ChangelogImage.Full,
      "vector index requires changelog image FULL (WAL images drop the " +
        "-U before-rows incremental maintenance deletes old entries with)")
    // validate everything BEFORE registering the index table: a failure
    // here must not leave an orphaned empty table blocking the retry
    val state = table.scan()
    val cents =
      if (kmeans)
        Similarity.ivfAssignKMeans(state, idCol, vecCol, nlist)._2
      else Similarity.firstNCentroids(state, idCol, vecCol, nlist)
    require(cents.length >= nlist,
      s"vector index needs >= $nlist rows, got ${cents.length}")
    // the PQ codebook — like the coarse centroids — comes from the
    // current state via the deterministic first-ksub-by-id rule
    // (Similarity.pqCodebook) and then PERSISTS: refresh encodes new
    // vectors with the stored codebook, never a recomputed one
    val codebook = pq.map { case (m, ksub) =>
      Similarity.pqCodebook(state, idCol, vecCol, m, ksub)
    }
    val fields = Seq(StructField(ListCol, IntegerType, nullable = false),
      table.desc.schema(idCol), table.desc.schema(vecCol)) ++
      codebook.map(_ => StructField(CodeCol, ArrayType(IntegerType))).toSeq ++ Seq(
      StructField(SecondaryIndex.SourceOffsetCol,
        org.apache.spark.sql.types.LongType))
    val desc = TableDescriptor(StructType(fields.toArray),
      primaryKey = Seq(ListCol, idCol),
      partitionKeys = Seq(ListCol),
      numBuckets = table.desc.numBuckets,
      // registration: a maintenance tick discovers this index from the
      // base table alone (IndexMaintenance.indexesOf) and keeps it fresh
      properties = Map(
        "index.kind" -> "vector",
        "index.base.path" -> table.path,
        "index.id.column" -> idCol,
        "index.vector.column" -> vecCol))
    val idx = catalog.createTable(db, name, desc)
    val vi = new VectorIndex(table, idCol, vecCol, idx)
    vi.writeMeta(cents, 0L, table.rollbackEpoch, codebook)
    vi.rebuildFromState(cents, table.rollbackEpoch, codebook)
    vi
  }

  /** Reopen an existing vector index as a handle. */
  def open(table: GraftTable, idCol: String, vecCol: String,
      idx: GraftTable): VectorIndex =
    new VectorIndex(table, idCol, vecCol, idx)
}
