package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Catalog, GraftTable, TableDescriptor}

/** Dedup-at-ingest: near-duplicate filtering of INCREMENTAL batches
  * against everything already accepted, without ever re-running the
  * corpus-wide pairwise job.
  *
  * The state is a persisted MinHash band index — an engine table of
  * (band, bucket, id) rows, exactly the 24-byte banding rows the batch
  * near-dup jobs shuffle ([[Dedup.minhashLshVerifiedPairs]]), kept
  * across batches instead of recomputed. Ingest of a batch:
  *
  *  1. shingle + sign the batch (one pass, the d3 kernels);
  *  2. candidates vs the PAST: the batch's band rows probe the index —
  *     the batch side is micro-batch-sized, so Catalyst broadcasts it,
  *     and the index side is BUCKET-PRUNED to the (band, bucket) dirs
  *     the batch hashes to ([[graft.core.GraftTable.scanPrunedToKeys]]):
  *     per-batch probe IO follows the batch's bucket set, never the
  *     corpus-wide index size — the reference's lookup-side posture
  *     (PrefixKeyLookuper.java:49, a probe reads the buckets it routes
  *     to, not the table);
  *  3. candidates WITHIN the batch: the ordinary LSH pipeline on the
  *     batch alone (in-batch copies must not both be accepted);
  *  4. exact-Jaccard verification of both candidate sets (the
  *     [[Dedup.verifyJaccard]] contract — banding only ever bounds the
  *     candidate set, the answer is exact);
  *  5. novel rows are appended to the corpus table and their band rows
  *     to the index, so the NEXT batch sees them — both appends ride the
  *     engine's atomic commit protocol.
  *
  * This is the streaming complement of the batch dedup family: d1–d6
  * answer "dedup this corpus once", this answers "keep it deduplicated
  * as it grows".
  */
final class MinHashIngestIndex(val corpus: GraftTable, val index: GraftTable,
    idCol: String, textCol: String,
    numHashes: Int = 60, bands: Int = 20, shingleN: Int = 5,
    seed: Long = 42L) {

  require(numHashes % bands == 0, "bands must divide numHashes")
  private val rowsPerBand = numHashes / bands

  /** (band, bucket, id) rows for a document set — identical banding to
    * [[Dedup.minhashLshVerifiedPairs]] (same slice hash, same seed), so
    * index probes see exactly the collisions the batch job would.
    */
  def bandRows(docs: DataFrame): DataFrame =
    bandRowsFromSigs(Dedup.minhashSignaturesFromDocs(
      Dedup.hashedShingleDocs(
        docs.select(col(idCol), col(textCol)), idCol, textCol, shingleN),
      numHashes, seed))

  /** Same banding over PRE-BUILT signatures — [[ingest]] computes
    * shingles and signatures once and feeds every stage from them (a
    * prior version re-shingled and re-signed the batch inside each
    * stage, tripling the per-batch CPU).
    */
  private def bandRowsFromSigs(sigs: DataFrame): DataFrame =
    Dedup.bandBuckets(sigs, numHashes, bands)
      .select(col("band"), col("bucket"), col("id").as(idCol))

  /** Ingest one batch: returns the NOVEL rows (batch schema) after
    * appending them to the corpus and indexing their band rows. A batch
    * row is dropped when it near-dup-matches an accepted document
    * (exact Jaccard ≥ threshold) or a LOWER-id row of the same batch.
    *
    * Size contract: `batch` is assumed MICRO-BATCH-sized (the streaming
    * complement posture — [[ingestStream]] feeds trigger-sized batches).
    * The fast path broadcasts batch-derived tables (ids, band rows,
    * signatures) past the conservative post-checkpoint size stats; a
    * caller-supplied batch above [[MinHashIngestIndex.MaxBroadcastBatchRows]]
    * rows falls back to stats-based join planning instead of risking the
    * 8 GB broadcast cap / driver memory (the guard is a cheap count over
    * the checkpointed batch, not a second source scan).
    */
  def ingest(batch: DataFrame, threshold: Double): DataFrame = {
    val sc = batch.sparkSession.sparkContext
    // stage labels (guide §1.5): the ingest is a multi-job pipeline, and
    // unlabeled jobs make its profile unreadable
    def staged[T](label: String)(body: => T): T = {
      sc.setJobDescription(s"d11 ingest: $label")
      try body finally sc.setJobDescription(null)
    }
    // drop batch ids already accepted: a re-ingested id is a duplicate by
    // definition, and letting it through would put two rows of the same
    // id into the verifyJaccard docs union, skewing shingle-set sizes.
    // The corpus is append-only (this class only ever append()s novel
    // rows) and bucketed on the id, so the guard reads ONLY the bucket
    // dirs the batch's ids hash to (scanPrunedToKeys — O(batch buckets)
    // IO, not O(corpus)), broadcast-probed by the micro-batch.
    val resent = staged("resent guard") {
      corpus.scanPrunedToKeys(batch.select(col(idCol)))
        .select(col(idCol))
        .join(broadcast(batch.select(col(idCol))), Seq(idCol), "left_semi")
    }
    // ONE eager materialization per batch carrying the fresh rows PLUS
    // their shingle hashes and minhash signature (identical kernels/seed
    // to the batch dedup family): a prior shape checkpointed fresh,
    // shingled and sigs separately — three jobs re-walking the same
    // micro-batch; every downstream view (fresh rows, shingle table,
    // signature table, band rows) is now a projection of this one cached
    // table, so the expensive scalar kernels run exactly once
    val (hashA, hashB) = graft.functions.MinHashSig.params(numHashes, seed)
    val enriched = staged("shingle+sign batch") {
      TextAnalysis.widen(
          batch.join(broadcast(resent), Seq(idCol), "left_anti"))
        .withColumn("__gs",
          graft.functions.VectorExprs.shingleHashes(col(textCol), shingleN))
        .withColumn("__sig", graft.functions.VectorExprs.minhashSig(
          col("__gs"), hashA, hashB, graft.functions.MinHashSig.P))
        .localCheckpoint()
    }
    // micro-batch guard for the explicit broadcasts below (see the method
    // contract): one cheap count over the checkpointed blocks decides
    // whether batch-derived tables may be broadcast — a too-large batch
    // degrades to stats-based planning instead of a broadcast hard-fail
    val batchRows = staged("batch count")(enriched.count())
    def bcastIfSmall(df: DataFrame): DataFrame =
      if (batchRows <= MinHashIngestIndex.MaxBroadcastBatchRows) broadcast(df)
      else df
    val fresh = enriched.select(batch.columns.map(col).toIndexedSeq: _*)
    val shingled = enriched.select(col(idCol).as("id"), col("__gs").as("gs"))
      .withColumn("sz", size(col("gs")))
    val sigs = enriched.select(col(idCol).as("id"), col("__sig").as("sig"))
      .filter(col("sig").isNotNull)
    // NOTE (measured, round 16): narrowing the ingest's shuffles to the
    // micro-batch row count (the connectedComponents treatment) was
    // tried and REVERTED — the verify stage is compute-bound (candidate
    // pairs × signature/shingle array work), not scheduling-bound:
    // 1-partition shuffles serialized it onto one core (7.7 s → 15 s per
    // profile). The session width + AQE coalescing is the right sizing.
    // band rows derive lazily from the checkpointed signatures: each of
    // the three consumers (index probe, in-batch banding, novel-row index
    // entries) re-runs only the cheap per-row band slicing over cached
    // data — no fourth materialization job
    val probes = bandRowsFromSigs(sigs)
    // the index is bucketed on (band, bucket): the probe reads only the
    // bucket dirs the batch's band rows hash to — per-batch IO follows
    // the BATCH's bucket set, never the corpus-wide index size
    val candPast = staged("index probe") {
      bcastIfSmall(probes.withColumnRenamed(idCol, "a_id"))
        .join(index.scanPrunedToKeys(probes.select(col("band"), col("bucket")))
            .withColumnRenamed(idCol, "b_id"),
          Seq("band", "bucket"))
        .select(col("a_id"), col("b_id")).distinct()
        // pinned: consumed three ways below (candidate-id bucket set, the
        // past-doc fetch, the verify join) — without it each consumer
        // re-runs the probe join
        .localCheckpoint()
    }
    // fetching candidate texts is a point-read too: prune the corpus to
    // the candidates' id buckets before the equi-join. Labeled: the
    // bucket pre-pass inside scanPrunedToKeys runs eager jobs at
    // CONSTRUCTION time, which otherwise show up unattributed.
    val pastDocs = staged("past fetch") {
      val pastIds = candPast.select(col("b_id").as(idCol)).distinct()
      corpus.scanPrunedToKeys(pastIds)
        .join(broadcast(pastIds), Seq(idCol))
    }
    val pastShingled = Dedup.hashedShingleDocs(
      pastDocs.select(col(idCol), col(textCol)), idCol, textCol, shingleN)
    // two-table verify: candPast's a-side ids are strictly THIS batch
    // (the resent guard removed re-sent accepted ids) and its b-side ids
    // strictly the accepted past — resolving each side against its own
    // shingle table halves both join inputs and computes pastShingled
    // (a pruned corpus read + shingle kernel) once, not once per side.
    // The batch-side shingle table is broadcast under the micro-batch
    // contract (its localCheckpoint parent reports conservative stats);
    // the past side is corpus-derived, so its strategy is left to the
    // planner/AQE.
    val dupVsPast = Dedup.verifyJaccardAcross(candPast,
        bcastIfSmall(shingled), pastShingled, threshold)
      .select(col("a_id").as("__dup"))
    // --- within the batch (keep the lowest id of each dup group) ---
    // same banding + signature prescreen + exact verify as
    // Dedup.minhashLshVerifiedPairs, built from the SHARED probes/sigs
    // instead of re-signing the batch
    val candIn = bcastIfSmall(probes.select(col("band"), col("bucket"),
        col(idCol).as("a_id")))
      .join(probes.select(col("band"), col("bucket"), col(idCol).as("b_id")),
        Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      // explicit broadcasts: the signature table is batch-derived (the
      // micro-batch contract that already broadcasts resent/probes/
      // pastIds), but it hangs off a localCheckpoint whose conservative
      // size stats would otherwise shuffle the full candidate stream
      // through a sort-merge join. Size-guarded (method contract): an
      // over-large caller batch degrades to stats-based planning.
      .join(bcastIfSmall(sigs.select(col("id").as("a_id"), col("sig").as("a_sig"))),
        Seq("a_id"))
      .join(bcastIfSmall(sigs.select(col("id").as("b_id"), col("sig").as("b_sig"))),
        Seq("b_id"))
      .filter(Dedup.sigAgreement(col("a_sig"), col("b_sig"), numHashes)
        >= threshold - Dedup.DefaultEstMargin)
      .select(col("a_id"), col("b_id"))
    val dupInBatch = Dedup.verifyJaccard(candIn, bcastIfSmall(shingled), threshold)
      .select(col("b_id").as("__dup")) // b_id > a_id by construction
    val novel = staged("verify + novel") {
      fresh.join(
        dupVsPast.unionByName(dupInBatch).distinct()
          .withColumnRenamed("__dup", idCol),
        Seq(idCol), "left_anti")
        .localCheckpoint() // pin: the appends below must see ONE snapshot
    }
    // index FIRST: the two appends are separate atomic commits, and a
    // crash between them must err on the harmless side. An orphan index
    // row (banded but not in the corpus) only creates candidates that
    // fail exact-Jaccard verification; the reverse order would admit
    // every later duplicate of an un-indexed accepted document forever.
    staged("index append") {
      index.append(probes.join(novel.select(col(idCol)), Seq(idCol), "left_semi")
        .select(col("band"), col("bucket"), col(idCol)))
    }
    staged("corpus append") { corpus.append(novel) }
    novel
  }

  /** The STREAMING form: keep the corpus deduplicated as documents
    * arrive — each micro-batch runs [[ingest]] inside `foreachBatch`,
    * so batch boundaries are the dedup boundaries (in-batch lower-id
    * rule within a trigger, index-probe rule across triggers). Replay
    * after a crash is IDEMPOTENT: re-ingested accepted ids drop at the
    * resent guard, re-evaluated dropped rows drop again (the decision
    * is deterministic), and a batch replayed after its index append but
    * before its corpus append re-accepts the same rows — its orphan
    * band rows only ever create candidates that fail exact
    * verification, and the probe distinct collapses the duplicates.
    */
  def ingestStream(docs: DataFrame, threshold: Double,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingest(batch, threshold)
        ()
      }
      .start()
}

object MinHashIngestIndex {

  /** Largest batch (rows) the ingest fast path will broadcast. A
    * signature row is ~600 B framed (id + 60 longs), so 500 k rows keep
    * every batch-derived broadcast well under the driver-memory comfort
    * zone and far from Spark's 8 GB broadcast cap; above it, [[MinHash
    * IngestIndex.ingest]] lets the planner pick join strategies from
    * stats instead.
    */
  val MaxBroadcastBatchRows: Long = 500000L

  /** Create the index table beside an existing corpus table and backfill
    * it from the corpus's current rows.
    */
  def create(cat: Catalog, db: String, name: String, corpus: GraftTable,
      idCol: String, textCol: String, numHashes: Int = 60, bands: Int = 20,
      shingleN: Int = 5, seed: Long = 42L): MinHashIngestIndex = {
    val idType = corpus.desc.schema(idCol).dataType
    val index = cat.createTable(db, name, TableDescriptor(
      StructType(Seq(
        StructField("band", IntegerType, nullable = false),
        StructField("bucket", LongType, nullable = false),
        StructField(idCol, idType, nullable = false))),
      bucketKeys = Seq("band", "bucket"),
      numBuckets = corpus.desc.numBuckets))
    val mi = new MinHashIngestIndex(corpus, index, idCol, textCol,
      numHashes, bands, shingleN, seed)
    val existing = corpus.scan().select(col(idCol), col(textCol))
    if (!existing.isEmpty) index.append(mi.bandRows(existing))
    mi
  }

  /** Open an existing index (parameters must match the create call). */
  def open(corpus: GraftTable, index: GraftTable, idCol: String,
      textCol: String, numHashes: Int = 60, bands: Int = 20,
      shingleN: Int = 5, seed: Long = 42L): MinHashIngestIndex =
    new MinHashIngestIndex(corpus, index, idCol, textCol, numHashes, bands,
      shingleN, seed)
}
