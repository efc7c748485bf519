package graft.pipeline

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, GraftColumn, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{BpeEncodeWord, BpeMergePair}

/** BPE tokenizer induction over a corpus (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016) —
  * the step that LEARNS the vocabulary a training pipeline's token
  * counts and shard budgets are denominated in.
  *
  * Scale shape: everything iterates over the (word, freq) table — the
  * corpus collapsed to its distinct whitespace words (one shuffle,
  * vocab-sized: millions of rows where the corpus has billions of
  * documents). Each merge step is a pair-count aggregate (explode of
  * adjacent symbol pairs, map-side combined, weighted by word freq)
  * followed by a 1-row argmax to the driver and a per-row merge kernel —
  * so `numMerges` small distributed jobs, never a corpus-scale pass. In
  * production the trainer runs on a deterministic sample
  * ([[Sampling.deterministicSample]]) exactly like single-node tokenizer
  * trainers do; what matters at 100 TB is that nothing here is O(corpus)
  * per merge.
  *
  * Determinism: pair counts are exact longs; the argmax breaks ties by
  * (left, right) lexicographic order — the same merge table on any
  * engine, partitioning or retry.
  */
object Bpe {

  /** (word, freq) over lowercased whitespace tokens. */
  def wordFreqs(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` greedy merges; returns (rank, left, right,
    * pair_count), rank 0 first. Stops early when the best remaining
    * pair's corpus count falls below `minPairCount`.
    *
    * The distributed loop applies up to `batchMerges` merges per round
    * (one pair-count aggregate + one vocab rewrite per ROUND instead of
    * per merge — at a 32k-merge vocabulary this is the difference between
    * ~2k and ~64k driver-coordinated jobs). Batching is greedy-EXACT, not
    * approximate: a round selects the longest prefix of the
    * (count desc, l, r)-sorted pair list whose pairs are pairwise
    * symbol-disjoint (so applying earlier ones cannot change later ones'
    * counts) and whose every count strictly exceeds the best count any
    * applied merge could CREATE or GROW (new pairs are bounded by the max
    * collected count sharing a symbol with a selected pair; pairs whose
    * symbol string ALIASES a created l+r concatenation can additionally
    * grow by that amount — both folded into the bound, floored by the
    * collect cutoff when the list was truncated) — so sequential greedy,
    * tie-breaks included, would pick exactly this sequence. Equivalence
    * with the reference loop is pinned by BpeSpec.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L,
      driverVocabLimit: Long = 200000L,
      batchMerges: Int = 32): DataFrame = {
    require(numMerges >= 0, s"numMerges $numMerges must be non-negative")
    require(batchMerges >= 1, s"batchMerges $batchMerges must be positive")
    val spark = df.sparkSession
    val freqs = wordFreqs(df, textCol)
    // The iterative loop's data is the DISTINCT-WORD table, which is
    // tiny relative to any corpus (every single-node tokenizer trainer
    // exploits this). When it fits the driver, run the loop locally —
    // one aggregate job total instead of 2·numMerges; the distributed
    // loop below is the exact same algorithm (same tie-breaks — the
    // equivalence is pinned by BpeSpec) and takes over past the limit.
    val vocabSize = freqs.count()
    if (vocabSize <= driverVocabLimit)
      return localTrain(spark,
        freqs.collect().map(r => r.getString(0) -> r.getLong(1)),
        numMerges, minPairCount)
    // vocab table: word split to unicode-char symbols, corpus frequency
    var words = freqs
      .select(split(col("word"), "").as("syms"), col("freq"))
      .localCheckpoint()
    val merges = ArrayBuffer[(String, String, Long)]()
    var stop = false
    while (!stop && merges.length < numMerges) {
      val want = math.min(batchMerges, numMerges - merges.length)
      val m = want * 4 + 8
      val top = adjacentPairCounts(words)
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(m).collect()
      // truncated list: pairs below the cutoff can count at most the
      // last collected value; complete list: no floor at all
      val floor = if (top.length < m) Long.MinValue else top.last.getLong(2)
      val batch = selectDisjointPrefix(top, want, floor, minPairCount)
      if (batch.isEmpty) stop = true
      else {
        merges ++= batch
        // ONE pass applies the whole batch in rank order (sequential
        // semantics by construction); checkpoint keeps the lineage flat
        // across rounds (else plan depth grows per round)
        val applied = batch.foldLeft(GraftColumn.expressionOf(col("syms"))) {
          case (e, (l, r, _)) => BpeMergePair(e, l, r)
        }
        words = words.select(GraftColumn.of(applied).as("syms"), col("freq"))
          .localCheckpoint()
      }
    }
    mergesDf(spark, merges)
  }

  /** The longest greedy-safe batch: a PREFIX of the sorted pair list
    * (stopping at the first conflict, never skipping — prefix-ness is
    * what makes the equivalence proof go through), pairwise
    * symbol-disjoint, every count strictly above the created-pair bound.
    */
  private def selectDisjointPrefix(top: Array[Row], want: Int, floor: Long,
      minPairCount: Long): Seq[(String, String, Long)] = {
    val selected = ArrayBuffer[(String, String, Long)]()
    val used = scala.collection.mutable.Set[String]()
    // max count a merge applied so far could hand a NEWLY created pair:
    // a new pair (x, l+r) / (l+r, y) occurs only where the pre-merge pair
    // (x, l) / (r, y) occurred, so its count is bounded by the best
    // collected count sharing a symbol with the applied pair (or the
    // collect floor for pairs below the cutoff)
    var createdBound = Long.MinValue
    var i = 0
    var halt = false
    while (!halt && i < top.length && selected.length < want) {
      val l = top(i).getString(0); val r = top(i).getString(1)
      val c = top(i).getLong(2)
      if (c < minPairCount) halt = true
      // `used(l + r)`: the candidate's created string collides with a
      // symbol or created string of an earlier selection — two same-string
      // creators in one batch would compound their alias growth past any
      // single pair's bound, so stop the prefix there
      else if (selected.nonEmpty &&
          (used(l) || used(r) || used(l + r) || c <= createdBound)) halt = true
      else {
        // `share` bounds occurrences of BRAND-NEW pairs the merge creates
        // ((x,l+r) occurs only where (x,l) did). `alias` covers the
        // symbol-string ALIASING hole: if l+r equals an EXISTING vocab
        // symbol (reachable by another merge route, e.g. "abc" via
        // ('a','bc') earlier and ('ab','c') now), new occurrences merge
        // under that string and counts of collected pairs involving it
        // can INCREASE mid-batch — bounded by (stale collected count,
        // or the collect floor when truncated) + share.
        val createdSym = l + r
        var share = floor
        var alias = floor
        var j = 0
        while (j < top.length) {
          if (j != i) {
            val jl = top(j).getString(0); val jr = top(j).getString(1)
            if (jl == l || jl == r || jr == l || jr == r)
              share = math.max(share, top(j).getLong(2))
            if (jl == createdSym || jr == createdSym)
              alias = math.max(alias, top(j).getLong(2))
          }
          j += 1
        }
        // share == MinValue ⇒ nothing ever borders (l, r) ⇒ the merge
        // creates no new adjacent pairs ⇒ aliasing can't move any count
        val bound =
          if (share == Long.MinValue) Long.MinValue
          else if (alias == Long.MinValue) share
          else share + alias
        selected += ((l, r, c))
        used += l; used += r; used += createdSym
        createdBound = math.max(createdBound, bound)
      }
      i += 1
    }
    selected.toSeq
  }

  /** The same greedy loop on a collected vocabulary (small-vocab fast
    * path of [[train]]) — identical counts and tie-breaks.
    */
  private def localTrain(spark: org.apache.spark.sql.SparkSession,
      wordFreq: Array[(String, Long)], numMerges: Int,
      minPairCount: Long): DataFrame = {
    // code-point split — matches the distributed `split(word, "")`,
    // which never breaks a surrogate pair
    var vocab: Map[List[String], Long] = wordFreq.toSeq
      .map { case (w, f) =>
        w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toList -> f
      }
      .groupBy(_._1).map { case (s, fs) => s -> fs.map(_._2).sum }
    val merges = ArrayBuffer[(String, String, Long)]()
    var stop = false
    while (!stop && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts.update(p, counts.getOrElse(p, 0L) + f)
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minPairCount) stop = true
        else {
          merges += ((l, r, c))
          vocab = vocab.toSeq.map { case (syms, f) =>
            val out = ArrayBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += (l + r); i += 2
              } else { out += syms(i); i += 1 }
            }
            out.toList -> f
          }.groupBy(_._1).map { case (s, fs) => s -> fs.map(_._2).sum }
        }
      }
    }
    mergesDf(spark, merges)
  }

  private def mergesDf(spark: org.apache.spark.sql.SparkSession,
      merges: ArrayBuffer[(String, String, Long)]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(merges.zipWithIndex.map {
        case ((l, r, c), i) => Row(i, l, r, c)
      }.toArray: _*),
      StructType(Seq(
        StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false),
        StructField("pair_count", LongType, nullable = false))))

  /** Weighted adjacent-pair counts over the (syms, freq) vocab table. */
  private def adjacentPairCounts(words: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = when(size(syms) < 2,
        array().cast("array<struct<l:string,r:string>>"))
      .otherwise(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("l"), b.as("r"))))
    words.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Segment every element of an array<string> token column with a
    * learned merge list (rank order = list order); returns
    * array<array<string>> of per-token subwords.
    */
  def encodeTokens(tokens: Column, merges: Seq[(String, String)]): Column =
    transform(tokens, w =>
      GraftColumn.of(BpeEncodeWord(GraftColumn.expressionOf(w), merges)))

  /** Per-document subword statistics under a learned merge table:
    * (idCol, n_tokens, n_subwords, compression) — the "how many training
    * tokens is this corpus" question answered with the REAL tokenizer
    * instead of the whitespace proxy. `merges` is the collected result
    * of [[train]] (numMerges rows — driver-sized by construction).
    */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // empty/whitespace-only text splits to [""] — filter it out so such
    // docs count 0 tokens (consistent with [[wordFreqs]]) instead of 1
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => t =!= "")
    val subs = encodeTokens(toks, merges)
    df.select(col(idCol),
        size(toks).cast("long").as("n_tokens"),
        aggregate(subs, lit(0L), (acc, a) => acc + size(a)).as("n_subwords"))
      .withColumn("compression",
        when(col("n_tokens") > 0,
          col("n_subwords").cast("double") / col("n_tokens").cast("double")))
  }
}
