package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws from an RNG, so the selected set changes with
  * partitioning, retries and engine version — unusable for reproducible
  * corpus construction or cross-engine verification. These samplers
  * decide membership from a cryptographic hash of a stable id instead:
  * the same row is in or out everywhere, forever, with no seed
  * coordination across executors and no shuffle. At 100 TB this is a
  * pure map-side filter that combines with column pruning and predicate
  * pushdown like any other filter.
  */
object Sampling {

  /** First 16 bits of md5(id) as a 4-hex-digit string — uniform on
    * [0, 0x10000). Lexicographic order on the fixed-width lowercase hex
    * equals numeric order, so any engine with md5 reproduces the sample.
    */
  private def hashFrac(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 4)

  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate $rate outside [0,1]")
    val n = math.round(rate * 65536).toInt
    // comparisons are lexicographic on fixed-width strings, so rate 1.0
    // needs a sentinel ABOVE the hex alphabet ("10000" would sort below
    // "2av3"-style hashes, not above)
    if (n >= 65536) "g" else f"$n%04x"
  }

  /** Bernoulli(rate) sample, deterministic in `idCol`. */
  def deterministicSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashFrac(col(idCol)) < lit(thresholdHex(rate)))

  /** Stratified sample: per-stratum keep rates (data mixing — e.g.
    * upweight low-resource languages by sampling high-resource ones
    * down), strata absent from `rates` fall back to `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdHex(defaultRate))) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(hashFrac(col(idCol)) < thr)
  }

  /** Epoch-style domain upsampling — the complement of the keep-rate
    * samplers: a repeat factor λ >= 0 per domain, where each row appears
    * floor(λ) times plus one more with probability frac(λ) (decided by
    * the same deterministic md5 membership test, so the materialized mix
    * is reproducible everywhere). This is the "2.3 epochs of Wikipedia,
    * 0.5 epochs of CommonCrawl" step of a training-mix recipe. Output
    * carries a 0-based `copy` index so downstream shuffling/packing can
    * treat copies as distinct rows. Per-row arithmetic + a bounded
    * explode — no shuffle at any corpus size.
    */
  def upsampleDomains(df: DataFrame, idCol: String, domainCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0.0, s"rate $r must be non-negative"))
    def whole(r: Double) = math.floor(r).toLong
    def fracHex(r: Double) = thresholdHex(r - math.floor(r))
    val sorted = rates.toSeq.sortBy(_._1)
    val wholeCol = sorted.foldLeft(lit(whole(defaultRate))) {
      case (acc, (d, r)) => when(col(domainCol) === d, lit(whole(r))).otherwise(acc)
    }
    val thrCol = sorted.foldLeft(lit(fracHex(defaultRate))) {
      case (acc, (d, r)) => when(col(domainCol) === d, lit(fracHex(r))).otherwise(acc)
    }
    val nc = wholeCol +
      when(hashFrac(col(idCol)) < thrCol, lit(1L)).otherwise(lit(0L))
    df.withColumn("__nc", nc)
      .filter(col("__nc") > 0)
      // sequence(0, -1) would generate a DESCENDING range, so the filter
      // above must precede the explode
      .withColumn("copy", explode(sequence(lit(0L), col("__nc") - 1)))
      .drop("__nc")
  }

  /** Theta-sketch-style approximate distinct count: hash every value,
    * keep only hashes below a fixed threshold θ (a map-side filter — the
    * shuffle sees just the θ-fraction sample), count the distinct
    * sampled hashes exactly, and scale by 1/θ. Standard error is
    * ~1/sqrt(n_sampled), tunable via `rate`.
    *
    * Unlike HLL-family sketches (whose register layouts differ per
    * engine) this estimator is a pure deterministic function of the data
    * — the md5 membership test and the final division reproduce
    * bit-identically on any engine, so the ESTIMATE itself is
    * oracle-checkable. At 100 TB: scan-speed filter, then a distinct
    * aggregate over ~θ·N 32-char keys with map-side partial dedup.
    */
  def thetaDistinct(df: DataFrame, valueCol: String,
      rate: Double = 1.0 / 16): DataFrame = {
    val h = md5(col(valueCol).cast("string").cast("binary"))
    // quantized so the filter and the scale factor agree exactly
    val actualRate = math.round(rate * 65536).toDouble / 65536.0
    df.select(h.as("__h"))
      .filter(substring(col("__h"), 1, 4) < lit(thresholdHex(rate)))
      .agg(count_distinct(col("__h")).as("n_sampled"))
      .select(col("n_sampled"),
        (col("n_sampled").cast("double") / lit(actualRate)).as("est_distinct"))
  }

  /** Weight-proportional sample WITHOUT replacement, size exactly k —
    * Efraimidis–Spirakis A-ES: each row draws a deterministic uniform
    * u ∈ (0,1) from md5(id) and ranks by u^(1/w); the global top-k by
    * that key is a weighted sample without replacement (e.g. w =
    * document length for token-proportional corpus draws, or a quality
    * score for quality-tilted ones). Rows with w <= 0 are excluded.
    *
    * Scale: the key is per-row scan arithmetic; top-k is
    * TakeOrderedAndProject (per-partition heap + driver merge of k rows,
    * never a global sort). Deterministic in the ids — the same sample on
    * any engine, partitioning, or retry; u and pow() are IEEE-exact
    * replays (48 hash bits through conv(), exactly representable in a
    * double).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(math.pow(2.0, 48))
    df.filter(col(weightCol) > 0)
      .withColumn("__wkey", pow(u, lit(1.0) / col(weightCol).cast("double")))
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Temperature-based domain mixing (alpha = 0.5): per-domain keep rate
    * sqrt(c_min / c_domain), so the smallest domain is kept whole and
    * large domains are flattened toward it — the standard multilingual /
    * multi-source rebalancing move (cf. the sampling-temperature scheme
    * in multilingual LM training). Unlike [[stratifiedSample]] the rates
    * come from the data, not the caller, and the whole computation stays
    * in the plan: domain counts are a tiny aggregate broadcast back onto
    * the scan, membership is the same deterministic md5 test. The double
    * arithmetic is division + sqrt + one multiply — all IEEE-exact, so
    * any engine selects the identical set.
    */
  def temperatureMix(df: DataFrame, idCol: String, domainCol: String): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__c"))
    val rates = counts.crossJoin(counts.agg(min(col("__c")).as("__cmin")))
      .select(col(domainCol),
        sqrt(col("__cmin").cast("double") / col("__c").cast("double")).as("__rate"))
    // same membership hash as deterministicSample/stratifiedSample,
    // compared numerically because the threshold is data-derived
    val h = conv(hashFrac(col(idCol)), 16, 10).cast("long")
    df.join(broadcast(rates), Seq(domainCol))
      .filter(h < round(col("__rate") * lit(65536.0)))
      .select(col(idCol), col(domainCol))
  }

  /** Deterministic corpus shuffle: assign every row a global training
    * position by ordering on md5(id) — breaks source/crawl ordering (the
    * bias a sequential reader would otherwise train through) while being
    * bit-reproducible across engines, retries and cluster sizes, unlike
    * `orderBy(rand())`. Positions are dense 0..n-1.
    *
    * Scale: the semantics are a global sort + row_number, but a bare
    * `Window.orderBy` would pull the corpus through ONE task. Same
    * two-level scan as [[packTokenShards]]: range-partition on the hash
    * key (every partition's keys strictly below the next's), local
    * row_number per partition, driver-size prefix over per-partition
    * counts joined back. One range shuffle total.
    */
  def shufflePositions(df: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sparkContext.defaultParallelism
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("__skey"))
    // localCheckpoint before branching: spark_partition_id() is only
    // stable within one evaluation of the range shuffle (see
    // packTokenShards — two consumer stages may see different AQE
    // coalescing of the same exchange)
    val local = df.select(col(idCol))
      .withColumn("__skey", md5(col(idCol).cast("string").cast("binary")))
      .repartitionByRange(n, col("__skey"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .localCheckpoint()
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lrn")).as("__pcnt"))
      .withColumn("__off", coalesce(sum(col("__pcnt")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), (col("__off") + col("__lrn") - 1).as("position"))
  }

  /** Domain-BALANCED deterministic training order: like
    * [[shufflePositions]], but every domain is spread uniformly through
    * the global order instead of landing wherever its hashes fall — the
    * "interleave domains so no batch is all-web or all-code" data-order
    * rule. Doc ranked r of `cnt` in its domain (md5 order within domain)
    * gets stratum key r/(cnt+1) ∈ (0,1); the global order sorts by
    * (stratum, md5, id), so consecutive docs of one domain sit ~n/cnt
    * apart for ANY mix of domain sizes. Pure integer-derived arithmetic —
    * reproducible across engines, partitionings and retries.
    *
    * Scale: one keyed shuffle for the per-domain rank window, then the
    * same two-level scan as [[shufflePositions]] for global positions —
    * no single-task global window.
    */
  def balancedPositions(df: DataFrame, idCol: String,
      domainCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sparkContext.defaultParallelism
    val wDom = Window.partitionBy(col("__dom"))
      .orderBy(col("__skey"), col(idCol))
    val ranked = df.select(col(idCol), col(domainCol).as("__dom"))
      .withColumn("__skey", md5(col(idCol).cast("string").cast("binary")))
      .withColumn("__r", row_number().over(wDom).cast("double"))
      .withColumn("__cnt",
        count(lit(1)).over(Window.partitionBy(col("__dom"))).cast("double"))
      .withColumn("__frac", col("__r") / (col("__cnt") + 1.0))
    // two-level scan; localCheckpoint before the branch (packTokenShards
    // lesson: spark_partition_id() must not be recomputed per consumer)
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col("__frac"), col("__skey"), col(idCol))
    val local = ranked
      .repartitionByRange(n, col("__frac"), col("__skey"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .localCheckpoint()
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lrn")).as("__pcnt"))
      .withColumn("__off", coalesce(sum(col("__pcnt")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), col("__dom").as(domainCol),
        (col("__off") + col("__lrn") - 1).as("position"))
  }

  /** Token-budget shard packing: documents in `idCol` order are packed
    * into fixed-budget training shards — doc D goes to shard
    * floor(sum(tokens of docs before D) / budget). The semantics are a
    * global running sum, but a bare `Window.orderBy` would pull the whole
    * corpus through ONE task; instead the classic two-level scan:
    * range-repartition by id (partition i holds ids strictly below
    * partition i+1), local running sums per partition, then a driver-size
    * prefix over the per-partition totals (one row per partition) joined
    * back. Identical result, and every wide stage stays parallel at
    * 100 TB.
    */
  def packTokenShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be positive")
    withGlobalStart(df, idCol, tokensCol)
      .select(col(idCol), col(tokensCol),
        (col("__gstart") / budget).cast("long").as("shard"))
  }

  /** Materialize token-budget shards to disk: every row of `df` (ALL its
    * columns) lands in `outDir/shard=<k>/` with its shard assigned by
    * [[packTokenShards]] over (`idCol`, `tokensCol`) — the terminal step
    * that turns a selected corpus into the fixed-budget training shards
    * a loader consumes. One hive-partitioned parquet write: shard
    * directories are written in parallel, nothing data-scale touches the
    * driver. Returns the shard manifest (shard, n_docs, n_tokens) read
    * back from the written files — what a training job's data plane
    * checks before launch.
    */
  def writeTokenShards(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, outDir: String): DataFrame = {
    val assigned = packTokenShards(df.select(col(idCol), col(tokensCol)),
      idCol, tokensCol, budget).select(col(idCol), col("shard"))
    df.join(assigned, Seq(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("n_tokens"))
      .orderBy(col("shard"))
  }

  /** (idCol, tokensCol, __gstart): each row's global running-sum-before of
    * `tokensCol` in `idCol` order — the shared first stage of
    * [[packTokenShards]] and [[packSequences]]. Two-level scan: range-
    * repartition by id (partition i holds ids strictly below partition
    * i+1), local running sums per partition, then a driver-size prefix
    * over per-partition totals (one row per partition) joined back.
    *
    * `__pid` comes from spark_partition_id(), which is only stable within
    * a single evaluation of the range shuffle: two consumer stages may see
    * different AQE coalescing of the same exchange, in which case offsets
    * computed under one pid layout would join rows labeled under another.
    * So (pid, local cumsum) is materialized exactly ONCE — localCheckpoint
    * freezes the values before the plan branches — carrying only the two
    * columns the packing needs.
    */
  private def withGlobalStart(df: DataFrame, idCol: String,
      tokensCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sparkContext.defaultParallelism
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col(idCol))
    val local = df.select(col(idCol), col(tokensCol))
      .repartitionByRange(n, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum(col(tokensCol)).over(wLocal)) // inclusive
      .localCheckpoint()
    // per-partition totals: n rows, so the single-partition prefix window
    // is driver-scale work, not data-scale
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lcum")).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), Seq("__pid"))
      .select(col(idCol), col(tokensCol),
        (col("__off") + col("__lcum") - col(tokensCol)).as("__gstart"))
  }

  /** (selection core) Rows with `__cum` = running sum of `weight` in
    * global (`scoreCol` DESC, `idCol`) order and `__total` = the grand
    * total — the two-level scan again (range partition on the sort key,
    * local running sums, driver-size prefix joined back), so computing a
    * GLOBAL greedy order never funnels the corpus through one task. The
    * sort key ends in the unique id, so the global order is strict (no
    * tie straddles a partition boundary) and any engine reproduces it.
    */
  private def scoreOrderedCum(df: DataFrame, idCol: String, scoreCol: String,
      extraCols: Seq[String], weight: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sparkContext.defaultParallelism
    val ord = Seq(col(scoreCol).desc, col(idCol))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    // localCheckpoint before branching — see [[withGlobalStart]]
    val local = df.select((Seq(idCol, scoreCol) ++ extraCols).map(col): _*)
      .withColumn("__w", weight.cast("long"))
      .repartitionByRange(n, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lcum", sum(col("__w")).over(wLocal))
      .localCheckpoint()
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("__pid"))
      .agg(max(col("__lcum")).as("__ptot"))
      .withColumn("__off", coalesce(sum(col("__ptot")).over(wPrefix), lit(0L)))
    val total = offsets.agg(sum(col("__ptot")).as("__total"))
    local
      .join(broadcast(offsets.select(col("__pid"), col("__off"))), Seq("__pid"))
      .crossJoin(broadcast(total))
      .withColumn("__cum", col("__off") + col("__lcum"))
  }

  /** Keep the globally best `frac` of rows by `scoreCol` (ties broken by
    * `idCol`) — budget-constrained quality filtering, e.g. "train on the
    * top 10% of the corpus by quality score". Exactly
    * floor(frac · count) rows survive, the same set on any engine.
    */
  def selectTopFraction(df: DataFrame, idCol: String, scoreCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac $frac outside [0,1]")
    scoreOrderedCum(df, idCol, scoreCol, Nil, lit(1L))
      .filter(col("__cum") <= floor(lit(frac) * col("__total")))
      .select(col(idCol), col(scoreCol))
  }

  /** Fill a fixed token budget with the highest-scoring documents: docs in
    * global (`scoreCol` DESC, `idCol`) order are kept while the running
    * token total stays within `budget` — the greedy step that turns
    * per-doc quality scores into a training corpus of a target size.
    */
  def selectByTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget $budget must be non-negative")
    scoreOrderedCum(df, idCol, scoreCol, Seq(tokensCol), col(tokensCol))
      .filter(col("__cum") <= budget)
      .select(col(idCol), col(scoreCol), col(tokensCol))
  }

  /** [[selectByTokenBudget]] with the budget as a FRACTION of the corpus's
    * total tokens (floor(frac · total)), computed in-plan — no action, no
    * driver round-trip, and the cutoff scales with the data.
    */
  def selectByTokenBudgetFraction(df: DataFrame, idCol: String,
      scoreCol: String, tokensCol: String, frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac $frac outside [0,1]")
    scoreOrderedCum(df, idCol, scoreCol, Seq(tokensCol), col(tokensCol))
      .filter(col("__cum") <= floor(lit(frac) * col("__total")))
      .select(col(idCol), col(scoreCol), col(tokensCol))
  }

  /** Exact NTILE(k) over global (`orderCol`, `idCol`) order WITHOUT a
    * single-task window — the bucketing step of CCNet-style corpus
    * splits ("head/middle/tail by perplexity"). Same two-level scan as
    * [[shufflePositions]]: range partition on the sort key, local
    * row_number, driver-size prefix offsets joined back; the bucket then
    * falls out of SQL-standard NTILE arithmetic on the 0-based global
    * position p over n rows (first n%k buckets hold ⌈n/k⌉ rows):
    * p < r·(q+1) → p div (q+1) + 1, else r + (p − r·(q+1)) div q + 1.
    *
    * The divisions run in doubles but stay exact: operands are integers
    * below 2^53 and every quotient is floored — bit-identical on any
    * engine, so the bucket assignment itself is oracle-checkable.
    */
  def ntileExact(df: DataFrame, idCol: String, orderCol: String, k: Int,
      out: String = "bucket"): DataFrame = {
    require(k > 0, s"k $k must be positive")
    import org.apache.spark.sql.expressions.Window
    val n = df.sparkSession.sparkContext.defaultParallelism
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col(orderCol), col(idCol))
    // localCheckpoint before branching — see [[withGlobalStart]]
    val local = df.select(col(idCol), col(orderCol))
      .repartitionByRange(n, col(orderCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .localCheckpoint()
    val wPrefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val counts = local.groupBy(col("__pid")).agg(max(col("__lrn")).as("__pcnt"))
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__pcnt")).over(wPrefix), lit(0L)))
      .select(col("__pid"), col("__off"))
    val total = counts.agg(sum(col("__pcnt")).as("__n"))
    val p = col("__off") + col("__lrn") - 1 // 0-based global position
    val q = floor(col("__n") / k).cast("long")
    val r = col("__n") - q * k
    val bucket = when(p < r * (q + 1),
        floor(p / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((p - r * (q + 1)) / greatest(q, lit(1L)))
        .cast("long") + 1)
    local.join(broadcast(offsets), Seq("__pid")).crossJoin(broadcast(total))
      .select(col(idCol), col(orderCol), bucket.cast("int").as(out))
  }

  /** Per-group cap: keep the top `k` rows of each group by (`scoreCol`
    * DESC, `idCol`) — the "at most N documents per domain" rule every
    * crawl pipeline applies so one giant domain can't dominate the mix.
    *
    * Skew shape: a plain window over `groupCol` puts an entire domain in
    * one task — a 100M-page domain becomes a straggler. So rows are first
    * pruned within (`group`, salt-of-id) cells: a cell's rank-> k rows can
    * never be in the group's global top k, so at most k·`salts` rows per
    * group reach the final window, bounding the heavy shuffle by k·salts
    * regardless of domain size. The salt is md5-derived from the id —
    * deterministic, so the result is reproducible anywhere.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String,
      scoreCol: String, k: Int, salts: Int = 16): DataFrame = {
    require(k > 0 && salts > 0, s"need k > 0 and salts > 0, got k=$k salts=$salts")
    import org.apache.spark.sql.expressions.Window
    val salt = conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 4), 16, 10).cast("long") % salts
    val local = Window.partitionBy(col(groupCol), col("__salt"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val global = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("__salt", salt)
      .withColumn("__lr", row_number().over(local))
      .filter(col("__lr") <= k)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= k)
      .drop("__salt", "__lr")
  }

  /** Sequence packing for pretraining: documents concatenated in `idCol`
    * order and cut into fixed-`seqLen`-token training sequences — the
    * standard "packing" step that eliminates padding waste. Output is the
    * SPAN MAP, one row per (document, sequence) the document overlaps:
    * `seq_id`, `doc_start` (0-based first token of the span within the
    * doc) and `seq_tokens` (span length) — enough for a loader to
    * assemble any sequence by slicing its documents, without this job
    * materializing corpus-sized token arrays. Pure integer arithmetic on
    * the global running sum, so any engine reproduces it exactly; a doc
    * spans ceil(n/L)+1 sequences at most, so the explode is bounded.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val o = col("__gstart")
    val n = col(tokensCol)
    withGlobalStart(df, idCol, tokensCol)
      .filter(n > 0)
      .withColumn("seq_id", explode(sequence(
        (o / seqLen).cast("long"), ((o + n - 1) / seqLen).cast("long"))))
      .select(col(idCol), col("seq_id"),
        greatest(col("seq_id") * seqLen - o, lit(0L)).as("doc_start"),
        (least((col("seq_id") + 1) * seqLen, o + n) -
          greatest(col("seq_id") * seqLen, o)).as("seq_tokens"))
  }
}
