package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language id, quality scoring, fingerprinting.
  *
  * All pure `Column` expressions (whole-stage-codegen'd, no UDFs) so they
  * run at scan speed over 100 TB of documents; every formula is also
  * expressible in ANSI SQL for oracle checks.
  */
object TextAnalysis {

  /** Spread a narrow scan across the cluster before heavy per-row scalar
    * work. A small corpus arrives as one parquet file = 1-2 scan
    * partitions, which would serialize all the per-document compute
    * (regex, hashing, winnowing) on one core — the repartition is a cheap
    * shuffle of the raw rows. Large inputs already carry >=
    * defaultParallelism partitions and skip the shuffle entirely.
    */
  def widen(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segment count: runs of letters, runs of digits, and
    * single other non-space chars — the usual pre-tokenizer shape.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Tiny per-language stopword sets for the n-gram/stopword langid
    * heuristic (public-knowledge function words).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "des", "une"),
    "es" -> Seq("el", "los", "y", "es", "no", "con", "una", "por"))

  /** Distinct-token overlap with a language's stopword set. */
  def stopwordOverlap(text: Column, lang: String): Column = {
    val set = stopwords.toMap.apply(lang)
    size(array_intersect(array_distinct(tokens(text)), typedlit(set)))
  }

  /** Heuristic language id: CJK-character share first, then arg-max of
    * stopword overlap in fixed priority order (en, de, fr, es); 'und'
    * (undetermined) when nothing matches.
    */
  def langId(text: Column): Column = {
    val cjk = size(regexp_extract_all(text, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    val s = stopwords.map { case (l, _) => l -> stopwordOverlap(text, l) }.toMap
    when(cjk * 3 > length(text), lit("zh"))
      .when(s("en") >= s("de") && s("en") >= s("fr") && s("en") >= s("es") && s("en") > 0, lit("en"))
      .when(s("de") >= s("fr") && s("de") >= s("es") && s("de") > 0, lit("de"))
      .when(s("fr") >= s("es") && s("fr") > 0, lit("fr"))
      .when(s("es") > 0, lit("es"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: length saturation, stopword density, and
    * penalties for punctuation/digit excess. Fixed evaluation order so the
    * double result is reproducible across engines.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val stopRatio = stopwordOverlap(text, "en").cast("double") / greatest(n, lit(1.0))
    val punct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("double")
    val digits = size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("double")
    lit(0.25) * least(n / lit(100.0), lit(1.0)) +
      lit(0.25) * least(stopRatio * lit(5.0), lit(1.0)) +
      lit(0.25) * (lit(1.0) - least(punct / greatest(chars, lit(1.0)) * lit(10.0), lit(1.0))) +
      lit(0.25) * (lit(1.0) - least(digits / greatest(chars, lit(1.0)) * lit(10.0), lit(1.0)))
  }

  /** Conservative email pattern shared verbatim with the SQL oracle (both
    * Java regex and DuckDB/RE2 interpret it identically).
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** Digit-run pattern for phone-ish PII: 9+ digits allowing separators. */
  val phonePattern = "[0-9][0-9 ()./-]{7,}[0-9]"

  /** PII counts per document (emails, phone-ish digit runs) — the scrub
    * stage every training-data pipeline runs before anything else.
    */
  def piiEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))

  def piiPhones(text: Column): Column =
    size(regexp_extract_all(text, lit(phonePattern), lit(0)))

  /** Text with emails masked — length-preserving redaction marker. */
  def redactEmails(text: Column): Column =
    regexp_replace(text, emailPattern, "<EMAIL>")

  /** Space-joined word n-grams of the document's whitespace tokens; empty
    * array when the doc has fewer than n tokens. Built by zipping n
    * shifted slices — NOT by indexed element_at inside a transform lambda:
    * a lambda body's subexpressions re-evaluate per element, so
    * `element_at(tokens(text), i)` would re-split the full text for every
    * n-gram (O(tokens² · len) per doc, measured 13.7 s vs 0.3 s on the
    * sf0.1 corpus). Slices evaluate the split a constant (n) number of
    * times per row.
    */
  def wordNGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size $n must be positive")
    val t = tokens(text)
    val cnt = size(t) - (n - 1)
    val joined = (1 to n).map(i => slice(t, lit(i), cnt))
      .reduceRight[Column]((s, acc) =>
        zip_with(s, acc, (a, b) => concat(a, lit(" "), b)))
    when(cnt < 1, array().cast("array<string>")).otherwise(joined)
  }

  private def wordTrigrams(text: Column): Column = wordNGrams(text, 3)

  /** Repetition score in [0,1]: 1 - distinct/total word 3-grams (the
    * Gopher/RefinedWeb-style repetitiousness signal; boilerplate and
    * looping generations score high). Docs under 3 tokens score 0.
    */
  def repetitionScore(text: Column): Column =
    when(size(tokens(text)) < 3, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(wordTrigrams(text))).cast("double") /
          size(wordTrigrams(text)).cast("double"))

  /** Overlapping token-window chunking — the context-window splitting
    * step of a training pipeline (docs → fixed-size chunks with stride
    * overlap so no boundary context is lost). One row per chunk:
    * (id, chunk_id, n_chunk_tokens, chunk_hash). Pure per-row array ops —
    * no shuffle, no UDF: at 100 TB this runs at scan speed and the output
    * is immediately repackable with [[Sampling.packTokenShards]].
    *
    * Chunk k covers tokens [k·stride + 1, k·stride + chunkSize]; the last
    * chunk may be short. `chunk_hash` (md5 of the space-joined window)
    * stands in for the chunk text so result rows stay narrow; callers
    * wanting the text swap `array_join` in for the hash.
    */
  def chunkWindows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    widen(df).select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0L), ((col("__n") - 1) / stride).cast("long")),
          k => slice(col("__toks"), (k * stride + 1).cast("int"), lit(chunkSize)))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        size(col("col")).as("n_chunk_tokens"),
        md5(array_join(col("col"), " ")).as("chunk_hash"))
  }

  /** Corpus-statistics token rarity per document: token count, number of
    * rare tokens (corpus frequency <= rareMax), and mean corpus term
    * frequency — the cheap stand-in for unigram-LM perplexity filtering
    * (a doc whose tokens are mostly corpus-rare is likely noise; one
    * whose tokens are all ultra-common is likely boilerplate).
    *
    * Shape at scale: explode → count per token (map-side combined) →
    * equi-join back → per-doc aggregate. The frequency table is a
    * fraction of corpus size (vocabulary), so Catalyst broadcasts it at
    * small scale and shuffle-joins at large — no code change. Outputs are
    * integer counts and a ratio of exact integers, so the doubles are
    * bit-identical across engines.
    */
  /** (id, __t, __tf): the per-(document, distinct-lowercased-token)
    * frequency table — the shared first stage of [[tokenRarity]],
    * [[unigramNll]] and [[tokenEntropy]]. One corpus tokenize + explode
    * (the widest scalar stage of the whole ta family); callers
    * materialize it once and feed every vocabulary-keyed statistic.
    */
  def docTokenTf(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    widen(df)
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__tf"))

  def tokenRarity(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, rareMax: Long = 2): org.apache.spark.sql.DataFrame =
    // one explode pass: the compact per-(doc, distinct-token) TF table is
    // materialized once (eager localCheckpoint — lineage cut, blocks
    // GC-reclaimed) and feeds both the vocabulary count and the per-doc
    // aggregate; deriving both from raw occurrences would scan and
    // explode the whole corpus twice
    tokenRarityFromTf(docTokenTf(df, idCol, textCol).localCheckpoint(),
      idCol, rareMax)

  /** Same, over a PRE-BUILT (and materialized) [[docTokenTf]] table. */
  def tokenRarityFromTf(tf: org.apache.spark.sql.DataFrame, idCol: String,
      rareMax: Long = 2): org.apache.spark.sql.DataFrame = {
    val freq = tf.groupBy(col("__t")).agg(sum(col("__tf")).as("__f"))
    tf.join(freq, Seq("__t"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        sum(when(col("__f") <= rareMax, col("__tf")).otherwise(0L)).as("n_rare"),
        (sum(col("__tf") * col("__f")).cast("double") /
          sum(col("__tf")).cast("double")).as("mean_tf"))
  }

  /** CCNet-style unigram-LM negative log-likelihood per token (Wenzek et
    * al., "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", LREC 2020 — there a KenLM 5-gram; the unigram form is
    * the same filter shape): nll = ln(T) − (1/N_doc)·Σ_t cnt_t·ln(f_t),
    * where f_t is the corpus frequency of token t and T the corpus token
    * total. Low = fluent/common text, high = noise; CCNet buckets the
    * corpus into head/middle/tail by this score.
    *
    * Same one-explode shape as [[tokenRarity]] (the TF table feeds the
    * vocabulary count and the per-doc aggregate). The per-doc double sum
    * folds in ascending-token order (sort_array + aggregate) so the score
    * is reproducible across partitionings; `ln` is transcendental, so
    * cross-engine oracles round (6 dp leaves ~1e7 ulp of headroom).
    */
  /** Per-document Shannon entropy of the token distribution (nats):
    * H = ln(n) − (1/n)·Σ_t tf_t·ln(tf_t) — the lexical-diversity /
    * repetitiveness signal quality pipelines threshold on (H ≈ 0 means
    * the doc is one token repeated; H = ln(n) means all tokens
    * distinct). Unlike [[unigramNll]] the statistic is per-doc only: one
    * explode → (doc, token) count with map-side combine, then a per-doc
    * fold — no corpus-wide vocabulary join. The double sum folds in
    * ascending-token order (the [[quality]]-score discipline), so the
    * value is reproducible across partitionings and engines.
    */
  def tokenEntropy(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    tokenEntropyFromTf(docTokenTf(df, idCol, textCol), idCol)

  /** Same, over a PRE-BUILT [[docTokenTf]] table. */
  def tokenEntropyFromTf(tf: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame =
    tf
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        (log(sum(col("__tf")).cast("double")) -
          aggregate(
            sort_array(collect_list(struct(col("__t"),
              (col("__tf").cast("double") * log(col("__tf").cast("double")))
                .as("__term")))),
            lit(0.0),
            (acc, x) => acc + x.getField("__term"))
          / sum(col("__tf")).cast("double")).as("token_entropy"))

  def unigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    unigramNllFromTf(docTokenTf(df, idCol, textCol).localCheckpoint(), idCol)

  /** Same, over a PRE-BUILT (and materialized) [[docTokenTf]] table. */
  def unigramNllFromTf(tf: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val freq = tf.groupBy(col("__t")).agg(sum(col("__tf")).as("__f"))
    val total = freq.agg(sum(col("__f")).as("__tot"))
    tf.join(freq, Seq("__t")).crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
        (first(log(col("__tot").cast("double"))) -
          aggregate(
            sort_array(collect_list(struct(col("__t"),
              (col("__tf").cast("double") * log(col("__f").cast("double")))
                .as("__term")))),
            lit(0.0),
            (acc, x) => acc + x.getField("__term"))
          / sum(col("__tf")).cast("double")).as("unigram_nll"))
  }

  /** Interpolated bigram-LM negative log-likelihood per token — the
    * CCNet-style perplexity quality signal one order up from
    * [[unigramNll]]: p̂(v|u) = λ·count(u v)/count(u ·) + (1−λ)·count(v)/T
    * with corpus-MLE counts, per-doc score = −Σ tf·ln p̂ / n_bigrams over
    * the doc's bigram occurrences. Every observed bigram has count ≥ 1
    * (it occurs in the doc scoring it), so p̂ > 0 without smoothing.
    *
    * Shape at scale: the full tokenize + explode (the widest scalar
    * stage) runs ONCE — the bigram table feeds the per-doc table and the
    * bigram/context stats, and the unigram counts are reconstructed from
    * it exactly: every token is the second element of exactly one bigram
    * except each doc's FIRST token, which a cheap limit-2 prefix split
    * supplies per document (one row per doc, no second corpus explode).
    * Scoring is equi-joins on bigram/context/token keys (each ≤
    * vocabulary-sized; Catalyst broadcasts the small sides) and one
    * per-doc aggregate. Nothing corpus².
    *
    * Determinism: counts are exact; the per-doc double fold runs in
    * ascending (u, v) order (sort_array + aggregate), and callers round
    * the score (ln is the one transcendental an oracle can't replay
    * bit-for-bit).
    */
  def bigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.7): org.apache.spark.sql.DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val zipped = zip_with(slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("u"), b.as("v")))
    val bi = widen(df).select(col(idCol),
        explode(when(size(toks) < 2,
          array().cast("array<struct<u:string,v:string>>"))
          .otherwise(zipped)).as("__bg"))
      .select(col(idCol), col("__bg.u").as("__u"), col("__bg.v").as("__v"))
    val docBi = bi.groupBy(col(idCol), col("__u"), col("__v"))
      .agg(count(lit(1)).as("__tf"))
      .localCheckpoint()
    val fb = docBi.groupBy(col("__u"), col("__v"))
      .agg(sum(col("__tf")).as("__fb"))
    val fp = fb.groupBy(col("__u")).agg(sum(col("__fb")).as("__fp"))
    // unigram counts WITHOUT a second corpus tokenize: count(v) =
    // (bigram occurrences ending in v) + (docs whose first token is v);
    // the limit-2 split stops at the first separator.
    // Null text yields a NULL first token (the exploded path emits no
    // row for it) — drop it, or it lands as a phantom null-key count
    // inflating T. Filter the TEXT, not the derived token: a non-null
    // text always splits to a non-empty array (equivalent predicate),
    // and post-filtering the alias re-evaluated the split per doc
    // (Filter + Project — the round-17 pushdown-duplication audit).
    val firsts = widen(df).filter(col(textCol).isNotNull)
      .select(split(trim(lower(col(textCol))), "\\s+", 2).getItem(0).as("__v"))
      .groupBy(col("__v")).agg(count(lit(1)).as("__c"))
    val fu = docBi.groupBy(col("__v")).agg(sum(col("__tf")).as("__c"))
      .unionByName(firsts)
      .groupBy(col("__v")).agg(sum(col("__c")).as("__fu"))
    val tot = fu.agg(sum(col("__fu")).as("__t"))
    val term = docBi.join(fb, Seq("__u", "__v")).join(fp, Seq("__u"))
      .join(fu, Seq("__v")).crossJoin(broadcast(tot))
      .withColumn("__term", col("__tf").cast("double") * log(
        lit(lambda) * (col("__fb").cast("double") / col("__fp").cast("double")) +
        lit(1.0 - lambda) * (col("__fu").cast("double") / col("__t").cast("double"))))
    term.groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_bigrams"),
        (-aggregate(
          sort_array(collect_list(struct(col("__u"), col("__v"), col("__term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("__term"))
          / sum(col("__tf")).cast("double")).as("bigram_nll"))
  }

  /** PII redaction — the transform stage downstream of the PII counters:
    * emails and phone-ish digit runs replaced with `<EMAIL>` / `<PHONE>`
    * markers, counts kept for auditing. Pure codegen'd regexp Columns at
    * scan speed; the patterns are the shared Java/RE2-identical ones
    * ([[emailPattern]], [[phonePattern]]), so the oracle replays the
    * redaction exactly. Emails are masked FIRST so a digit-heavy local
    * part can't be half-eaten by the phone pass — and n_phones counts on
    * the email-masked text for the same reason, so each count equals the
    * number of markers of its kind actually present in `clean_text` (a
    * phone-shaped span swallowed by an email match is an email, not a
    * phantom unredacted phone).
    */
  def redactPii(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    widen(df).select(col(idCol),
      piiEmails(col(textCol)).cast("long").as("n_emails"),
      piiPhones(redactEmails(col(textCol))).cast("long").as("n_phones"),
      regexp_replace(redactEmails(col(textCol)),
        phonePattern, "<PHONE>").as("clean_text"))

  /** DSIR-style importance score (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023): hashed
    * n-gram features (unigrams + bigrams → `buckets` via the md5-60
    * hash), per-bucket counts over a TARGET subset vs the whole corpus,
    * and per-doc score = Σ_b cnt_b · (ln p̂_target(b) − ln p̂_corpus(b))
    * with add-one smoothing — the log importance weight under bag-of-
    * hashed-ngrams unigram models. High scores = documents that look
    * like the target distribution; selection/resampling ranks on it.
    *
    * Shape at scale: one explode pass → per-(doc,bucket) counts
    * (map-side combined), bucket stats aggregated from that same table,
    * then an equi-join on bucket (≤`buckets` distinct keys; Catalyst
    * broadcasts the stats side) and a per-doc aggregate. Nothing is
    * corpus²; the stats table is O(buckets).
    *
    * Determinism: counts are exact integers; the per-doc double sum
    * folds in ascending-bucket order (sort_array + aggregate), so the
    * score is bit-reproducible across partitionings AND engines — the
    * [[quality]]-score discipline applied to an aggregate.
    */
  def dsirScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, targetCol: Column,
      buckets: Int = 4096): org.apache.spark.sql.DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val bi = when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val grams = widen(df).select(col(idCol), targetCol.as("__tgt"),
        explode(concat(toks, bi)).as("__g"))
      .select(col(idCol), col("__tgt"),
        (Dedup.md5Hash60(col("__g")) % buckets).as("__b"))
    // one (doc, bucket) count table feeds the doc terms AND the global
    // bucket stats — explode runs once
    val docb = grams.groupBy(col(idCol), col("__tgt"), col("__b"))
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint()
    val stats = docb.groupBy(col("__b"))
      .agg(sum(col("__cnt")).as("__rc"),
        sum(when(col("__tgt"), col("__cnt")).otherwise(0L)).as("__tc"))
    val totals = stats.agg(sum(col("__rc")).as("__rt"), sum(col("__tc")).as("__tt"))
    val term = docb.join(stats, Seq("__b")).crossJoin(broadcast(totals))
      .withColumn("__term", col("__cnt").cast("double") * (
        log((col("__tc") + 1).cast("double") /
          (col("__tt") + buckets).cast("double")) -
        log((col("__rc") + 1).cast("double") /
          (col("__rt") + buckets).cast("double"))))
    term.groupBy(col(idCol))
      .agg(sum(col("__cnt")).as("n_grams"),
        aggregate(
          sort_array(collect_list(struct(col("__b"), col("__term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("__term")).as("dsir_score"))
  }

  /** Gopher/C4-style rule-based quality filter (cf. Rae et al. 2021
    * §A.1.1 and Raffel et al. 2020 §2.2 — public heuristics): per-doc
    * rule flags plus the combined keep decision, so a pipeline can both
    * filter and audit WHY documents were dropped. Rules:
    *
    *   - `r_word_count`: word count in [minWords, maxWords]
    *   - `r_mean_word_len`: mean word length in [3, 10] characters
    *   - `r_symbol_ratio`: (# or ellipsis) occurrences / words <= 0.1
    *   - `r_alpha_words`: >= 80% of words contain an alphabetic char
    *   - `r_stopwords`: >= 2 distinct English stopwords present
    *
    * Pure codegen'd Column arithmetic (ratios are single divisions of
    * exact integers — cross-engine bit-identical), runs at scan speed;
    * every rule has a direct DuckDB twin for the oracle.
    */
  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minWords: Int = 50, maxWords: Int = 100000)
      : org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val meanLen = length(regexp_replace(trim(text), "\\s+", ""))
      .cast("double") / greatest(n, lit(1.0))
    val symbols = size(regexp_extract_all(text, lit("#|\\.\\.\\."), lit(0)))
      .cast("double")
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double")
    widen(df).select(
      col(idCol),
      n.cast("long").as("n_words"),
      (n >= minWords && n <= maxWords).as("r_word_count"),
      (meanLen >= 3.0 && meanLen <= 10.0).as("r_mean_word_len"),
      (symbols / greatest(n, lit(1.0)) <= 0.1).as("r_symbol_ratio"),
      (alphaWords / greatest(n, lit(1.0)) >= 0.8).as("r_alpha_words"),
      (stopwordOverlap(text, "en") >= 2).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_alpha_words") && col("r_stopwords"))
  }

  /** Normalized-text form used for fingerprinting/exact dedup: trim,
    * collapse whitespace, lowercase.
    */
  def normalize(text: Column): Column =
    lower(regexp_replace(trim(text), "\\s+", " "))

  /** 64-bit document fingerprint: xxhash64 of the normalized text
    * (codegen'd native expression — no UDF in the 100 TB hot path).
    */
  def fingerprint(text: Column): Column = xxhash64(normalize(text))
}
