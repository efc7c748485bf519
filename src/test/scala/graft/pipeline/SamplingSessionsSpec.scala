package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSessionsSpec extends SparkTestBase {

  test("deterministic sample: rate 0 and 1 are exact, membership is stable") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("id")
    assert(Sampling.deterministicSample(df, "id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(df, "id", 1.0).count() == 1000)
    val a = Sampling.deterministicSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(df, "id", 0.3).collect().map(_.getLong(0)).toSet
    assert(a == b)
    // roughly the requested fraction (md5 is uniform; 1000 draws at 0.3)
    assert(a.size > 230 && a.size < 370, s"got ${a.size}")
    // monotone: a lower rate selects a subset of a higher rate
    val c = Sampling.deterministicSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("stratified sample applies per-stratum rates") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "big" else "small"))
      .toDF("id", "src")
    val s = Sampling.stratifiedSample(df, "id", "src",
      Map("big" -> 0.1), defaultRate = 1.0)
    val bySrc = s.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("small") == 1000) // default rate 1.0 keeps all
    assert(bySrc("big") > 50 && bySrc("big") < 150, s"got ${bySrc("big")}")
  }

  test("weightedSample: exact k, weight bias, partition-invariant, w<=0 excluded") {
    import spark.implicits._
    // half the ids weigh 100, half weigh 1: the heavy half should dominate
    val df = (1L to 1000L).map(i => (i, if (i <= 500) 100L else 1L))
      .toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 200)
      .collect().map(_.getLong(0))
    assert(got.length == 200 && got.distinct.length == 200)
    val heavy = got.count(_ <= 500)
    assert(heavy > 170, s"heavy-weight rows under-sampled: $heavy/200")
    // identical sample under a different partitioning
    val re = Sampling.weightedSample(df.repartition(13), "id", "w", k = 200)
      .collect().map(_.getLong(0))
    assert(re.sorted.sameElements(got.sorted))
    // zero/negative weights never sampled
    val withZero = (1L to 10L).map(i => (i, if (i <= 5) 0L else 1L)).toDF("id", "w")
    val nz = Sampling.weightedSample(withZero, "id", "w", k = 10)
      .collect().map(_.getLong(0))
    assert(nz.length == 5 && nz.forall(_ > 5))
  }

  test("pii detection counts and redacts emails and phone-like runs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    val df = Seq(
      (1L, "contact alice@example.com or bob.smith+x@sub.example.org today"),
      (2L, "call +1 (555) 123-4567 now"),
      (3L, "no pii here at all"),
      (4L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.piiEmails(col("text")).as("e"),
        TextAnalysis.piiPhones(col("text")).as("p"),
        TextAnalysis.redactEmails(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 2, 0, "contact <EMAIL> or <EMAIL> today"),
      (2L, 0, 1, "call +1 (555) 123-4567 now"),
      (3L, 0, 0, "no pii here at all"),
      (4L, 0, 0, "")))
  }

  test("repetition score: 0 for short/distinct text, high for loops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "one two"),                          // < 3 tokens -> 0
      (2L, "a b c d e"),                        // all trigrams distinct -> 0
      (3L, ("spam ham " * 20).trim)).toDF("doc_id", "text") // looping -> high
    val got = df.select(col("doc_id"),
        TextAnalysis.repetitionScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.0)
    assert(got(3L) > 0.9, s"got ${got(3L)}")
  }

  test("temperatureMix keeps the smallest domain whole and flattens large ones") {
    import spark.implicits._
    // 100 small-domain rows, 900 big-domain rows
    val df = (1L to 1000L).map(i => (i, if (i <= 100) "small" else "big"))
      .toDF("id", "dom")
    val kept = Sampling.temperatureMix(df, "id", "dom")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // rate_small = sqrt(100/100) = 1.0 -> all kept
    assert(bySrc("small") == 100, bySrc)
    // rate_big = sqrt(100/900) = 1/3 -> ~300 of 900 (md5-uniform)
    assert(bySrc("big") > 240 && bySrc("big") < 360, bySrc)
    // deterministic
    val again = Sampling.temperatureMix(df, "id", "dom")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("chunkWindows covers every token with stride overlap") {
    import spark.implicits._
    val text = (1 to 150).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, "solo")).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkWindows(df, "doc_id", "text", 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // doc 1: 150 tokens -> starts 1, 49, 97, 145 -> sizes 64, 64, 54, 6
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3).toSeq
    assert(d1 == Seq(64, 64, 54, 6), d1)
    // doc 2: single token -> one chunk of 1
    val d2 = chunks.filter(_._1 == 2L).map(_._3).toSeq
    assert(d2 == Seq(1), d2)
    // chunk k starts at k*stride: token coverage is total with overlap 16
    assert(chunks.filter(_._1 == 1L).map(_._3).sum == 64 + 64 + 54 + 6)
  }

  test("tokenRarity: counts, rare tokens and mean corpus frequency") {
    import spark.implicits._
    val df = Seq(
      (1L, "apple banana apple"),       // apple f=3 (2 here + 1 in doc 2)
      (2L, "apple cherry")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenRarity(df, "doc_id", "text", rareMax = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    // corpus freq: apple=3, banana=1, cherry=1
    // doc1: n=3, rare(banana)=1, mean=(3+1+3)/3
    // doc2: n=2, rare(cherry)=1, mean=(3+1)/2
    assert(got == Seq((1L, 3L, 1L, 7.0 / 3.0), (2L, 2L, 1L, 2.0)), got)
  }

  test("packTokenShards assigns by global running token budget") {
    import spark.implicits._
    // 6 docs x 40 tokens, budget 100: cum-before = 0,40,80,120,160,200
    // -> shards 0,0,0,1,1,2
    val df = (1L to 6L).map(i => (i, ("w " * 40).trim)).toDF("doc_id", "text")
    val withTokens = df.select($"doc_id",
      TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val got = Sampling.packTokenShards(withTokens, "doc_id", "n_tokens", 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("writeTokenShards materializes one dir per shard with a true manifest") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (1L to 6L).map(i => (i, 40L, s"payload$i"))
      .toDF("doc_id", "n_tokens", "text")
    val manifest = Sampling.writeTokenShards(df, "doc_id", "n_tokens", 100L, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // cum-before = 0,40,80,120,160,200 -> shards 0(3 docs),1(2),2(1)
    assert(manifest == Seq((0, 3L, 120L), (1, 2L, 80L), (2, 1L, 40L)), manifest)
    // hive layout: one directory per shard; payload columns intact
    import scala.jdk.CollectionConverters._
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("shard=")).toSeq.sorted
    assert(dirs == Seq("shard=0", "shard=1", "shard=2"))
    val shard0 = spark.read.parquet(dir).filter($"shard" === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(shard0 == Set((1L, "payload1"), (2L, "payload2"), (3L, "payload3")))
  }

  test("packTokenShards is deterministic under AQE coalescing variations") {
    import spark.implicits._
    // Skewed token counts so shard boundaries land mid-partition; 500 docs
    // across many range partitions. The reference assignment is the global
    // running sum computed in one window (exact semantics, driver-scale
    // here). Regression for the spark_partition_id() branch-recompute bug:
    // the two-level scan must give the SAME assignment no matter how AQE
    // coalesces the range shuffle between its two consumer stages.
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, 1L + (i * 37) % 113)).toDF("doc_id", "n_tokens")
    val expected = df
      .withColumn("shard", ((coalesce(sum($"n_tokens").over(
          Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L))) / 1000L).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val confs = Seq(
      Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1b"),
      Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "1",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64m"))
    for (conf <- confs) {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      try {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val got = Sampling.packTokenShards(df, "doc_id", "n_tokens", 1000L)
          .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
        assert(got == expected, s"mismatch under $conf")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("ntileExact matches SQL NTILE semantics at any n % k, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // n = 10, k = 3 -> bucket sizes 4,3,3; also n < k and n % k = 0 shapes
    for (n <- Seq(10, 9, 2, 1)) {
      val df = (1 to n).map(i => (i.toLong, (i * 131 % 17).toDouble))
        .toDF("id", "score")
      val expected = df.withColumn("bucket",
          ntile(3).over(Window.orderBy($"score", $"id")))
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      val got = Sampling.ntileExact(df, "id", "score", 3)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(got == expected, s"n=$n")
    }
    // invariance to shuffle-partition count (two-level scan, no global window)
    val big = (1L to 500L).map(i => (i, (i * 37 % 113).toDouble)).toDF("id", "score")
    val base = Sampling.ntileExact(big, "id", "score", 7)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val saved = spark.conf.getOption("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val alt = Sampling.ntileExact(big, "id", "score", 7)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      assert(alt == base)
    } finally saved.foreach(spark.conf.set("spark.sql.shuffle.partitions", _))
  }

  test("canonicalDocs keeps the best doc per cluster, singletons intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, 100L), (2L, 300L), (3L, 300L), // cluster {1,2,3}: 2 wins (tie->min id)
      (4L, 50L),                          // singleton
      (5L, 10L), (6L, 20L)                // cluster {5,6}: 6 wins
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val got = Dedup.canonicalDocs(docs, "doc_id", pairs, "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 300L), (4L, 4L, 50L), (5L, 6L, 20L)))
    // ties break to the SMALLEST id via min_by on (-score, id) — the id
    // itself is never negated (connectedComponents requires integral ids
    // today; the tie-break must not add a second numeric assumption)
  }

  test("packSequences maps docs onto fixed-length sequence spans exactly") {
    import spark.implicits._
    // L=10; docs of 4, 12, 10, 5 tokens at global starts 0, 4, 16, 26:
    //   doc 1 -> seq 0 [0..3]           (start 0, 4 toks)
    //   doc 2 -> seq 0 [4..9] (6), seq 1 [10..15] (6)
    //   doc 3 -> seq 1 [16..19] (4), seq 2 [20..25] (6)
    //   doc 4 -> seq 2 [26..29] (4), seq 3 [30] (1)
    val df = Seq((1L, 4L), (2L, 12L), (3L, 10L), (4L, 5L))
      .toDF("doc_id", "n_tokens")
    val got = Sampling.packSequences(df, "doc_id", "n_tokens", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L),
      (2L, 0L, 0L, 6L), (2L, 1L, 6L, 6L),
      (3L, 1L, 0L, 4L), (3L, 2L, 4L, 6L),
      (4L, 2L, 0L, 4L), (4L, 3L, 4L, 1L)))
    // spans tile every sequence: per-seq token sums are full except the tail
    val perSeq = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    assert(perSeq == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 1L))
  }

  test("shufflePositions: dense md5-ordered permutation, stable under partitioning") {
    import spark.implicits._
    val df = (1L to 300L).map(i => Tuple1(i)).toDF("doc_id")
    val expected = df
      .withColumn("position", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(
          md5($"doc_id".cast("string").cast("binary")))).cast("long") - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Sampling.shufflePositions(df, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.toSeq.sorted == (0L until 300L)) // dense 0..n-1
    // invariant under input partitioning (reproducible across cluster sizes)
    val got1 = Sampling.shufflePositions(df.repartition(13), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 == expected)
  }

  test("selectTopFraction keeps exactly the globally best frac by score") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // scores with duplicates so the doc_id tie-break matters
    val df = (1L to 200L).map(i => (i, ((i * 7) % 23).toDouble)).toDF("doc_id", "score")
    val expected = df
      .withColumn("rn", row_number().over(Window.orderBy($"score".desc, $"doc_id")))
      .filter($"rn" <= 20) // floor(0.1 * 200)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val got = Sampling.selectTopFraction(df, "doc_id", "score", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.size == 20)
  }

  test("selectByTokenBudget fills greedily by score within the budget") {
    import spark.implicits._
    // scores 5,4,3,2,1 with tokens 10,20,40,10,10; budget 70 keeps the
    // score-order prefix 10+20+40=70 and nothing after it
    val df = Seq((1L, 5.0, 10L), (2L, 4.0, 20L), (3L, 3.0, 40L),
      (4L, 2.0, 10L), (5L, 1.0, 10L)).toDF("doc_id", "score", "n_tokens")
    val got = Sampling.selectByTokenBudget(df, "doc_id", "score", "n_tokens", 70L)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
    // fractional budget: floor(0.5 * 90) = 45 -> prefix 10+20 fits, +40 not
    val got2 = Sampling.selectByTokenBudgetFraction(
      df, "doc_id", "score", "n_tokens", 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L, 2L))
  }

  test("budget selection is deterministic under AQE coalescing variations") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i =>
      (i, ((i * 31) % 97).toDouble, 1L + (i * 37) % 113))
      .toDF("doc_id", "score", "n_tokens")
    val expected = df
      .withColumn("cum", sum($"n_tokens").over(
        Window.orderBy($"score".desc, $"doc_id")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .filter($"cum" <= 7000L)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val confs = Seq(
      Map("spark.sql.adaptive.enabled" -> "false",
        "spark.sql.shuffle.partitions" -> "8"),
      Map("spark.sql.adaptive.enabled" -> "true",
        "spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1b"))
    for (conf <- confs) {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      try {
        conf.foreach { case (k, v) => spark.conf.set(k, v) }
        val got = Sampling.selectByTokenBudget(df, "doc_id", "score", "n_tokens", 7000L)
          .collect().map(_.getLong(0)).toSet
        assert(got == expected, s"mismatch under $conf")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("sessionize splits on gaps >= the threshold and aggregates per session") {
    import spark.implicits._
    def ts(min: Long) = new Timestamp(min * 60000L)
    // user 1: events at 0,10,20 (one session), 60,65 (second session)
    // user 2: single event
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0), (1L, ts(20), 3.0),
      (1L, ts(60), 4.0), (1L, ts(65), 5.0),
      (2L, ts(5), 7.0)).toDF("user_id", "ts", "value")
    val got = Sessions.sessionize(df, "user_id", "ts", "value", "30 minutes")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      (1L, ts(0), 3L, 6.0),
      (1L, ts(60), 2L, 9.0),
      (2L, ts(5), 1L, 7.0)))
  }

  test("funnel counts strictly time-ordered step subsequences per user") {
    import spark.implicits._
    def ts(min: Long) = new Timestamp(min * 60000L)
    val df = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "signup"), (1L, ts(5), "view"), (1L, ts(9), "purchase"),
      // user 2: purchase BEFORE the view -> reaches only step 1
      (2L, ts(0), "signup"), (2L, ts(3), "purchase"), (2L, ts(6), "view"),
      // user 3: never signed up -> reaches nothing
      (3L, ts(1), "view"), (3L, ts(2), "purchase"),
      // user 4: signup only; same-instant view must NOT count (strict >)
      (4L, ts(7), "signup"), (4L, ts(7), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = Sessions.funnel(df, "user_id", "ts", "event_type",
      Seq("signup", "view", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, "signup", 3L), (1L, "view", 2L), (2L, "purchase", 1L)))
  }

  test("funnel emits zero-count rows for unreached steps") {
    import spark.implicits._
    def ts(min: Long) = new Timestamp(min * 60000L)
    val df = Seq((1L, ts(0), "view")).toDF("user_id", "ts", "event_type")
    val got = Sessions.funnel(df, "user_id", "ts", "event_type",
      Seq("signup", "view")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got == Set((0L, 0L), (1L, 0L)))
  }

  test("retention cohorts users by first week and counts active offsets") {
    import spark.implicits._
    // Mondays: 2024-01-01, 2024-01-08, 2024-01-15
    def t(day: Int, hour: Int = 12) =
      Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")
    val df = Seq(
      (1L, t(1)), (1L, t(3)),   // cohort wk0, active wk0 (twice, one row)
      (1L, t(9)),               // wk1
      (2L, t(2)),               // cohort wk0, only wk0
      (3L, t(10)), (3L, t(16))) // cohort wk1, active wk1 + wk2(offset 1)
      .toDF("user_id", "ts")
    val got = Sessions.retention(df, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L),   // users 1,2 active in their cohort week
      ("2024-01-01", 1L, 1L),   // user 1 back in week 1
      ("2024-01-08", 0L, 1L),   // user 3 cohort week
      ("2024-01-08", 1L, 1L)))  // user 3 back the next week
  }

  test("upsampleDomains repeats rows floor(rate) times plus a hash-decided extra") {
    import spark.implicits._
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "lang")
    val got = Sampling.upsampleDomains(df, "doc_id", "lang",
      Map("a" -> 2.5), defaultRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.length).toMap
    // every 'a' doc appears 2 or 3 times; 'b' docs 0 or 1 times
    val aCounts = (2L to 400L by 2).map(i => byDoc.getOrElse(i, 0))
    val bCounts = (1L to 400L by 2).map(i => byDoc.getOrElse(i, 0))
    assert(aCounts.forall(c => c == 2 || c == 3))
    assert(bCounts.forall(c => c == 0 || c == 1))
    // fractions land near the rates (hash-uniform): ~50% of a's get the
    // 3rd copy, ~25% of b's survive
    assert(math.abs(aCounts.count(_ == 3) / 200.0 - 0.5) < 0.15)
    assert(math.abs(bCounts.count(_ == 1) / 200.0 - 0.25) < 0.15)
    // copy indices are 0-based and dense
    got.groupBy(_._1).values.foreach { copies =>
      assert(copies.map(_._3).sorted.sameElements(0L until copies.length))
    }
    // deterministic under repartitioning
    val again = Sampling.upsampleDomains(df.repartition(7), "doc_id", "lang",
      Map("a" -> 2.5), defaultRate = 0.25)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(again == got.toSet)
  }

  test("thetaDistinct estimate tracks true cardinality and is deterministic") {
    import spark.implicits._
    val df = (1L to 20000L).map(i => i % 5000).toDF("v") // 5000 distinct
    val r1 = Sampling.thetaDistinct(df, "v", rate = 1.0 / 8).collect()(0)
    val r2 = Sampling.thetaDistinct(df.repartition(7), "v", rate = 1.0 / 8)
      .collect()(0)
    assert(r1 == r2) // deterministic under repartitioning
    val est = r1.getDouble(1)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15,
      s"estimate $est too far from 5000")
    assert(r1.getLong(0) == math.round(est / 8.0)) // scale = n/rate exactly
  }
}
