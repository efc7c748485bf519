package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE vocabulary induction: the distributed trainer/encoder must agree
  * with a naive single-machine reference implementation (same greedy
  * rule, same tie-break) on hand-built and generated corpora.
  */
class BpeSpec extends SparkTestBase {

  // ---- naive reference implementation (counts pairs over the word list
  // exactly like Sennrich et al.'s original script) ----

  private def refPairCounts(vocab: Map[List[String], Long])
      : Map[(String, String), Long] =
    vocab.toSeq.flatMap { case (syms, f) =>
      syms.zip(syms.tail).map(p => p -> f)
    }.groupBy(_._1).map { case (p, fs) => p -> fs.map(_._2).sum }

  private def refMergeWord(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refTrain(words: Map[String, Long], numMerges: Int,
      minCount: Long = 2L): List[(String, String)] = {
    var vocab = words.map { case (w, f) => w.map(_.toString).toList -> f }
    val merges = scala.collection.mutable.ListBuffer[(String, String)]()
    var stop = false
    while (!stop && merges.length < numMerges) {
      val counts = refPairCounts(vocab)
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        if (c < minCount) stop = true
        else {
          merges += ((l, r))
          vocab = vocab.toSeq.map { case (s, f) => refMergeWord(s, l, r) -> f }
            .groupBy(_._1).map { case (s, fs) => s -> fs.map(_._2).sum }
        }
      }
    }
    merges.toList
  }

  private def refEncode(word: String, merges: List[(String, String)]): List[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList
    var done = syms.length < 2
    while (!done) {
      val present = syms.zip(syms.tail).flatMap(rank.get)
      if (present.isEmpty) done = true
      else {
        val (l, r) = merges(present.min)
        syms = refMergeWord(syms, l, r)
        done = syms.length < 2
      }
    }
    syms
  }

  test("train matches the reference greedy merges on the classic corpus") {
    import spark.implicits._
    // Sennrich's running example shape: low/lower/newest/widest
    val docs = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val df = Seq((1L, docs)).toDF("doc_id", "text")
    val got = Bpe.train(df, "text", numMerges = 6).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toList
    val want = refTrain(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L), 6)
    assert(got == want)
    // the most frequent pair in this corpus is (e,s) from newest+widest (9)
    assert(got.head == ("e", "s"))
  }

  test("train agrees with the reference on a generated corpus; encode round-trips") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(60)(
      (1 to (2 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val text = rnd.shuffle(words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w)))
      .mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val wordFreq = text.split("\\s+").groupBy(identity)
      .map { case (w, a) => w -> a.length.toLong }
    val want = refTrain(wordFreq, 15)
    val got = Bpe.train(df, "text", numMerges = 15).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toList
    assert(got == want)
    // encoding: concatenating a word's subwords restores the word, and
    // the distributed kernel matches the reference segmenter
    val enc = df.select(Bpe.encodeTokens(
        split(col("text"), "\\s+"), got).as("subs"))
      .head.getSeq[scala.collection.Seq[String]](0)
    val toks = text.split("\\s+")
    enc.zip(toks).foreach { case (subs, w) =>
      assert(subs.mkString == w, s"lossless: $w")
      assert(subs.toList == refEncode(w, want), s"segmentation of $w")
    }
  }

  test("driver-local fast path and distributed loop learn identical merges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(40)(
      (1 to (2 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    def collectMerges(d: org.apache.spark.sql.DataFrame) =
      d.collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toList
    val local = collectMerges(Bpe.train(df, "text", numMerges = 10))
    val dist = collectMerges(Bpe.train(df, "text", numMerges = 10,
      driverVocabLimit = 0L)) // force the distributed loop
    assert(local == dist)
  }

  test("distributed loop batches merges: jobs stay far below 2 per merge") {
    import spark.implicits._
    // 12 disjoint two-letter words with strictly decreasing counts: one
    // round can safely batch every merge (no shared symbols, no ties)
    val words = (0 until 12).map(i =>
      ("" + ('a' + 2 * i).toChar + ('b' + 2 * i).toChar, 100L - i))
    val text = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val want = refTrain(words.toMap.map { case (w, f) => (w, f) }, 12)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val res = Bpe.train(df, "text", numMerges = 12, driverVocabLimit = 0L)
        .collect()
      Thread.sleep(1500) // listener bus drains async
      res
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(got.sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toList == want)
    // unbatched this loop costs >= 2 jobs x 12 merges (+ setup); the
    // batch does 1 count + 2 rounds x ~2 jobs + the final collect
    assert(jobs.get() < 16, s"expected a batched loop, saw ${jobs.get()} jobs")
  }

  test("non-BMP text: surrogate pairs stay whole in both paths; empty docs count 0") {
    import spark.implicits._
    val word = "a\uD83D\uDE42b" // a + emoji (surrogate pair) + b
    val df = Seq((1L, s"$word $word"), (2L, "  ")).toDF("doc_id", "text")
    // both trainer paths see 3 symbols per word, not 4 UTF-16 units
    val local = Bpe.train(df, "text", numMerges = 2).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toList
    val dist = Bpe.train(df, "text", numMerges = 2, driverVocabLimit = 0L)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toList
    assert(local == dist)
    assert(local.head == ("a", "\uD83D\uDE42"), s"got $local")
    // the encoder reassembles the word losslessly (no '?' corruption)
    val subs = df.filter($"doc_id" === 1L)
      .select(Bpe.encodeTokens(split($"text", "\\s+"), local).as("s"))
      .head.getSeq[scala.collection.Seq[String]](0)
    subs.foreach(ws => assert(ws.mkString == word, s"lossless: $ws"))
    // whitespace-only doc: 0 tokens, 0 subwords, null compression
    val stats = Bpe.encodeStats(df, "doc_id", "text", local)
      .filter($"doc_id" === 2L).head
    assert(stats.getLong(1) == 0L && stats.getLong(2) == 0L && stats.isNullAt(3))
  }

  test("aliased merge routes (two routes to one token string) stay exact in batches") {
    import spark.implicits._
    // Runs of a single letter are the densest alias generator: "aaaa" is
    // reachable via ("aa","aa"), ("aaa","a") AND ("a","aaa"), so applied
    // merges constantly create symbols whose string equals an existing
    // vocab symbol — the exact hole where a batched round could diverge
    // from the sequential reference if created-symbol collisions weren't
    // folded into the safety bound. Mixed letters add cross-pairs whose
    // counts can grow through the alias.
    val rnd = new scala.util.Random(23)
    val words = Seq.fill(80)(
      "a" * (1 + rnd.nextInt(7)) + (if (rnd.nextBoolean()) "b" else "") +
        "a" * rnd.nextInt(5))
    val text = words.flatMap(w => Seq.fill(1 + rnd.nextInt(4))(w)).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val wordFreq = text.split("\\s+").groupBy(identity)
      .map { case (w, a) => w -> a.length.toLong }
    val want = refTrain(wordFreq, 12)
    val got = Bpe.train(df, "text", numMerges = 12, driverVocabLimit = 0L)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toList
    assert(got == want)
  }

  test("encodeStats counts subwords under the learned table") {
    import spark.implicits._
    val df = Seq((1L, "ab ab ab cd"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 1).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == Seq(("a", "b"))) // (a,b) count 4 beats (c,d) count 1
    val stats = Bpe.encodeStats(df, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: 4 tokens -> ab,ab,ab,c,d = 5 subwords; doc 2: 1 -> 1
    assert(stats == Set((1L, 4L, 5L), (2L, 1L, 1L)))
  }
}
