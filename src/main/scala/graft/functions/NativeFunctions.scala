package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native kernels, so `spark.sql` users get the
  * same scan-speed paths as the Scala API:
  *
  *   graft_dot(a, b)                         — array<double> dot product
  *   graft_sorted_intersect_count(a, b)      — |A ∩ B| of sorted arrays
  *   graft_shingle_hashes(text, n)           — sorted distinct window hashes
  *   graft_simhash_sig(tokens, nBits, md560) — SimHash fingerprint
  *   graft_minhash_sig(gs, k[, seed])        — MinHash signature (deterministic
  *                                             universal-hash params from seed)
  *
  * plus the composed text-analysis scalars (shared tree with the Scala
  * API, so SQL results are bit-identical): graft_token_count,
  * graft_bpeish_count, graft_lang_id, graft_quality_score,
  * graft_repetition_score, graft_fingerprint, graft_normalize,
  * graft_word_ngrams(text, n).
  *
  * Installed by [[graft.plans.GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or per-session via
  * [[NativeFunctions.register]].
  */
object NativeFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def reg(name: String, className: String, usage: String)(
      builder: PartialFunction[Seq[Expression], Expression])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      // 5-arg form: (className, db, name, usage, extended) — the 3-arg
      // overload is (className, db, name) and would garble DESCRIBE
      new ExpressionInfo(className, null, name, usage, ""),
      (exprs: Seq[Expression]) =>
        builder.applyOrElse(exprs, (e: Seq[Expression]) =>
          throw new IllegalArgumentException(
            s"$name: unexpected argument count ${e.length}")))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      reg("graft_dot", classOf[DotProduct].getName,
        "dot product of two array<double> columns") {
        case Seq(a, b) => DotProduct(a, b)
      },
      reg("graft_sorted_intersect_count", classOf[SortedIntersectCount].getName,
        "common-element count of two sorted duplicate-free array<bigint> columns") {
        case Seq(a, b) => SortedIntersectCount(a, b)
      },
      reg("graft_shingle_hashes", classOf[ShingleHashes].getName,
        "sorted distinct xxhash64 hashes of character n-gram windows") {
        case Seq(t, n) => ShingleHashes(t, intLit(n, "n"))
      },
      reg("graft_simhash_sig", classOf[SimHashSig].getName,
        "SimHash fingerprint of an array<string> token column") {
        case Seq(t, n, md) => SimHashSig(t, intLit(n, "nBits"), boolLit(md, "md560"))
      },
      reg("graft_winnow_hashes", classOf[WinnowHashes].getName,
        "distinct winnowing fingerprints (md5-60 k-gram hashes, min per w-window)") {
        case Seq(t, k, w) =>
          WinnowHashes(t, intLit(k, "k"), intLit(w, "w"))
      },
      reg("graft_minhash_sig", classOf[MinHashSig].getName,
        "MinHash signature of an array<bigint> shingle-hash column") {
        case Seq(gs, k) =>
          val (a, b) = MinHashSig.params(intLit(k, "numHashes"))
          MinHashSig(gs, a, b, MinHashSig.P)
        case Seq(gs, k, seed) =>
          val (a, b) = MinHashSig.params(intLit(k, "numHashes"), longLit(seed, "seed"))
          MinHashSig(gs, a, b, MinHashSig.P)
      }) ++ textScalars

  /** The composed text-analysis scalars (pure Column expression trees —
    * [[graft.pipeline.TextAnalysis]]) re-exposed to SQL: the builder
    * rebuilds the same tree over the call-site argument, so SQL and the
    * Scala API share one definition and stay bit-identical.
    */
  private def textScalars
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = {
    import graft.pipeline.TextAnalysis
    import org.apache.spark.sql.{Column, GraftColumn}
    val cls = "graft.pipeline.TextAnalysis"
    def expr1(name: String, usage: String)(f: Column => Column) =
      reg(name, cls, usage) {
        case Seq(t) => GraftColumn.catalystOf(f(GraftColumn.of(t)))
      }
    Seq(
      expr1("graft_token_count", "whitespace token count")(
        TextAnalysis.tokenCount),
      expr1("graft_bpeish_count", "BPE-ish sub-word segment count")(
        TextAnalysis.bpeishTokenCount),
      expr1("graft_lang_id", "heuristic language id (en/de/fr/es/zh/und)")(
        TextAnalysis.langId),
      expr1("graft_quality_score", "document quality score in [0,1]")(
        TextAnalysis.qualityScore),
      expr1("graft_repetition_score", "1 - distinct/total word 3-grams")(
        TextAnalysis.repetitionScore),
      expr1("graft_fingerprint", "xxhash64 of the normalized text")(
        TextAnalysis.fingerprint),
      expr1("graft_normalize", "trimmed, whitespace-collapsed, lowercased text")(
        TextAnalysis.normalize),
      reg("graft_word_ngrams", cls, "space-joined word n-grams") {
        case Seq(t, n) =>
          GraftColumn.catalystOf(
            TextAnalysis.wordNGrams(GraftColumn.of(t), intLit(n, "n")))
      })
  }

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftPlans.functionRegistry(spark)
        .registerFunction(id, info, builder)
    }
}
