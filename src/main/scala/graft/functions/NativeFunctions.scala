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
      })

  /** Register into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftPlans.functionRegistry(spark)
        .registerFunction(id, info, builder)
    }
}
