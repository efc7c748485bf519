package graft.merge

import scala.util.Random

import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core.AggFunction

/** Merge-function algebra (SURVEY §5 test plan): randomized properties of
  * the per-field aggregators, mirroring the reference's
  * FieldAggregator semantics (null-skipping, sum retraction as inverse).
  */
class AggAlgebraSpec extends SparkTestBase {

  private val rnd = new Random(42)

  private def fold(fn: String, dt: DataType, vals: Seq[Any],
      retracts: Seq[Boolean] = Nil): Any = {
    val rs = if (retracts.isEmpty) vals.map(_ => false) else retracts
    // first non-retract row seeds the state (its value, null included —
    // the engine's initial INSERT keeps the full row); aggField folds rest
    var seeded = false
    var acc: Any = null
    vals.zip(rs).foreach { case (v, r) =>
      if (!seeded && !r) { acc = v; seeded = true }
      else if (seeded) acc = RowMergers.aggField(fn, dt, acc, v, r)
    }
    acc
  }

  test("sum: retraction is the inverse of addition") {
    (1 to 50).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(10) + 1)(rnd.nextInt(1000).toLong: Any)
      val y = rnd.nextInt(1000).toLong
      val base = fold(AggFunction.Sum, LongType, xs)
      val roundtrip = RowMergers.aggField(AggFunction.Sum, LongType,
        RowMergers.aggField(AggFunction.Sum, LongType, base, y, retract = false),
        y, retract = true)
      assert(roundtrip == base)
    }
  }

  test("max/min: order-insensitive (fold of any permutation agrees)") {
    (1 to 50).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(10) + 2)(rnd.nextInt(1000): Any)
      val p = rnd.shuffle(xs)
      assert(fold(AggFunction.Max, IntegerType, xs) == fold(AggFunction.Max, IntegerType, p))
      assert(fold(AggFunction.Min, IntegerType, xs) == fold(AggFunction.Min, IntegerType, p))
    }
  }

  test("first_value/last_value: null handling per ignore-nulls variant") {
    val xs: Seq[Any] = Seq(null, 1, null, 2, null)
    assert(fold(AggFunction.FirstValue, IntegerType, xs) == null)
    assert(fold(AggFunction.FirstValueIgnoreNulls, IntegerType, xs) == 1)
    assert(fold(AggFunction.LastValue, IntegerType, xs) == null)
    assert(fold(AggFunction.LastValueIgnoreNulls, IntegerType, xs) == 2)
  }

  test("bool_and/bool_or: null-skipping fold equals library semantics") {
    (1 to 30).foreach { _ =>
      val xs: Seq[Any] = Seq.fill(rnd.nextInt(8) + 1)(
        rnd.nextInt(3) match { case 0 => null; case 1 => true; case 2 => false })
      val nonNull = xs.filter(_ != null).map(_.asInstanceOf[Boolean])
      val expAnd: Any = if (nonNull.isEmpty) xs.lastOption.orNull else nonNull.forall(identity)
      val expOr: Any = if (nonNull.isEmpty) xs.lastOption.orNull else nonNull.exists(identity)
      if (nonNull.nonEmpty) {
        assert(fold(AggFunction.BoolAnd, BooleanType, xs) == expAnd)
        assert(fold(AggFunction.BoolOr, BooleanType, xs) == expOr)
      }
    }
  }

  test("product: null-skipping multiply over doubles") {
    val xs: Seq[Any] = Seq(2.0, null, 3.0, 0.5)
    assert(fold(AggFunction.Product, DoubleType, xs) == 3.0)
  }

  test("listagg: arrival order with custom delimiter") {
    val fn = AggFunction.ListAgg + ":|"
    assert(fold(fn, StringType, Seq("a", "b", null, "c")) == "a|b|c")
  }
}
