package graft.merge

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.merge.RowMergers.{Incoming, merge}

/** Property-based checks of the merge-function algebra (SURVEY §5):
  * random operation sequences per key, folded through RowMergers.merge,
  * compared against independent naive models of each engine's contract.
  * No SparkSession — the mergers are pure functions.
  */
class MergePropertySpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", LongType),       // versioned / summed column
    StructField("w", StringType)))

  private def row(k: Long, v: java.lang.Long, w: String): Row =
    new GenericRowWithSchema(Array[Any](k, v, w), schema)

  private def desc(me: MergeEngine,
      del: DeleteBehavior = DeleteBehavior.Allow) =
    TableDescriptor(schema, primaryKey = Seq("k"), mergeEngine = me,
      deleteBehavior = del)

  /** One random op against key 1. */
  private case class Op(v: Option[Long], w: String, delete: Boolean,
      retract: Boolean) {
    def incoming: Incoming = Incoming(
      row(1L, v.map(Long.box).orNull, w),
      isDelete = delete, isRetract = retract)
  }

  private val genOp: Gen[Op] = for {
    v <- Gen.option(Gen.choose(-50L, 50L))
    w <- Gen.oneOf("a", "b", "c")
    delete <- Gen.frequency(4 -> false, 1 -> true)
    retract <- Gen.frequency(4 -> false, 1 -> true)
  } yield Op(v, w, delete, retract && !delete)

  private val genOps: Gen[List[Op]] = Gen.listOfN(30, genOp)
    .flatMap(l => Gen.choose(0, 30).map(l.take))

  private def fold(d: TableDescriptor, ops: Seq[Op]): Option[Row] =
    ops.foldLeft(Option.empty[Row])((st, op) => merge(d, st, op.incoming).state)

  private def assertProp(p: Prop): Unit = {
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("default LWW: state equals the last effective write (model check)") {
    val d = desc(MergeEngine.Default)
    assertProp(Prop.forAll(genOps) { ops =>
      val model = ops.foldLeft(Option.empty[Row]) { (st, op) =>
        if (op.retract) st
        else if (op.delete) None
        else Some(op.incoming.row)
      }
      fold(d, ops) == model
    })
  }

  test("default LWW with DeleteBehavior.Ignore: deletes are no-ops") {
    val d = desc(MergeEngine.Default, DeleteBehavior.Ignore)
    assertProp(Prop.forAll(genOps) { ops =>
      fold(d, ops) == fold(d, ops.filterNot(_.delete))
    })
  }

  test("first_row: state is the first insert; later ops never change it") {
    val d = desc(MergeEngine.FirstRow)
    assertProp(Prop.forAll(genOps) { ops =>
      val model = ops.find(op => !op.delete && !op.retract).map(_.incoming.row)
      fold(d, ops) == model
    })
  }

  test("versioned: state is max-by-version, later arrival wins ties, null = -inf") {
    val d = desc(MergeEngine.Versioned("v"))
    assertProp(Prop.forAll(genOps) { ops =>
      val inserts = ops.filter(op => !op.delete && !op.retract)
      val model = inserts.foldLeft(Option.empty[Op]) { (best, op) =>
        best match {
          case None => Some(op)
          case Some(b) =>
            if (op.v.getOrElse(Long.MinValue) >= b.v.getOrElse(Long.MinValue))
              Some(op)
            else best
        }
      }
      fold(d, ops) == model.map(_.incoming.row)
    })
  }

  test("aggregation sum: state sum = inserts - retracts over non-null values") {
    val d = desc(MergeEngine.Aggregation(Map("v" -> AggFunction.Sum)))
    assertProp(Prop.forAll(genOps) { ops =>
      // the model resets at the last delete (delete clears state)
      val tail = {
        val i = ops.lastIndexWhere(_.delete)
        ops.drop(i + 1)
      }
      val contrib = tail.flatMap(op => op.v.map(v => if (op.retract) -v else v))
      val st = fold(d, ops)
      if (tail.isEmpty) st.isEmpty
      else if (st.isEmpty) false
      else {
        val got = Option(st.get.getAs[java.lang.Long]("v")).map(_.longValue)
        if (contrib.isEmpty) got.isEmpty   // all-null inputs keep a null sum
        else got.contains(contrib.sum)
      }
    })
  }

  test("aggregation retraction inverts insertion (sum returns to baseline)") {
    val d = desc(MergeEngine.Aggregation(Map("v" -> AggFunction.Sum)))
    val genVals = Gen.nonEmptyListOf(Gen.choose(-100L, 100L))
    assertProp(Prop.forAll(genVals) { vs =>
      val ins = vs.map(v => Op(Some(v), "a", delete = false, retract = false))
      val rets = vs.map(v => Op(Some(v), "a", delete = false, retract = true))
      val st = fold(d, ins ++ rets)
      st.exists(r => r.getAs[java.lang.Long]("v") == 0L)
    })
  }
}
