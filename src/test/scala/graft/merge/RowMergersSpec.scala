package graft.merge

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.merge.RowMergers.{Incoming, merge}

/** Mirrors the reference merge-engine unit suites:
  * fluss-server/src/test/java/org/apache/fluss/server/kv/rowmerger/
  * {Default,FirstRow,Versioned,Aggregate}RowMergerTest.java.
  */
class RowMergersSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("s", StringType)))

  private def row(k: Long, v: Integer, s: String): Row =
    new GenericRowWithSchema(Array[Any](k, v, s), schema)

  private val lww = TableDescriptor(schema, primaryKey = Seq("k"))

  test("default: insert emits +I") {
    val r = merge(lww, None, Incoming(row(1, 1, "a")))
    assert(r.state.contains(row(1, 1, "a")))
    assert(r.changes == Seq(ChangeType.Insert -> row(1, 1, "a")))
  }

  test("default: update emits -U/+U, keeps new") {
    val r = merge(lww, Some(row(1, 1, "a")), Incoming(row(1, 2, "b")))
    assert(r.state.contains(row(1, 2, "b")))
    assert(r.changes == Seq(
      ChangeType.UpdateBefore -> row(1, 1, "a"),
      ChangeType.UpdateAfter -> row(1, 2, "b")))
  }

  test("default: WAL image suppresses -U") {
    val wal = lww.copy(changelogImage = ChangelogImage.Wal)
    val r = merge(wal, Some(row(1, 1, "a")), Incoming(row(1, 2, "b")))
    assert(r.changes == Seq(ChangeType.UpdateAfter -> row(1, 2, "b")))
  }

  test("default: delete emits -D and clears state; ignore behavior no-ops") {
    val r = merge(lww, Some(row(1, 1, "a")), Incoming(row(1, null, null), isDelete = true))
    assert(r.state.isEmpty)
    assert(r.changes == Seq(ChangeType.Delete -> row(1, 1, "a")))
    val ig = lww.copy(deleteBehavior = DeleteBehavior.Ignore)
    val r2 = merge(ig, Some(row(1, 1, "a")), Incoming(row(1, null, null), isDelete = true))
    assert(r2.state.contains(row(1, 1, "a")) && r2.changes.isEmpty)
    // delete on absent key: no-op
    assert(merge(lww, None, Incoming(row(9, null, null), isDelete = true)).changes.isEmpty)
  }

  test("default: partial update keeps untouched columns") {
    val r = merge(lww, Some(row(1, 1, "a")),
      Incoming(row(1, 5, null), targetColumns = Some(Seq("v"))))
    assert(r.state.contains(row(1, 5, "a")))
  }

  test("default: partial delete nulls targets; row dropped when all non-PK null") {
    val half = merge(lww, Some(row(1, 1, "a")),
      Incoming(row(1, null, null), isDelete = true, targetColumns = Some(Seq("v"))))
    assert(half.state.contains(row(1, null, "a")))
    val full = merge(lww, Some(row(1, null, "a")),
      Incoming(row(1, null, null), isDelete = true, targetColumns = Some(Seq("s"))))
    assert(full.state.isEmpty)
    assert(full.changes.map(_._1) == Seq(ChangeType.Delete))
  }

  test("first_row: keeps first, ignores later writes and deletes") {
    val fr = lww.copy(mergeEngine = MergeEngine.FirstRow)
    val r1 = merge(fr, None, Incoming(row(1, 1, "a")))
    assert(r1.state.contains(row(1, 1, "a")))
    assert(r1.changes == Seq(ChangeType.Insert -> row(1, 1, "a")))
    val r2 = merge(fr, r1.state, Incoming(row(1, 2, "b")))
    assert(r2.state.contains(row(1, 1, "a")) && r2.changes.isEmpty)
    val r3 = merge(fr, r1.state, Incoming(row(1, null, null), isDelete = true))
    assert(r3.state.contains(row(1, 1, "a")) && r3.changes.isEmpty)
  }

  test("versioned: max version wins; ties go to the new row; null = -inf") {
    val vs = lww.copy(mergeEngine = MergeEngine.Versioned("v"),
      deleteBehavior = DeleteBehavior.Ignore)
    val oldRow = row(1, 5, "old")
    assert(merge(vs, Some(oldRow), Incoming(row(1, 4, "less"))).state.contains(oldRow))
    assert(merge(vs, Some(oldRow), Incoming(row(1, 5, "tie"))).state.contains(row(1, 5, "tie")))
    assert(merge(vs, Some(oldRow), Incoming(row(1, 6, "more"))).state.contains(row(1, 6, "more")))
    assert(merge(vs, Some(oldRow), Incoming(row(1, null, "null"))).state.contains(oldRow))
    assert(merge(vs, Some(row(1, null, "null")), Incoming(row(1, 1, "v1")))
      .state.contains(row(1, 1, "v1")))
  }

  test("aggregation: per-field functions with null-skipping") {
    val ag = lww.copy(mergeEngine = MergeEngine.Aggregation(
      Map("v" -> AggFunction.Sum, "s" -> (AggFunction.ListAgg + ":|"))))
    val r1 = merge(ag, None, Incoming(row(1, 2, "a")))
    val r2 = merge(ag, r1.state, Incoming(row(1, 3, "b")))
    assert(r2.state.contains(row(1, 5, "a|b")))
    assert(r2.changes == Seq(
      ChangeType.UpdateBefore -> row(1, 2, "a"),
      ChangeType.UpdateAfter -> row(1, 5, "a|b")))
    val r3 = merge(ag, r2.state, Incoming(row(1, null, null)))
    assert(r3.state.contains(row(1, 5, "a|b"))) // nulls skipped
    // retraction: sum subtracts, listagg unchanged
    val r4 = merge(ag, r3.state, Incoming(row(1, 2, "x"), isRetract = true))
    assert(r4.state.contains(row(1, 3, "a|b")))
    // delete removes the whole row
    val r5 = merge(ag, r4.state, Incoming(row(1, null, null), isDelete = true))
    assert(r5.state.isEmpty && r5.changes.map(_._1) == Seq(ChangeType.Delete))
  }

  test("aggregation field fns: max/min/first/last/bool") {
    import RowMergers.aggField
    assert(aggField(AggFunction.Max, IntegerType, 3, 5, retract = false) == 5)
    assert(aggField(AggFunction.Min, IntegerType, 3, 5, retract = false) == 3)
    assert(aggField(AggFunction.FirstValue, IntegerType, 3, 5, retract = false) == 3)
    assert(aggField(AggFunction.FirstValueIgnoreNulls, IntegerType, null, 5, retract = false) == 5)
    assert(aggField(AggFunction.LastValue, IntegerType, 3, null, retract = false) == null)
    assert(aggField(AggFunction.LastValueIgnoreNulls, IntegerType, 3, null, retract = false) == 3)
    assert(aggField(AggFunction.BoolAnd, BooleanType, true, false, retract = false) == false)
    assert(aggField(AggFunction.BoolOr, BooleanType, false, true, retract = false) == true)
    assert(aggField(AggFunction.Product, IntegerType, 3, 5, retract = false) == 15)
  }
}
