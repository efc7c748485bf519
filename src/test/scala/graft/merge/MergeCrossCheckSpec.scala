package graft.merge

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.core._

/** Randomized cross-check (SURVEY §5): the distributed write+read path
  * (cogroup changelog generation → log → Materialize's SQL collapse,
  * optionally through a snapshot) must agree with a sequential in-memory
  * fold of RowMergers over the same ops. Materialize (hash-agg expressions)
  * and RowMergers (row-at-a-time Scala) are independent implementations of
  * the merge semantics, so agreement here pins both.
  */
class MergeCrossCheckSpec extends SparkTestBase {
  import scala.jdk.CollectionConverters._

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("a", IntegerType),
    StructField("b", StringType),
    StructField("ver", LongType),
    StructField("fl", BooleanType)))

  private lazy val cat =
    new Catalog(Files.createTempDirectory("graft-cc").toString, spark)

  /** Random (row, isDelete) ops over a small keyspace, with nulls. */
  private def randomOps(rnd: Random, n: Int): Seq[(Row, Boolean)] =
    (0 until n).map { _ =>
      val k = rnd.nextInt(12).toLong
      val a: Any = if (rnd.nextInt(8) == 0) null else Int.box(rnd.nextInt(100))
      val b: Any = if (rnd.nextInt(8) == 0) null else "s" + rnd.nextInt(30)
      val ver: Any = if (rnd.nextInt(8) == 0) null else Long.box(rnd.nextInt(50).toLong)
      val fl: Any = if (rnd.nextInt(8) == 0) null else Boolean.box(rnd.nextBoolean())
      (new GenericRowWithSchema(Array[Any](k, a, b, ver, fl), schema): Row,
        rnd.nextInt(6) == 0)
    }

  private type Batch = (Seq[(Row, Boolean)], Option[Seq[String]])

  private def expectedState(desc: TableDescriptor,
      batches: Seq[Batch]): Seq[Row] = {
    var st = Map.empty[Long, Row]
    batches.foreach { case (ops, target) =>
      ops.foreach { case (row, del) =>
        val res = RowMergers.merge(desc, st.get(row.getLong(0)),
          RowMergers.Incoming(row, isDelete = del, targetColumns = target))
        res.state match {
          case Some(r) => st += row.getLong(0) -> r
          case None => st -= row.getLong(0)
        }
      }
    }
    st.values.toSeq
  }

  private def run(name: String, desc: TableDescriptor,
      compactBetween: Boolean, partialBatch: Boolean): Unit = {
    val rnd = new Random(42 + name.hashCode)
    val batches: Seq[Batch] = Seq(
      (randomOps(rnd, 120), None),
      (randomOps(rnd, 80), if (partialBatch) Some(Seq("a")) else None))
    val t = cat.createTable("cc", name + System.nanoTime(), desc)
    val inSchema = StructType(schema.fields ++ Seq(
      StructField("__delete", BooleanType), StructField("ord", LongType)))
    batches.zipWithIndex.foreach { case ((ops, target), i) =>
      val df = spark.createDataFrame(
        ops.zipWithIndex.map { case ((r, del), j) =>
          Row(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), del, j.toLong)
        }.asJava, inSchema)
      t.upsertMixed(df, orderBy = Seq(df("ord")), targetColumns = target)
      if (compactBetween && i == 0) t.compact()
    }
    assertSameRows(t.scan().collect().toSeq, expectedState(desc, batches))
  }

  test("default engine: distributed == sequential (deletes, partial batch)") {
    run("dflt", TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4),
      compactBetween = false, partialBatch = true)
  }

  test("default engine through a snapshot compact") {
    run("dflt_snap", TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4),
      compactBetween = true, partialBatch = true)
  }

  test("default engine, DeleteBehavior.Ignore") {
    run("dflt_ign", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, deleteBehavior = DeleteBehavior.Ignore),
      compactBetween = false, partialBatch = false)
  }

  test("first_row engine: distributed == sequential") {
    run("first", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.FirstRow),
      compactBetween = false, partialBatch = false)
  }

  test("versioned engine: distributed == sequential (null = -inf)") {
    run("ver", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.Versioned("ver"),
      deleteBehavior = DeleteBehavior.Ignore),
      compactBetween = false, partialBatch = false)
  }

  test("aggregation engine: distributed == sequential (sum/listagg/max)") {
    run("agg", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.Aggregation(Map(
        "a" -> AggFunction.Sum,
        "b" -> (AggFunction.ListAgg + ":|"),
        "ver" -> AggFunction.Max))),
      compactBetween = false, partialBatch = false)
  }

  test("aggregation engine through a snapshot compact") {
    run("agg_snap", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.Aggregation(Map(
        "a" -> AggFunction.Sum,
        "b" -> AggFunction.LastValueIgnoreNulls,
        "ver" -> AggFunction.Min))),
      compactBetween = true, partialBatch = false)
  }

  test("default partial update, delete-free: windowed path == sequential") {
    // upsert() (no deletes possible) routes Default+targetColumns through
    // the windowed aggregation mapping — pin it to the sequential fold
    val desc = TableDescriptor(schema, primaryKey = Seq("k"), numBuckets = 4)
    val rnd = new Random(99)
    // batch 1 touches only half the keyspace, so batch 2's partial rows
    // hit BOTH merge cases: existing state (untouched cols keep state
    // values) and no state (untouched cols must store null)
    val full = randomOps(rnd, 120).map { case (r, _) => (r, false) }
      .filter(_._1.getLong(0) < 6)
    val partial = randomOps(rnd, 80).map { case (r, _) => (r, false) }
    val batches: Seq[Batch] = Seq((full, None), (partial, Some(Seq("a", "ver"))))
    val t = cat.createTable("cc", "pwin" + System.nanoTime(), desc)
    val inSchema = StructType(schema.fields :+ StructField("ord", LongType))
    batches.foreach { case (ops, target) =>
      val df = spark.createDataFrame(
        ops.zipWithIndex.map { case ((r, _), j) =>
          Row(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), j.toLong)
        }.asJava, inSchema)
      t.upsert(df, targetColumns = target, orderBy = Seq(df("ord")))
    }
    assertSameRows(t.scan().collect().toSeq, expectedState(desc, batches))
  }

  test("aggregation engine first/bool window forms: distributed == sequential") {
    run("agg_fv", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.Aggregation(Map(
        "a" -> AggFunction.FirstValue,
        "b" -> AggFunction.FirstValueIgnoreNulls,
        "ver" -> AggFunction.LastValue,
        "fl" -> AggFunction.BoolAnd))),
      compactBetween = false, partialBatch = false)
    run("agg_bool", TableDescriptor(schema, primaryKey = Seq("k"),
      numBuckets = 4, mergeEngine = MergeEngine.Aggregation(Map(
        "a" -> AggFunction.Min,
        "fl" -> AggFunction.BoolOr))),
      compactBetween = true, partialBatch = false)
  }

  test("aggregation engine rb64: write-path union == expected value sets") {
    import graft.functions.Bitmaps
    val sch = StructType(Seq(
      StructField("k", LongType), StructField("bm", BinaryType)))
    val desc = TableDescriptor(sch, primaryKey = Seq("k"), numBuckets = 4,
      mergeEngine = MergeEngine.Aggregation(Map("bm" -> AggFunction.Rb64)))
    val rnd = new Random(7)
    val ops = (0 until 150).map(_ => (rnd.nextInt(10).toLong, rnd.nextInt(64).toLong))
    val t = cat.createTable("cc", "rb" + System.nanoTime(), desc)
    val inSchema = StructType(sch.fields :+ StructField("ord", LongType))
    val df = spark.createDataFrame(
      ops.zipWithIndex.map { case ((k, v), i) =>
        Row(k, Bitmaps.build(Seq(v)), i.toLong)
      }.asJava, inSchema)
    t.upsert(df, orderBy = Seq(df("ord")))
    val got = t.scan().collect()
      .map(r => r.getLong(0) -> Bitmaps.toValues(r.getAs[Array[Byte]](1)))
      .toMap
    val exp = ops.groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2).distinct.sorted.toSeq
    }
    assert(got == exp)
    // and the distributed collapse path (Materialize with the agg desc)
    val dist = Materialize.currentState(
      t.changelog()
        .filter(org.apache.spark.sql.functions.col(Meta.ChangeTypeCol) =!=
          ChangeType.UpdateBefore)
        .withColumnRenamed(Meta.LogOffset, Meta.Offset), desc)
    // post-merge images collapse to the same final bitmap per key
    val got2 = dist.collect()
      .map(r => r.getLong(0) -> Bitmaps.toValues(r.getAs[Array[Byte]](1)))
      .toMap
    assert(got2 == exp)
  }
}
