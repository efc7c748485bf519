package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** `max_by`/`min_by` with a HASHABLE physical plan: Spark's own
  * `MaxBy`/`MinBy` are declarative aggregates whose buffer carries the
  * payload value, and a non-fixed-width buffer (struct, string) forces
  * `SortAggregate` — every PK materialization paid a per-partition sort
  * of the full scan input just to keep one row per key
  * ([[graft.merge.Materialize]], the engine's hottest aggregation). As a
  * [[TypedImperativeAggregate]] the same collapse plans as
  * `ObjectHashAggregate`: hash map per partition, map-side partial
  * combine intact, spill handled by the operator's sort-based fallback —
  * no up-front sort at any cardinality.
  *
  * Semantics match `max_by`/`min_by` where it matters to the engine:
  * rows with a NULL `order` value never contribute (that's how the merge
  * engines skip retraction rows), and order values are unique per group
  * by construction (they embed the log offset), so tie behavior is
  * never exercised.
  *
  * The buffer is one UnsafeRow of `(order, payload)` — both preserved
  * through serialize (shuffle of partial buffers / spill) verbatim.
  */
case class LatestRow(payload: Expression, order: Expression,
    greatest: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LatestRow.Buffer]
    with BinaryLike[Expression] {

  override def left: Expression = payload
  override def right: Expression = order
  override def nullable: Boolean = true
  override def dataType: DataType = payload.dataType
  override def prettyName: String = if (greatest) "latest_row" else "earliest_row"

  // analysis-time error for unorderable order types (map, ...), matching
  // the built-in max_by instead of a mid-job runtime failure
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(order.dataType, prettyName)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LatestRow =
    copy(payload = newLeft, order = newRight)

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestRow =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): LatestRow =
    copy(inputAggBufferOffset = newOffset)

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(order.dataType)

  // the engine's one hot order type: every PK collapse orders by the
  // __offset long, so the per-row compare skips the interpreted
  // ordering + generic get-boxing for a primitive getLong
  @transient private lazy val longOrder =
    order.dataType == org.apache.spark.sql.types.LongType

  @transient private lazy val project =
    UnsafeProjection.create(Array(order.dataType, payload.dataType))

  /** True when `candidate` (non-null, boxed) beats the buffered row's
    * order value.
    */
  private def beats(candidate: Any, current: UnsafeRow): Boolean =
    if (longOrder) {
      val c = candidate.asInstanceOf[java.lang.Long].longValue
      val cur = current.getLong(0)
      if (greatest) c > cur else c < cur
    } else {
      val c = ordering.compare(candidate, current.get(0, order.dataType))
      if (greatest) c > 0 else c < 0
    }

  override def createAggregationBuffer(): LatestRow.Buffer =
    new LatestRow.Buffer(null)

  override def update(buffer: LatestRow.Buffer,
      input: InternalRow): LatestRow.Buffer = {
    val o = order.eval(input)
    if (o != null && (buffer.row == null || beats(o, buffer.row))) {
      buffer.row = project(InternalRow(o, payload.eval(input))).copy()
    }
    buffer
  }

  /** Row-vs-row variant for merge: buffered order values are non-null by
    * construction (update only stores rows whose order evaluated
    * non-null), so the long fast path reads both sides unboxed.
    */
  private def beatsRow(candidate: UnsafeRow, current: UnsafeRow): Boolean =
    if (longOrder) {
      val c = candidate.getLong(0)
      val cur = current.getLong(0)
      if (greatest) c > cur else c < cur
    } else beats(candidate.get(0, order.dataType), current)

  override def merge(buffer: LatestRow.Buffer,
      other: LatestRow.Buffer): LatestRow.Buffer = {
    if (other.row != null &&
        (buffer.row == null || beatsRow(other.row, buffer.row))) {
      buffer.row = other.row
    }
    buffer
  }

  override def eval(buffer: LatestRow.Buffer): Any =
    if (buffer.row == null) null else buffer.row.get(1, payload.dataType)

  override def serialize(buffer: LatestRow.Buffer): Array[Byte] =
    if (buffer.row == null) Array.emptyByteArray else buffer.row.getBytes

  override def deserialize(bytes: Array[Byte]): LatestRow.Buffer =
    if (bytes.isEmpty) new LatestRow.Buffer(null)
    else {
      val r = new UnsafeRow(2)
      r.pointTo(bytes, bytes.length)
      new LatestRow.Buffer(r)
    }
}

object LatestRow {
  /** Mutable holder so update/merge can replace the row in place. */
  final class Buffer(var row: UnsafeRow)

  import org.apache.spark.sql.{Column, GraftColumn, SparkSession}

  /** The hash plan only materializes if ObjectHashAggregate's sort-based
    * fallback threshold (default: 128 in-memory groups) is raised — a
    * LatestRow buffer is ONE row, so 1M groups is ~row-size*1M per
    * partition, ordinary hash-agg memory. Called by the engine's
    * materialization entry points so EMBEDDER sessions get the hash plan
    * too, not only the repo's own harnesses.
    *
    * The raise is session-wide (Spark has no per-query conf), which also
    * affects OTHER typed-imperative aggregates in the session — e.g. a
    * collect_list over millions of heavy groups loses its early
    * sort-fallback spill protection. Deployments that need the Spark
    * default back opt out with
    * `spark.sql.graft.objectHashFallbackThreshold=""` (or pick their own
    * value via the same key); an explicit non-default setting of the
    * Spark key itself is always respected.
    */
  def ensureHashFallbackThreshold(spark: SparkSession): Unit = {
    val want = spark.conf
      .get("spark.sql.graft.objectHashFallbackThreshold", "1000000").trim
    if (want.nonEmpty) {
      val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
      // Override only when the Spark key is unset, or when its current
      // value is one THIS engine wrote earlier (tracked via a companion
      // tag) — never when the deployment set it explicitly, even to
      // Spark's own default (e.g. 128 on purpose to keep early spill
      // protection for collect_list). Value-sniffing the default would
      // silently trample that choice and break if Spark's default moved.
      val tagKey = "spark.sql.graft.internal.hashFallbackSetByEngine"
      val explicitlySet = spark.conf.getAll.contains(key)
      val setByEngine = spark.conf.getOption(tagKey)
        .exists(tag => spark.conf.getOption(key).contains(tag))
      if (!explicitlySet || setByEngine) {
        spark.conf.set(key, want)
        spark.conf.set(tagKey, want)
      }
    }
  }

  private def wrap(payload: Column, order: Column, greatest: Boolean): Column =
    GraftColumn.of(LatestRow(
      GraftColumn.expressionOf(payload), GraftColumn.expressionOf(order),
      greatest).toAggregateExpression())

  /** Hash-plannable `max_by(payload, order)` (null orders skipped). */
  def latestBy(payload: Column, order: Column): Column =
    wrap(payload, order, greatest = true)

  /** Hash-plannable `min_by(payload, order)` (null orders skipped). */
  def earliestBy(payload: Column, order: Column): Column =
    wrap(payload, order, greatest = false)
}
