package graft.connector

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-exposed `bucket` V2 function — the engine's row→bucket
  * assignment ([[graft.core.GraftTable]]'s write-side `pmod(hash(keys),
  * numBuckets)`, the reference's key hashing in
  * fluss-client/.../write/HashBucketAssigner.java) published through
  * Spark's `FunctionCatalog` so the planner can PROVE two scans are
  * co-partitioned: a reported `KeyGroupedPartitioning` over
  * `bucket(numBuckets, keys...)` resolves here, and two graft tables
  * bucketed with the same key types and bucket count compare as the SAME
  * function (`canonicalName`), which is what lets a storage-partitioned
  * join elide both exchanges.
  *
  * Also callable directly from SQL (`SELECT cat.bucket(16, k)`), where it
  * must — and does — reproduce the writer's assignment exactly: Spark's
  * Murmur3 `hash()` fold (seed 42, null inputs skipped) followed by a
  * positive modulus.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, key[, key...]): the engine's bucket id for a key " +
      "(pmod(hash(keys), numBuckets), Spark Murmur3 seed 42)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      s"bucket takes (numBuckets, key[, key...]); got $inputType")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is the INT bucket count; got " +
        s"${inputType.fields.head.dataType.catalogString}")
    GraftBucketBound(inputType.fields.drop(1).map(_.dataType))
  }
}

/** Bound form: hashes the key columns exactly like the write path.
  * `canonicalName` carries the key TYPES — Murmur3 hashes an int and a
  * long to different values, so buckets computed over different key
  * types must never satisfy each other's co-partitioning.
  */
final case class GraftBucketBound(keyTypes: Array[DataType])
    extends ScalarFunction[Integer] {

  override def inputTypes(): Array[DataType] = IntegerType +: keyTypes

  override def resultType(): DataType = IntegerType

  // a NULL bucket count yields NULL (SQL-callable surface); key NULLs
  // fold as no-ops like the write path, never nulling the result
  override def isResultNullable: Boolean = true

  override def name(): String = "bucket"

  override def canonicalName(): String =
    s"graft.bucket(${keyTypes.map(_.catalogString).mkString(",")})"

  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(0)) return null
    val nb = input.getInt(0)
    require(nb > 0, s"bucket count must be positive; got $nb")
    var h = 42L // Spark's hash() seed; null inputs leave the fold unchanged
    var i = 0
    while (i < keyTypes.length) {
      if (!input.isNullAt(i + 1))
        h = Murmur3HashFunction.hash(input.get(i + 1, keyTypes(i)),
          keyTypes(i), h)
      i += 1
    }
    val r = h.toInt % nb
    Int.box(if (r < 0) r + nb else r)
  }
}
