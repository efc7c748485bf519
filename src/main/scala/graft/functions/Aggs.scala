package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Engine aggregate functions missing from `org.apache.spark.sql.functions`.
  *
  * `product` mirrors the reference's FieldProductAgg (fluss-server/.../
  * rowmerger/aggregate/functions/FieldProductAgg.java): null-skipping
  * multiply; null when no non-null input. Implemented as a typed
  * `Aggregator` (exact, order-insensitive up to FP rounding) instead of
  * `exp(sum(ln(x)))`, which breaks on zeros/negatives.
  */
object Aggs {

  private case class ProdBuf(var p: Double, var seen: Boolean)

  private object ProductAgg extends Aggregator[java.lang.Double, ProdBuf, java.lang.Double] {
    def zero: ProdBuf = ProdBuf(1.0, seen = false)
    def reduce(b: ProdBuf, a: java.lang.Double): ProdBuf = {
      if (a != null) { b.p *= a; b.seen = true }
      b
    }
    def merge(x: ProdBuf, y: ProdBuf): ProdBuf =
      ProdBuf(x.p * y.p, x.seen || y.seen)
    def finish(b: ProdBuf): java.lang.Double = if (b.seen) b.p else null
    def bufferEncoder: Encoder[ProdBuf] = Encoders.product[ProdBuf]
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  private lazy val productUdaf = udaf(ProductAgg)

  /** Product of non-null values; null if none. Input cast to double. */
  def product(c: Column): Column = productUdaf(c.cast("double"))
}
