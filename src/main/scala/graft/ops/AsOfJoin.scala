package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal AS OF join — an operator Spark has no native form of: each
  * left row is enriched with the LATEST right row whose time is at or
  * before the left row's time, per key. The batch analog of the lookup
  * join's `FOR SYSTEM_TIME AS OF` semantics (SURVEY §2.3 J3) against a
  * versioned/changelog table.
  *
  * Implementation is union + carry-forward, not an inequality join: both
  * sides are tagged and unioned, one window per key ordered by
  * (time, side) carries the last right payload forward, and left rows
  * read the carried value. That is ONE shuffle on the key and an
  * in-partition sort — the same cost as a sort-merge equi-join — where a
  * naive `l.ts >= r.ts` theta-join explodes quadratically and a range
  * join needs binning. Right rows sort before left rows at equal time,
  * so matches are inclusive. AQE handles key skew like any other
  * single-key shuffle.
  */
object AsOfJoin {

  /** Left-outer as-of join. Right payload = right's columns minus `keys`
    * minus `rightTs` (must not collide with left's column names; right
    * rows must be unique per (keys, rightTs) for deterministic results —
    * pre-aggregate otherwise).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == rightTs)
    require(payload.nonEmpty, "right side has no payload columns")
    val collide = payload.filter(left.columns.contains)
    require(collide.isEmpty, s"payload columns collide with left: $collide")
    val leftCols = left.columns.toSeq

    val lU = left.select((keys.map(col) :+ col(leftTs).as("__t") :+
      lit(1).as("__side") :+
      struct(leftCols.map(col): _*).as("__l")).toIndexedSeq: _*)
    val rU = right.select((keys.map(col) :+ col(rightTs).as("__t") :+
      lit(0).as("__side") :+
      struct(payload.map(col): _*).as("__p")).toIndexedSeq: _*)
    val unioned = lU.unionByName(rU, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SQL join semantics: a null key never matches. The window groups
    // null keys into one partition, so the carried payload is masked out
    // for null-key left rows (null-key right rows can only land there).
    val keysNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    unioned
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => when(keysNotNull, col(s"__c.$c")).as(c))).toIndexedSeq: _*)
  }
}
