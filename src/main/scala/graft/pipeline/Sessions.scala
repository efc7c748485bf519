package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization over an event stream — the per-user activity grouping
  * a behavioral training pipeline derives features from.
  *
  * Uses Spark's native `session_window` (gap-based merging): one hash
  * aggregation keyed by (key, merged-window), no per-key sort window —
  * at scale this is a single shuffle on the session key with map-side
  * partial merging, and the same expression works unchanged under
  * Structured Streaming with a watermark (T5 semantics). A new session
  * starts when the gap since the previous event is >= `gap`.
  */
object Sessions {

  /** Per-session stats: key, session_start (first event time), n_events,
    * session_value (sum of `valueCol`).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: String): DataFrame =
    df.groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("session_value"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))

  /** Ordered funnel analysis: for each step i, the number of users who
    * performed `steps(0) .. steps(i)` as a strictly time-ordered
    * subsequence (the classic conversion funnel). Output one row per
    * step: (step, event_type, n_users), step 0-based.
    *
    * Shape at scale: the sequential "earliest step-i event AFTER the
    * user's step-(i-1) time" mins are all unbounded window aggregates
    * over the SAME `partitionBy(user)` — Catalyst plans one hash-partition
    * exchange and chains the window operators without re-shuffling, so
    * the whole funnel costs a single shuffle of the (projected) event
    * stream regardless of step count, then collapses to one row per user
    * before the driver-size step counts.
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
    val stepTimes = steps.zipWithIndex.foldLeft(
      df.select(col(userCol), col(tsCol), col(typeCol))) {
      case (acc, (step, i)) =>
        // strictly-after: a row matching two consecutive steps at the
        // same timestamp cannot satisfy both; null previous time
        // propagates (user never reached step i-1 -> never reaches i)
        val cond = if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(tsCol) > col(s"__t${i - 1}")
        acc.withColumn(s"__t$i", min(when(cond, col(tsCol))).over(w))
    }
    // collapse to one row per user (the step times are per-user window
    // constants), then one global conditional count per step — always
    // exactly steps.length output rows, zero-user steps included
    val perUserAggs = steps.indices.map(i => max(col(s"__t$i")).as(s"__t$i"))
    val perUser = stepTimes.groupBy(col(userCol))
      .agg(perUserAggs.head, perUserAggs.tail: _*)
    val countAggs = steps.indices.map(i =>
      sum(when(col(s"__t$i").isNotNull, 1L).otherwise(0L)).as(s"__c$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    counts.select(explode(array(steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i.toLong).as("step"), lit(name).as("event_type"),
        coalesce(col(s"__c$i"), lit(0L)).as("n_users"))
    }: _*)).as("r")).select(col("r.step"), col("r.event_type"), col("r.n_users"))
  }

  /** Weekly cohort retention: users cohorted by the ISO week of their
    * first event; for each (cohort, week offset) the number of cohort
    * users active that week. The standard retention triangle.
    *
    * Shape at scale: events collapse map-side to distinct (user, week)
    * pairs before any join; the per-user cohort is a tiny aggregate of
    * that table, co-partitioned on user for the join back. No window
    * over the raw event stream.
    */
  def retention(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = df
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("__wk"))
      .distinct()
    val cohorts = active.groupBy(col(userCol))
      .agg(min(col("__wk")).as("cohort_week"))
    active.join(cohorts, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
