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
}
