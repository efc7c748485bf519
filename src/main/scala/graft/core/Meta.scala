package graft.core

/** System / metadata column names and change types.
  *
  * Mirrors the reference's system columns (apache/fluss
  * fluss-common/src/main/java/org/apache/fluss/metadata/TableDescriptor.java:59-70)
  * and change-type encoding (fluss-common/.../record/ChangeType.java:34-58).
  * We model change type as a data column — the same surface the reference's
  * own Spark connector exposes for `t$changelog`.
  */
object Meta {
  val Bucket = "__bucket"
  val Offset = "__offset"
  val Timestamp = "__timestamp"
  val ChangeTypeCol = "_change_type"

  /** Virtual-table metadata column names (TableDescriptor.java:64-66). */
  val LogOffset = "_log_offset"
  val CommitTimestamp = "_commit_timestamp"

  val all: Seq[String] = Seq(Bucket, Offset, Timestamp, ChangeTypeCol)
}

/** Change types, string-encoded exactly like the reference short strings
  * (ChangeType.java: APPEND_ONLY "+A", INSERT "+I", UPDATE_BEFORE "-U",
  * UPDATE_AFTER "+U", DELETE "-D").
  */
object ChangeType {
  val AppendOnly = "+A"
  val Insert = "+I"
  val UpdateBefore = "-U"
  val UpdateAfter = "+U"
  val Delete = "-D"

  /** Rows that contribute to current state (i.e. not retractions). */
  val upserts: Seq[String] = Seq(AppendOnly, Insert, UpdateAfter)
}
