package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.core.GraftTable

/** V1 streaming sink behind `writeStream.format("graft")` — the write-side
  * twin of [[GraftSource]]: a PK table upserts each micro-batch through its
  * merge engine, a log table appends. Exactly-once without any sink-side
  * state: the micro-batch id commits ATOMICALLY with the offsets in the
  * table's manifest (the same `commitTag` mechanism as
  * [[GraftStream.upsertSink]], the reference's WriterStateManager batch
  * dedup), so a replayed batch after a crash is recognized and skipped —
  * even when the crash hit between the table commit and the streaming
  * checkpoint advance.
  *
  * Options: `path` (table dir), `sink.id` (stable writer identity for
  * replay dedup — distinct writers need distinct ids), optional
  * `write.order-by` (column fixing intra-batch merge order; arrival order
  * otherwise).
  */
final class GraftSink(table: GraftTable, sinkId: String,
    orderBy: Option[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (table.committedBatchId(sinkId).exists(_ >= batchId)) return // replay
    // The incoming frame wraps the micro-batch's executed plan; applying
    // new transformations to it would re-analyze a streaming plan (the
    // standard V1-sink footgun). Rebind through the InternalRow RDD: one
    // deserializer per partition, no driver materialization.
    val spark = data.sparkSession
    val schema = data.schema
    val enc = ExpressionEncoder(schema).resolveAndBind()
    val rows = data.queryExecution.toRdd.mapPartitions { it =>
      val d = enc.createDeserializer()
      it.map(d)
    }
    val fresh = spark.createDataFrame(rows, schema)
    val ord = orderBy.map(c => Seq(col(c))).getOrElse(Nil)
    if (table.desc.isPrimaryKeyTable)
      table.upsert(fresh, orderBy = ord, commitTag = Some(sinkId -> batchId))
    else
      table.append(fresh, orderBy = ord, commitTag = Some(sinkId -> batchId))
  }

  override def name(): String = s"graft[${table.path}]"
  override def schema(): StructType = table.desc.schema
  override def toString: String = name()
}

object GraftSink {
  private[streaming] def create(sqlContext: SQLContext,
      parameters: Map[String, String], outputMode: OutputMode): GraftSink = {
    val get = (k: String) => parameters.collectFirst {
      case (pk, v) if pk.equalsIgnoreCase(k) => v
    }
    val path = get("path").getOrElse(throw new IllegalArgumentException(
      "the graft sink needs a table directory: .format(\"graft\").option(\"path\", dir)"))
    val table = GraftSourceProvider.openTable(sqlContext.sparkSession, path)
    // Writer identity for replay dedup: explicit `sink.id`, else derived
    // from the query's checkpoint location — the natural per-query
    // identity (one checkpoint = one batchId sequence), which makes
    // `writeStream.toTable(...)` work with just `checkpointLocation` the
    // way the reference documents it (engine-spark/structured-streaming
    // .md:24-56). Two queries sharing a checkpoint dir is already
    // undefined behavior in Spark, so the derived id cannot collide.
    val sinkId = get("sink.id")
      .orElse(get("checkpointLocation").map("ckpt:" + _))
      .getOrElse(throw new IllegalArgumentException(
        "the graft sink needs a stable writer id: .option(\"sink.id\", ...) " +
          "or a checkpointLocation (replayed micro-batches dedup per sink id)"))
    require(outputMode != OutputMode.Complete(),
      "graft sink supports Append/Update output modes (the merge engine " +
        "folds updates; Complete-mode full rewrites belong to batch writes)")
    new GraftSink(table, sinkId, get("write.order-by"))
  }
}
