package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The actual codec call is STUBBED (no image/audio libraries in this
  * container) behind [[decodeStub]] — a clearly-marked deterministic fake.
  * Everything around it is real and scale-shaped: schema, per-partition
  * batch iteration (mapPartitions over an iterator — the Scala analog of
  * a mapInPandas batch loop; executors never hold more than one batch of
  * blobs), and frame sampling as a generator expression.
  */
object Multimodal {

  /** media metadata struct: (kind, n_bytes, width, height). */
  val metaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Pack a text column into a fake media blob (UTF-8 payload) with typed
    * metadata — stands in for reading real image bytes.
    */
  def packAsMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(lit("image/fake").as("kind"),
        octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        lit(64).as("width"), lit(64).as("height")).as("meta"))

  /** >>> STUB <<< — a real build links an image/audio codec here
    * (e.g. decode + resize + embed). This deterministic fake derives
    * `dim` floats from the blob bytes so the pipeline around it is fully
    * testable: feature j = mean of bytes congruent to j (mod dim), scaled.
    */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val j = i % dim
      sums(j) += (bytes(i) & 0xFF)
      counts(j) += 1
      i += 1
    }
    Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0f else (sums(j).toDouble / counts(j) / 255.0).toFloat)
  }

  /** Feature extraction over the media blobs: per-partition batch loop
    * (constant memory per executor; at 100 TB this is the shape of a GPU
    * feature-extraction stage — batched, columnar in, columnar out).
    */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields.filterNot(_.name == "media") :+
      StructField("features", ArrayType(FloatType)))
    val mediaIdx = inSchema.fieldIndex("media")
    val keepIdx = inSchema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "media" => i
    }
    df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]](mediaIdx)
        val feats = decodeStub(if (blob == null) Array.emptyByteArray else blob, dim)
        new GenericRowWithSchema(
          (keepIdx.map(r.get) :+ feats).toArray[Any], outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** "Resize" the media blob to exactly `targetBytes` by nearest-neighbor
    * resampling of the byte stream (out[i] = in[floor(i*n/target)]) — the
    * byte-level stand-in for an image resize. Same per-partition batch
    * shape as [[extractFeatures]]; a real build swaps the resample loop
    * for a codec resize. Empty blobs stay empty; `meta.n_bytes` tracks the
    * new length.
    */
  def resizeMedia(df: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val inSchema = df.schema
    val mediaIdx = inSchema.fieldIndex("media")
    val metaIdx = inSchema.fieldIndex("meta")
    val resized = df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]](mediaIdx)
        val out =
          if (blob == null || blob.isEmpty) Array.emptyByteArray
          else Array.tabulate(targetBytes)(i =>
            blob((i.toLong * blob.length / targetBytes).toInt))
        val vals = (0 until inSchema.length).map {
          case `mediaIdx` => out
          case i => r.get(i)
        }
        new GenericRowWithSchema(vals.toArray[Any], inSchema): Row
      }
    }(Encoders.row(inSchema))
    resized.withColumn("meta", struct(
      col("meta.kind").as("kind"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      col("meta.width").as("width"), col("meta.height").as("height")))
  }

  /** Frame sampling: slice the blob into fixed-size "frames" and keep every
    * `stride`-th one — a generator (posexplode), so it parallelizes and
    * never materializes all frames of a blob at once downstream of the scan.
    */
  def frameSample(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("media")).cast("double") / frameBytes).cast("int")
    // Guard the generator for empty blobs: sequence(0, -1) in Spark yields
    // the DESCENDING sequence [0, -1], so __n = 0 would emit phantom frames
    // (index 0 survives the stride filter) instead of no rows.
    val frameIdx = when(col("__n") > 0,
      filter(sequence(lit(0), col("__n") - 1), i => i % stride === 0))
      .otherwise(array())
    df.withColumn("__n", nFrames)
      .select(col("media_id"), col("meta"),
        posexplode(transform(frameIdx,
          i => substring(col("media"), (i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")
  }
}
