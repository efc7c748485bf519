package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * IMAGE kinds run a REAL codec: javax.imageio ships with the JDK
  * (PNG/JPEG/BMP/GIF), so [[imageFeatures]] and [[resizeImages]] operate
  * on genuine decoded pixels. Audio/video kinds (no JVM codec) and
  * undecodable blobs fall back to [[decodeStub]] — a clearly-marked
  * deterministic fake — so mixed corpora never fail mid-job. Everything
  * around the codec is scale-shaped: per-partition batch iteration
  * (mapPartitions over an iterator — the Scala analog of a mapInPandas
  * batch loop; executors never hold more than one batch of blobs), and
  * frame sampling as a generator expression.
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

  // ---------------------------------------------------------------------
  // REAL image codec path — javax.imageio ships WITH the JDK (PNG, JPEG,
  // BMP, GIF readers/writers; no external libraries), so for image kinds
  // the decode/resize/feature steps below are genuine pixel operations.
  // [[decodeStub]] remains the documented fallback for kinds the JVM has
  // no codec for (audio/video), and for undecodable blobs.
  // ---------------------------------------------------------------------

  /** Decode an image blob with the JDK's registered readers. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else Option(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)))

  /** Per-cell mean luminance over a gridW×gridH partition of the REAL
    * decoded image — a classic tiny visual descriptor (dim = gridW·gridH,
    * each value in [0,1]). Blobs the JVM cannot decode fall back to
    * [[decodeStub]] with the same dimensionality, so mixed corpora never
    * fail mid-job (the row keeps its schema; a `decoded` flag says which
    * path produced it). Same per-partition batch loop as
    * [[extractFeatures]] — the GPU-stage shape, constant memory.
    */
  def imageFeatures(df: DataFrame, gridW: Int = 4, gridH: Int = 4): DataFrame = {
    require(gridW > 0 && gridH > 0, "grid dims must be positive")
    val dim = gridW * gridH
    val inSchema = df.schema
    // replace, not duplicate, the output columns a prior codec stage
    // (e.g. [[resizeImages]]) may already carry
    val dropped = Set("media", "features", "decoded")
    val outSchema = StructType(
      inSchema.fields.filterNot(f => dropped.contains(f.name)) ++
        Seq(StructField("features", ArrayType(FloatType)),
          StructField("decoded", BooleanType)))
    val mediaIdx = inSchema.fieldIndex("media")
    val keepIdx = inSchema.fields.zipWithIndex.collect {
      case (f, i) if !dropped.contains(f.name) => i
    }
    df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]](mediaIdx)
        val (feats, real) = decodeImage(blob) match {
          case Some(img) => (luminanceGrid(img, gridW, gridH), true)
          case None => (decodeStub(
            if (blob == null) Array.emptyByteArray else blob, dim), false)
        }
        new GenericRowWithSchema(
          (keepIdx.map(r.get) ++ Seq(feats, real)).toArray[Any], outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  private def luminanceGrid(img: java.awt.image.BufferedImage,
      gridW: Int, gridH: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](gridW * gridH)
    val counts = new Array[Long](gridW * gridH)
    var y = 0
    while (y < h) {
      val cy = math.min(y * gridH / h, gridH - 1)
      var x = 0
      while (x < w) {
        val cx = math.min(x * gridW / w, gridW - 1)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 0.299 +
          ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
        val c = cy * gridW + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gridW * gridH)(c =>
      if (counts(c) == 0) 0f else (sums(c) / counts(c)).toFloat)
  }

  /** REAL image resize: decode, nearest-neighbor resample to (w, h) —
    * an explicit pixel loop, not a platform-dependent smoothing filter,
    * so the output is deterministic everywhere — and re-encode as PNG
    * (lossless; the JDK writer). Undecodable blobs pass through
    * unchanged. `meta` tracks the new kind/size/dimensions.
    */
  def resizeImages(df: DataFrame, w: Int, h: Int): DataFrame = {
    require(w > 0 && h > 0, "target dims must be positive")
    val inSchema = df.schema
    val mediaIdx = inSchema.fieldIndex("media")
    val midSchema = StructType(inSchema.fields :+
      StructField("__decoded", BooleanType, nullable = false))
    val resized = df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]](mediaIdx)
        val (out, ok) = decodeImage(blob) match {
          case Some(img) =>
            val dst = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              val sy = math.min(y * img.getHeight / h, img.getHeight - 1)
              var x = 0
              while (x < w) {
                val sx = math.min(x * img.getWidth / w, img.getWidth - 1)
                dst.setRGB(x, y, img.getRGB(sx, sy))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            (bos.toByteArray, true)
          case None => (blob, false) // pass through untouched
        }
        val vals = (0 until inSchema.length).map {
          case `mediaIdx` => out
          case i => r.get(i)
        } :+ Boolean.box(ok)
        new GenericRowWithSchema(vals.toArray[Any], midSchema): Row
      }
    }(Encoders.row(midSchema))
    // meta is stamped ONLY for rows the codec actually resized;
    // pass-through rows keep their original metadata (or null if the
    // input carried none) — downstream kind-dispatch must stay truthful
    val newMeta = struct(
      lit("image/png").as("kind"),
      octet_length(col("media")).cast("long").as("n_bytes"),
      lit(w).as("width"), lit(h).as("height"))
    val oldMeta =
      if (inSchema.fieldNames.contains("meta")) col("meta")
      else lit(null).cast(metaType)
    resized
      .withColumn("meta", when(col("__decoded"), newMeta).otherwise(oldMeta))
      .withColumn("decoded", col("__decoded"))
      .drop("__decoded")
  }

  /** Encode a deterministic synthetic RGB image as PNG bytes (test/fixture
    * helper — real pixels through the real codec).
    */
  def syntheticPng(width: Int, height: Int, seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val r = (x * 255 / math.max(width - 1, 1)) & 0xFF
        val g = (y * 255 / math.max(height - 1, 1)) & 0xFF
        val b = (seed * 31 + x * y) & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------------
  // REAL audio codec path — javax.sound.sampled also ships with the JDK
  // (WAV/AIFF/AU readers), so WAV blobs get genuine PCM decoding too.
  // ---------------------------------------------------------------------

  /** Decode an audio blob to MONO 16-bit PCM frames + sample rate —
    * multi-channel input is averaged per frame, so durations and window
    * boundaries are in frames (time), never inflated by channel count.
    */
  def decodeAudio(bytes: Array[Byte]): Option[(Array[Short], Float)] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(bytes)))
      val fmt = in.getFormat
      require(fmt.getSampleSizeInBits == 16, "expect 16-bit PCM")
      val channels = fmt.getChannels
      val raw = in.readAllBytes()
      val bb = java.nio.ByteBuffer.wrap(raw).order(
        if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
        else java.nio.ByteOrder.LITTLE_ENDIAN)
      val frames = raw.length / (2 * channels)
      val mono = new Array[Short](frames)
      var i = 0
      while (i < frames) {
        var s = 0L
        var c = 0
        while (c < channels) { s += bb.getShort(); c += 1 }
        mono(i) = (s / channels).toShort
        i += 1
      }
      Some((mono, fmt.getSampleRate))
    } catch { case _: Exception => None }

  /** Per-window RMS energy over REAL decoded PCM (duration, sample rate,
    * and `windows` energy values in [0,1]) — the standard cheap audio
    * descriptor (silence/clipping detection, energy profiles). WAV/AIFF
    * decode through the JDK; other kinds fall back to [[decodeStub]]
    * with `decoded = false`. Batch-loop shape as everywhere else.
    */
  def audioFeatures(df: DataFrame, windows: Int = 8): DataFrame = {
    require(windows > 0, "windows must be positive")
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields.filterNot(_.name == "media") ++
      Seq(StructField("sample_rate", FloatType),
        StructField("duration_ms", DoubleType),
        StructField("energy", ArrayType(FloatType)),
        StructField("decoded", BooleanType)))
    val mediaIdx = inSchema.fieldIndex("media")
    val keepIdx = inSchema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "media" => i
    }
    df.mapPartitions { it =>
      it.map { r =>
        val blob = r.getAs[Array[Byte]](mediaIdx)
        val (rate, durMs, energy, real) = decodeAudio(blob) match {
          case Some((pcm, sr)) =>
            val e = new Array[Float](windows)
            val per = math.max(1, pcm.length / windows)
            var w = 0
            while (w < windows) {
              val from = w * per
              val until = if (w == windows - 1) pcm.length
                else math.min(pcm.length, from + per)
              var s = 0.0; var i = from
              while (i < until) {
                val v = pcm(i) / 32768.0; s += v * v; i += 1
              }
              e(w) = if (until > from)
                math.sqrt(s / (until - from)).toFloat else 0f
              w += 1
            }
            (sr, pcm.length * 1000.0 / sr, e, true)
          case None =>
            (0f, 0.0, decodeStub(
              if (blob == null) Array.emptyByteArray else blob, windows), false)
        }
        new GenericRowWithSchema(
          (keepIdx.map(r.get) ++ Seq(rate, durMs, energy, real))
            .toArray[Any], outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  /** Encode a deterministic sine-tone WAV (test/fixture helper — real
    * samples through the real codec). Frequency derives from the seed.
    */
  def syntheticWav(millis: Int, seed: Int, sampleRate: Int = 8000): Array[Byte] = {
    val n = sampleRate * millis / 1000
    val freq = 200.0 + (math.abs(seed) % 20) * 40.0
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putShort((math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1,
      true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** One REAL PNG per row (seeded by the id — deterministic bytes), for
    * pipelines/tests that need genuine image blobs without external
    * media files. Same batch-loop shape as the other operators.
    */
  def packSyntheticImages(df: DataFrame, idCol: String,
      width: Int = 32, height: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaType)))
    val idIdx = df.schema.fieldIndex(idCol)
    df.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(idIdx)
        val png = syntheticPng(width, height, seed = id.toInt)
        new GenericRowWithSchema(Array[Any](id, png,
          new GenericRowWithSchema(Array[Any]("image/png", png.length.toLong,
            width, height), metaType)), outSchema): Row
      }
    }(Encoders.row(outSchema))
  }

  // ---------------------------------------------------------------------
  // Generation-time ANALYTIC expectations — the ORACLE side of the codec
  // queries. The synthetic media is drawn from a seed by a closed pixel/
  // sample formula, and both codecs round-trip losslessly (PNG on
  // TYPE_INT_RGB; WAV is raw 16-bit PCM), so the features the pipeline
  // must produce are computable in PURE MATH at generation time — no
  // ImageIO / javax.sound anywhere below. Any codec, resample, or
  // plumbing fault diverges from these numbers. (The reference has no
  // media codecs; this is the mm3/mm4 verification harness.)
  // ---------------------------------------------------------------------

  /** Pure-math replica of `packSyntheticImages(seed) → resizeImages(dstW,
    * dstH) → imageFeatures(gridW, gridH)`: draw formula + nearest-
    * neighbor sampling + luminance grid, accumulation order identical to
    * [[luminanceGrid]] (bit-exact doubles).
    */
  def expectedImageLumSum(seed: Int, srcW: Int = 32, srcH: Int = 16,
      dstW: Int = 8, dstH: Int = 8, gridW: Int = 2, gridH: Int = 2): Double = {
    val sums = new Array[Double](gridW * gridH)
    val counts = new Array[Long](gridW * gridH)
    var y = 0
    while (y < dstH) {
      val cy = math.min(y * gridH / dstH, gridH - 1)
      val sy = math.min(y * srcH / dstH, srcH - 1)
      var x = 0
      while (x < dstW) {
        val cx = math.min(x * gridW / dstW, gridW - 1)
        val sx = math.min(x * srcW / dstW, srcW - 1)
        val r = (sx * 255 / math.max(srcW - 1, 1)) & 0xFF
        val g = (sy * 255 / math.max(srcH - 1, 1)) & 0xFF
        val b = (seed * 31 + sx * sy) & 0xFF
        val lum = (r * 0.299 + g * 0.587 + b * 0.114) / 255.0
        val c = cy * gridW + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    var acc = 0.0
    var c = 0
    while (c < gridW * gridH) {
      acc += (if (counts(c) == 0) 0f
        else (sums(c) / counts(c)).toFloat).toDouble
      c += 1
    }
    acc
  }

  /** Pure-math replica of `syntheticWav(millis, seed) →
    * audioFeatures(windows)`: sine synthesis + windowed RMS, same
    * accumulation order as [[audioFeatures]].
    */
  def expectedAudioEnergySum(seed: Int, millis: Int = 100,
      sampleRate: Int = 8000, windows: Int = 4): Double = {
    val n = sampleRate * millis / 1000
    val freq = 200.0 + (math.abs(seed) % 20) * 40.0
    val pcm = Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freq * i / sampleRate) * 12000).toShort)
    val per = math.max(1, n / windows)
    var acc = 0.0
    var w = 0
    while (w < windows) {
      val from = w * per
      val until = if (w == windows - 1) n else math.min(n, from + per)
      var s = 0.0
      var i = from
      while (i < until) { val v = pcm(i) / 32768.0; s += v * v; i += 1 }
      acc += (if (until > from)
        math.sqrt(s / (until - from)).toFloat else 0f).toDouble
      w += 1
    }
    acc
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
