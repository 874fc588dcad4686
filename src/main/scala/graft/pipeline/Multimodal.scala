package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-friendly decode / feature-extraction
  * scaffolding.
  *
  * The IMAGE modality is decoded for real with `javax.imageio.ImageIO`
  * (in-JDK, headless; PNG/JPEG/BMP/GIF) — [[decodeImage]] /
  * [[extractImageFeatures]] return true pixel dimensions and an exact
  * integer mean luminance. The AUDIO modality is decoded for real with
  * `javax.sound.sampled.AudioSystem` (in-JDK, headless; WAV/AIFF/AU PCM) —
  * [[decodeAudio]] / [[extractAudioFeatures]] return the true sample rate,
  * channel count, frame count and an RMS amplitude computed from the
  * decoded frames. [[extractFeatures]] emits a real histogram feature
  * whenever a payload decodes as either modality. Only VIDEO remains
  * STUBBED (the JDK ships no video codec and this container has no ffmpeg):
  * [[decodeStub]] derives a deterministic fake from the bytes so pipelines
  * are end-to-end testable; swap it for a real decoder (JNI/FFM to ffmpeg)
  * without touching any of the plumbing.
  *
  * Scale notes: media blobs dominate partition size — use
  * `spark.sql.files.maxPartitionBytes` to keep ~128MB per task, and
  * repartition by a content-hash bucket before decode so stragglers (a few
  * giant videos) spread across tasks.
  */
object Multimodal {

  /** Canonical asset schema: id + modality + opaque payload + metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )), nullable = true)
  ))

  /** Feature row produced by decode/extract. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("byte_size", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)
  ))

  val FeatureDim = 16

  /** STUB decoder for the VIDEO modality (the JDK has no video codec):
    * derives a deterministic 16-dim feature from the raw bytes (stable
    * across runs and partitionings) so downstream joins/ANN stages are
    * fully exercisable. Images go through [[decodeImage]] and audio through
    * [[decodeAudio]] instead; undecodable image/audio payloads also fall
    * back here.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    if (payload == null) return null
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + payload(i)
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    // fold the rolling hash into the tail to make features byte-order-sensitive
    out(FeatureDim - 1) += (h & 0xffff).toFloat / 65536.0f
    out
  }

  /** Decoded image properties. `meanLuma` is the exact integer mean of the
    * per-pixel Rec.601 luma `(299*r + 587*g + 114*b) / 1000` (integer
    * division both per pixel and for the mean), so it is reproducible
    * bit-for-bit by any oracle that knows the pixel values.
    */
  case class ImageInfo(width: Int, height: Int, meanLuma: Int)

  /** REAL image decode via in-JDK `javax.imageio.ImageIO` (headless-safe;
    * PNG/JPEG/BMP/GIF). None when the payload is not a decodable image.
    */
  def decodeImage(payload: Array[Byte]): Option[ImageInfo] = {
    if (payload == null) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sum += (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    Some(ImageInfo(w, h, (sum / (w.toLong * h)).toInt))
  }

  /** 16-bin normalized luminance histogram of a decodable image — the real
    * image feature vector (replaces the byte-stub whenever `ImageIO` can
    * decode the payload).
    */
  def imageHistogramFeature(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val hist = new Array[Float](FeatureDim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) + 114 * (rgb & 0xff)) / 1000
        hist((luma * FeatureDim) / 256) += 1f
        x += 1
      }
      y += 1
    }
    val n = (w * h).toFloat
    var i = 0
    while (i < FeatureDim) { hist(i) /= n; i += 1 }
    Some(hist)
  }

  /** Deterministic PNG encode of a solid `gray`-level image (test/bench
    * asset builder — the decode side is codec-agnostic and accepts any
    * PNG/JPEG/BMP/GIF payload).
    */
  def encodeGrayPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decoded audio properties. `rmsAmp` is the root-mean-square of the
    * decoded PCM sample values, rounded half-up to an integer — for
    * constant-amplitude synthetic assets this is EXACTLY the amplitude
    * (n·a²/n = a², and IEEE sqrt of a perfect square is exact), so it is
    * reproducible by any oracle that knows the sample values.
    */
  case class AudioInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, numFrames: Long, rmsAmp: Int)

  /** REAL audio decode via in-JDK `javax.sound.sampled.AudioSystem`
    * (headless; WAV/AIFF/AU containers, signed PCM 8/16-bit). None when the
    * payload is not decodable audio. The container header is parsed and ALL
    * frames are read and folded into the RMS — a truncated payload changes
    * the result.
    */
  def decodeAudio(payload: Array[Byte]): Option[AudioInfo] = {
    if (payload == null) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: UnsupportedAudioFileException => return None
        case _: java.io.IOException => return None
      }
    try {
      val f = ais.getFormat
      val bits = f.getSampleSizeInBits
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED || (bits != 8 && bits != 16))
        return None
      val data = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val nSamples = data.length / bytesPerSample
      var sumSq = 0.0d
      var i = 0
      while (i < nSamples) {
        val v =
          if (bits == 8) data(i).toInt
          else {
            val off = i * 2
            if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        sumSq += v.toDouble * v
        i += 1
      }
      val frames = if (f.getChannels > 0) nSamples / f.getChannels else 0
      val rms = if (nSamples == 0) 0 else math.floor(math.sqrt(sumSq / nSamples) + 0.5).toInt
      Some(AudioInfo(f.getSampleRate.toInt, f.getChannels, bits, frames.toLong, rms))
    } catch { case _: java.io.IOException => None }
    finally ais.close()
  }

  /** 16-bin normalized |amplitude| histogram of decodable audio — the real
    * audio feature vector (replaces the byte-stub whenever `AudioSystem`
    * can decode the payload). Bin i collects samples with
    * `|v| in [i, i+1) · fullScale/16`.
    */
  def audioHistogramFeature(payload: Array[Byte]): Option[Array[Float]] = {
    if (payload == null) return None
    import javax.sound.sampled.{AudioFormat, AudioSystem, UnsupportedAudioFileException}
    val ais =
      try AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      catch {
        case _: UnsupportedAudioFileException => return None
        case _: java.io.IOException => return None
      }
    try {
      val f = ais.getFormat
      val bits = f.getSampleSizeInBits
      if (f.getEncoding != AudioFormat.Encoding.PCM_SIGNED || (bits != 8 && bits != 16))
        return None
      val data = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val nSamples = data.length / bytesPerSample
      if (nSamples == 0) return None
      val fullScale = if (bits == 8) 128 else 32768
      val hist = new Array[Float](FeatureDim)
      var i = 0
      while (i < nSamples) {
        val v =
          if (bits == 8) data(i).toInt
          else {
            val off = i * 2
            if (f.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
            else (data(off + 1) << 8) | (data(off) & 0xff)
          }
        val a = math.min(math.abs(v), fullScale - 1)
        hist((a * FeatureDim) / fullScale) += 1f
        i += 1
      }
      var j = 0
      while (j < FeatureDim) { hist(j) /= nSamples; j += 1 }
      Some(hist)
    } catch { case _: java.io.IOException => None }
    finally ais.close()
  }

  /** Deterministic WAV/PCM-16 mono encode (test/bench asset builder — the
    * decode side is container-agnostic and accepts any WAV/AIFF/AU PCM
    * payload). Written through `AudioSystem.write` so the RIFF container is
    * the JDK's canonical one (44-byte header + little-endian frames).
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(i * 2) = (samples(i) & 0xff).toByte
      bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def contentHash(payload: Array[Byte]): Long = {
    if (payload == null) return 0L
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** Batched decode over partitions: one feature row per asset. The
    * per-partition loop is where a real codec would amortize init cost
    * (model load, decoder context) — exactly once per task, not per row.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    assets.select("asset_id", "modality", "payload").mapPartitions { it =>
      // per-task (not per-row) decoder/context initialization; ImageIO's
      // plugin registry scan happens once per JVM on first use
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val modality = r.getAs[String]("modality")
        // image/audio: REAL decode (luminance / amplitude histogram) when
        // the payload decodes; video (and undecodable bytes): stub
        val feature = modality match {
          case "image" => imageHistogramFeature(payload).getOrElse(decodeStub(payload))
          case "audio" => audioHistogramFeature(payload).getOrElse(decodeStub(payload))
          case _       => decodeStub(payload)
        }
        Row(
          r.getAs[Long]("asset_id"),
          modality,
          if (payload == null) 0L else payload.length.toLong,
          contentHash(payload),
          feature)
      }
    }(enc)
  }

  /** Image-feature schema for [[extractImageFeatures]]: real decoded
    * dimensions + exact integer mean luminance (null for undecodable
    * payloads).
    */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_size", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_luma", IntegerType, nullable = true)
  ))

  /** Batched REAL image decode over partitions via [[decodeImage]]:
    * (asset_id, byte_size, width, height, mean_luma) per asset, nulls when
    * `ImageIO` cannot decode the payload.
    */
  def extractImageFeatures(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(imageFeatureSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val info = decodeImage(payload)
        Row(
          r.getAs[Long]("asset_id"),
          if (payload == null) 0L else payload.length.toLong,
          info.map(i => Int.box(i.width)).orNull,
          info.map(i => Int.box(i.height)).orNull,
          info.map(i => Int.box(i.meanLuma)).orNull)
      }
    }(enc)
  }

  /** Audio-feature schema for [[extractAudioFeatures]]: real decoded stream
    * parameters + frame-exact RMS (nulls for undecodable payloads).
    */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_size", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("num_frames", LongType, nullable = true),
    StructField("rms_amp", IntegerType, nullable = true)
  ))

  /** Batched REAL audio decode over partitions via [[decodeAudio]]:
    * (asset_id, byte_size, sample_rate, channels, num_frames, rms_amp) per
    * asset, nulls when `AudioSystem` cannot decode the payload.
    */
  def extractAudioFeatures(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    assets.select("asset_id", "payload").mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val info = decodeAudio(payload)
        Row(
          r.getAs[Long]("asset_id"),
          if (payload == null) 0L else payload.length.toLong,
          info.map(i => Int.box(i.sampleRate)).orNull,
          info.map(i => Int.box(i.channels)).orNull,
          info.map(i => Long.box(i.numFrames)).orNull,
          info.map(i => Int.box(i.rmsAmp)).orNull)
      }
    }(enc)
  }

  /** Synthesize REAL WAV/PCM-16 assets whose decoded properties are pure
    * integer functions of the id — `sampleRate = 8000 + (id % 5) * 2000`,
    * `frames = 50 + id % 100`, a ±`(id % 1000 + 1)` square wave (whose RMS
    * is exactly the amplitude) — so an oracle can predict the decode output
    * from the id without any audio library.
    */
  def synthesizeWavAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("asset_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val rate = (8000 + (id % 5) * 2000).toInt
        val n = (50 + id % 100).toInt
        val amp = (id % 1000 + 1).toShort
        val samples = Array.tabulate(n)(j => if (j % 2 == 0) amp else (-amp).toShort)
        Row(id, "audio", encodeWavPcm16(rate, samples))
      }
    }(enc)
  }

  /** Synthesize REAL PNG assets whose decoded properties are pure integer
    * functions of the id — `width = 8 + id % 25`, `height = 8 + (id/25) % 25`,
    * solid gray level `id % 256` (= exact mean luma) — so an oracle can
    * predict the decode output from the id without any image library.
    */
  def synthesizePngAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    ids.select(col(idCol).cast("long").as("asset_id")).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 25).toInt
        val h = (8 + (id / 25) % 25).toInt
        Row(id, "image", encodeGrayPng(w, h, (id % 256).toInt))
      }
    }(enc)
  }

  /** Spread assets across `numBuckets` tasks by content hash so a handful of
    * giant payloads don't serialize behind each other on one executor.
    */
  def rebalanceForDecode(assets: DataFrame, numBuckets: Int): DataFrame =
    assets.repartition(numBuckets, pmod(xxhash64(col("payload")), lit(numBuckets)))

  /** Synthesize a deterministic asset table from any binary-free source table
    * (test/bench helper). Payload bytes are md5-derived — pure column
    * expressions (no UDF), so any engine with md5/unhex reproduces them:
    * `payload = unhex(prefix(md5(id||"-0") ++ md5(id||"-1") ++ ..., 2n))`
    * with `n = 64 + id % 192` (max 255 bytes = 16 md5 blocks).
    */
  def synthesizeAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val hexBlocks = concat((0 until 16).map(i =>
      md5(concat(id.cast("string"), lit(s"-$i")))): _*)
    val nBytes = lit(64) + pmod(id, lit(192)).cast("int")
    ids.select(
      id.as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(id, lit(3)) + 1).cast("int")).as("modality"),
      unhex(hexBlocks.substr(lit(1), nBytes * 2)).as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        lit(64).as("width"), lit(64).as("height"),
        lit(1000L).as("duration_ms")).as("meta"))
  }
}
