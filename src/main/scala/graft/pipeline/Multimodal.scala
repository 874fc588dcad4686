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
  * integer mean luminance. The AUDIO modality is decoded for real — a
  * direct RIFF/WAV PCM container parse on the hot path (zero-copy sample
  * view; see [[decodePcm]]) with an in-JDK
  * `javax.sound.sampled.AudioSystem` fallback for AIFF/AU —
  * [[decodeAudio]] / [[extractAudioFeatures]] return the true sample rate,
  * channel count, frame count and an RMS amplitude computed from the
  * decoded frames. The VIDEO modality is decoded for real for
  * uncompressed-DIB AVI (an in-house RIFF container parser + BI_RGB frame
  * interpretation — the one video format needing zero codecs) —
  * [[decodeVideo]] / [[extractVideoFeatures]] return true dimensions, fps,
  * frame count and per-sampled-frame mean luma. [[extractFeatures]] emits a
  * real histogram feature whenever a payload decodes as any modality.
  * COMPRESSED video codecs remain out of scope (the JDK ships none and this
  * container has no ffmpeg): such payloads fall back to [[decodeStub]]'s
  * deterministic byte-derived feature, so pipelines stay end-to-end
  * testable; swap in a JNI/FFM decoder without touching the plumbing.
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

  /** `ImageIO.read` over a MEMORY-cached image stream. The
    * `read(InputStream)` convenience wraps its argument via the registry's
    * default `ImageInputStream`, which is FILE-cache-backed
    * (`ImageIO.getUseCache` defaults to true): every decode creates, writes
    * and deletes a temp-dir spill file — pure overhead for payloads already
    * in memory, and a filesystem contention point when a whole executor's
    * worth of tasks decodes concurrently. Payloads here are always byte
    * arrays, so the in-memory stream is strictly cheaper.
    */
  private def readImageInMemory(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // ImageIO.read closes the stream itself once a reader claims it; a bare
    // second close throws IOException("closed") out of the finally block,
    // REPLACING the successful result — tolerate the double-close
    try javax.imageio.ImageIO.read(iis)
    finally { try iis.close() catch { case _: java.io.IOException => () } }
  }

  /** PNG encode through a MEMORY-cached output stream (same rationale as
    * [[readImageInMemory]] — `ImageIO.write(img, fmt, OutputStream)` spills
    * through a temp file by default).
    */
  private def writePngInMemory(img: java.awt.image.BufferedImage,
      bos: java.io.OutputStream): Unit = {
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val ok = javax.imageio.ImageIO.write(img, "png", ios)
      require(ok, "no PNG writer available")
    } finally ios.close()
    // close() NOT guarded here, unlike the read side: ImageIO.write does
    // not close the output stream, and close() IS the flush — swallowing
    // its IOException would return truncated PNG bytes as if valid
  }

  /** REAL image decode via in-JDK `javax.imageio.ImageIO` (headless-safe;
    * PNG/JPEG/BMP/GIF). None when the payload is not a decodable image.
    */
  def decodeImage(payload: Array[Byte]): Option[ImageInfo] = {
    if (payload == null) return None
    val img =
      try readImageInMemory(payload)
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
      try readImageInMemory(payload)
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
    writePngInMemory(img, bos)
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

  /** Decoded signed-PCM handle shared by the audio folds: `sample(i)` is
    * the i-th signed sample value. The fast WAV path hands out a view over
    * the ORIGINAL payload bytes (zero copy); the `AudioSystem` fallback
    * wraps the stream-decoded buffer.
    */
  private[pipeline] final class PcmSamples(
      val bits: Int, val sampleRate: Int, val channels: Int,
      data: Array[Byte], off: Int, val nSamples: Int, bigEndian: Boolean) {
    def sample(i: Int): Int =
      if (bits == 8) data(off + i).toInt
      else {
        val o = off + i * 2
        if (bigEndian) (data(o) << 8) | (data(o + 1) & 0xff)
        else (data(o + 1) << 8) | (data(o) & 0xff)
      }
  }

  /** Decode a payload to signed PCM, accepting exactly what the previous
    * per-function `AudioSystem` gate accepted (signed PCM, 8 or 16 bits):
    *
    *  - RIFF/WAVE payloads take the DIRECT container parse below — a chunk
    *    walk to `fmt `/`data` plus an in-place sample view, no stream
    *    stack, no provider lookup, no buffer copy. Measured ~6× on the
    *    dedup rehearsals, where per-payload `AudioSystem` dominated.
    *    WAV PCM is accepted at 16-bit only — 8-bit WAV is UNSIGNED by
    *    spec, which the `AudioSystem` gate also rejected (PCM_SIGNED
    *    check), and non-PCM format tags (float/alaw/mulaw/extensible) are
    *    rejected the same way the stream decoder's encoding check did.
    *  - everything else (AIFF, AU — big-endian signed PCM containers)
    *    falls back to `AudioSystem`, keeping the accepted-format set
    *    container-agnostic.
    *
    * None when the payload is not decodable signed PCM either way. ALL
    * frames are materialized behind the handle — a truncated payload
    * changes downstream folds (the WAV path clamps the `data` chunk to
    * the payload, which is what stream EOF did).
    */
  private[pipeline] def decodePcm(payload: Array[Byte]): Option[PcmSamples] = {
    if (payload == null) return None
    if (payload.length >= 12 &&
        payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' && payload(3) == 'F' &&
        payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') {
      // ---- direct RIFF/WAVE walk (same chunk discipline as decodeVideo's
      // AVI parser: size sanity, word alignment, crafted headers -> None).
      // Chunk sizes are UNSIGNED 32-bit and untrusted: all offset
      // arithmetic runs in Long so a near-2^32 declared size can neither
      // wrap negative nor march the cursor past the payload
      def le16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
      def le32u(o: Int): Long =
        ((payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
          ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)).toLong &
          0xffffffffL
      var fmtTag = -1; var chans = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var o = 12L
      while (o + 8 <= payload.length) {
        val oi = o.toInt
        val size = le32u(oi + 4)
        val id = new String(payload, oi, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (id == "fmt " && size >= 16 && oi + 24 <= payload.length) {
          fmtTag = le16(oi + 8)
          chans = le16(oi + 10)
          rate = le32u(oi + 12).toInt
          bits = le16(oi + 22)
        } else if (id == "data" && dataOff < 0) {
          dataOff = oi + 8
          // clamp to the payload: stream decoders stop at EOF on
          // truncated files, and the fold must see the same samples
          dataLen = math.max(0L, math.min(size,
            (payload.length - dataOff).toLong)).toInt
        }
        o += 8L + size + (size & 1L) // chunks are word-aligned
      }
      if (fmtTag == 1 && chans >= 1 && rate > 0) {
        // chans/rate sanity mirrors the stream decoder, which rejects
        // zero-channel or garbage-rate headers as unsupported
        if (bits == 16 && dataOff >= 0)
          Some(new PcmSamples(16, rate, chans, payload, dataOff, dataLen / 2,
            bigEndian = false))
        else None // plain-PCM WAV but not 16-bit signed — stream gate rejected too
      } else
        // non-plain format tag (extensible 0xFFFE, float, alaw, ...) or no
        // fmt chunk: defer to the stream decoder, which accepts
        // WAVE_FORMAT_EXTENSIBLE PCM (reported as PCM_SIGNED) and rejects
        // the rest — behavior-identical to the pre-fast-path gate
        slowDecodePcm(payload)
    } else slowDecodePcm(payload) // AIFF/AU (and exotica)
  }

  /** The in-JDK stream-decoder path of [[decodePcm]] (AIFF/AU containers,
    * plus WAVs whose format tag the direct parser does not handle).
    */
  private def slowDecodePcm(payload: Array[Byte]): Option[PcmSamples] = {
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
      Some(new PcmSamples(bits, f.getSampleRate.toInt, f.getChannels,
        data, 0, data.length / (bits / 8), f.isBigEndian))
    } catch { case _: java.io.IOException => None }
    finally ais.close()
  }

  /** REAL audio decode — direct RIFF/WAV PCM parse with an `AudioSystem`
    * fallback for AIFF/AU (see [[decodePcm]]). None when the payload is
    * not decodable signed PCM. ALL frames fold into the RMS — a truncated
    * payload changes the result.
    */
  def decodeAudio(payload: Array[Byte]): Option[AudioInfo] =
    decodePcm(payload).map { pcm =>
      var sumSq = 0.0d
      var i = 0
      while (i < pcm.nSamples) {
        val v = pcm.sample(i)
        sumSq += v.toDouble * v
        i += 1
      }
      val frames = if (pcm.channels > 0) pcm.nSamples / pcm.channels else 0
      val rms =
        if (pcm.nSamples == 0) 0
        else math.floor(math.sqrt(sumSq / pcm.nSamples) + 0.5).toInt
      AudioInfo(pcm.sampleRate, pcm.channels, pcm.bits, frames.toLong, rms)
    }

  /** 16-bin normalized |amplitude| histogram of decodable audio — the real
    * audio feature vector (replaces the byte-stub whenever [[decodePcm]]
    * can decode the payload). Bin i collects samples with
    * `|v| in [i, i+1) · fullScale/16`.
    */
  def audioHistogramFeature(payload: Array[Byte]): Option[Array[Float]] =
    decodePcm(payload).flatMap { pcm =>
      if (pcm.nSamples == 0) None
      else {
        val fullScale = if (pcm.bits == 8) 128 else 32768
        val hist = new Array[Float](FeatureDim)
        var i = 0
        while (i < pcm.nSamples) {
          val a = math.min(math.abs(pcm.sample(i)), fullScale - 1)
          hist((a * FeatureDim) / fullScale) += 1f
          i += 1
        }
        var j = 0
        while (j < FeatureDim) { hist(j) /= pcm.nSamples; j += 1 }
        Some(hist)
      }
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

  /** Decoded video properties: container-level stream parameters plus the
    * exact integer mean luma of every frame (same Rec.601 integer formula as
    * [[decodeImage]], so a uniform-gray frame's mean luma IS its gray level).
    */
  case class VideoInfo(
      width: Int, height: Int, fps: Int, numFrames: Int, frameLumas: Array[Int])

  /** REAL video decode for uncompressed-DIB AVI (RIFF 'AVI ' container,
    * 'vids' stream, BI_RGB 24-bit bottom-up frames in '00db'/'00dc' chunks)
    * — the one video format decodable with zero codecs, hence zero
    * dependencies. The container walk is a real RIFF parser (chunk sizes,
    * LIST recursion, word alignment), frame pixels are interpreted from the
    * DIB layout (BGR byte order, rows padded to 4 bytes, bottom-up), and
    * fps comes from the stream header's rate/scale rational. COMPRESSED
    * codecs (H.264 & co.) remain out of scope: the JDK ships none and this
    * container has no ffmpeg — swap this for a JNI/FFM decoder without
    * touching the plumbing. None for anything that is not such an AVI.
    */
  def decodeVideo(payload: Array[Byte]): Option[VideoInfo] = {
    if (payload == null || payload.length < 24) return None
    def le32(o: Int): Int =
      (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
        ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    def fourcc(o: Int): String =
      new String(payload.slice(o, o + 4), java.nio.charset.StandardCharsets.US_ASCII)
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return None
    var width = 0; var height = 0; var rate = 0; var scale = 1; var bitCount = 0
    val lumas = scala.collection.mutable.ArrayBuffer.empty[Int]

    def frameLuma(off: Int, size: Int): Option[Int] = {
      // Long math + sanity bounds: a crafted header declaring huge dims
      // would overflow `rowSize * height` in Int (e.g. 24 * 2^29 ≡ 0) and
      // drive the pixel loop past the payload — untrusted corpus bytes must
      // decode to None, never crash the task
      if (width <= 0 || height <= 0 || bitCount != 24) return None
      if (width > (1 << 16) || height > (1 << 16)) return None
      val rowSize = (width * 3 + 3) & ~3
      if (size.toLong < rowSize.toLong * height) return None
      var sum = 0L
      var y = 0
      while (y < height) {
        // bottom-up: DIB row y is image row (height-1-y); mean is row-order
        // independent, so walk storage order
        val row = off + y * rowSize
        var x = 0
        while (x < width) {
          val b = payload(row + x * 3) & 0xff
          val g = payload(row + x * 3 + 1) & 0xff
          val r = payload(row + x * 3 + 2) & 0xff
          sum += (299 * r + 587 * g + 114 * b) / 1000
          x += 1
        }
        y += 1
      }
      Some((sum / (width.toLong * height)).toInt)
    }

    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fourcc(o)
        val size = le32(o + 4)
        if (size < 0 || o + 8 + size > end) return
        id match {
          case "LIST" => walk(o + 12, o + 8 + size) // skip the list type tag
          case "strh" if size >= 32 && fourcc(o + 8) == "vids" =>
            scale = math.max(le32(o + 8 + 20), 1)
            rate = le32(o + 8 + 24)
          case "strf" if size >= 40 && bitCount == 0 =>
            width = le32(o + 8 + 4)
            height = le32(o + 8 + 8)
            bitCount = le32(o + 8 + 14) & 0xffff
          case c if c.endsWith("db") || c.endsWith("dc") =>
            frameLuma(o + 8, size).foreach(lumas += _)
          case _ => ()
        }
        o += 8 + size + (size & 1) // chunks are word-aligned
      }
    }
    try {
      walk(12, payload.length)
      if (width <= 0 || height <= 0 || lumas.isEmpty) None
      else Some(VideoInfo(width, height, rate / scale, lumas.length, lumas.toArray))
    } catch {
      // torn/crafted containers must land on the undecodable path, same as
      // the ImageIO/AudioSystem decoders
      case _: IndexOutOfBoundsException | _: ArithmeticException => None
    }
  }

  /** 16-bin normalized luminance histogram over ALL decoded frames of an
    * uncompressed-DIB AVI — the real video feature vector (replaces the
    * byte-stub whenever [[decodeVideo]] can parse the payload). Uniform-gray
    * synthetic frames land one full bin per frame, so the histogram is
    * oracle-predictable.
    */
  def videoHistogramFeature(payload: Array[Byte]): Option[Array[Float]] =
    decodeVideo(payload).map { info =>
      val hist = new Array[Float](FeatureDim)
      info.frameLumas.foreach(l => hist((l * FeatureDim) / 256) += 1f)
      var i = 0
      while (i < FeatureDim) { hist(i) /= info.numFrames; i += 1 }
      hist
    }

  /** Deterministic uncompressed-DIB AVI encode: one solid-gray 24-bit frame
    * per entry of `grays` (test/bench asset builder — the decode side
    * accepts any BI_RGB AVI). The container is a spec-complete RIFF: avih,
    * a 'vids'/'DIB ' stream header with the fps as rate/scale, the
    * BITMAPINFOHEADER, and '00db' frame chunks with 4-byte-padded rows.
    */
  def encodeGrayAvi(width: Int, height: Int, fps: Int, grays: Array[Int]): Array[Byte] = {
    val rowSize = (width * 3 + 3) & ~3
    val frameSize = rowSize * height
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
      bos.write((v >> 16) & 0xff); bos.write((v >> 24) & 0xff)
    }
    def tag(s: String): Unit = bos.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val moviSize = 4 + grays.length * (8 + frameSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    tag("RIFF"); le32(riffSize); tag("AVI ")
    tag("LIST"); le32(hdrlSize); tag("hdrl")
    tag("avih"); le32(56)
    le32(1000000 / math.max(fps, 1)) // dwMicroSecPerFrame
    le32(frameSize * fps)            // dwMaxBytesPerSec
    le32(0); le32(0)                 // padding, flags
    le32(grays.length)               // dwTotalFrames
    le32(0); le32(1)                 // initial frames, streams
    le32(frameSize)                  // suggested buffer
    le32(width); le32(height)
    le32(0); le32(0); le32(0); le32(0) // reserved
    tag("LIST"); le32(strlSize); tag("strl")
    tag("strh"); le32(56)
    tag("vids"); tag("DIB ")
    le32(0); le32(0); le32(0)        // flags, prio+lang, initial frames
    le32(1); le32(fps)               // dwScale, dwRate → fps/1
    le32(0); le32(grays.length)      // start, length
    le32(frameSize); le32(-1); le32(0) // suggested buffer, quality, sample size
    le32(0); le32(0)                 // rcFrame (4 × 16-bit)
    tag("strf"); le32(40)
    le32(40); le32(width); le32(height)
    le32(1 | (24 << 16))             // biPlanes=1, biBitCount=24
    le32(0)                          // BI_RGB
    le32(frameSize)
    le32(0); le32(0); le32(0); le32(0)
    tag("LIST"); le32(moviSize); tag("movi")
    grays.foreach { gray =>
      tag("00db"); le32(frameSize)
      val row = new Array[Byte](rowSize)
      java.util.Arrays.fill(row, 0, width * 3, gray.toByte)
      var y = 0
      while (y < height) { bos.write(row); y += 1 }
    }
    bos.toByteArray
  }

  /** Video-feature schema for [[extractVideoFeatures]]: one row per SAMPLED
    * frame with the container/stream parameters and that frame's exact
    * integer mean luma (a single all-null row for undecodable payloads).
    */
  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("fps", IntegerType, nullable = true),
    StructField("num_frames", IntegerType, nullable = true),
    StructField("frame_idx", IntegerType, nullable = true),
    StructField("mean_luma", IntegerType, nullable = true)
  ))

  /** Batched REAL video decode over partitions via [[decodeVideo]], with
    * FRAME SAMPLING: every `frameStride`-th frame (from frame 0) emits a
    * row — the decode/frame-sample step of a video training-data pipeline.
    * Per-task iteration amortizes decoder init exactly like the image/audio
    * paths; undecodable payloads yield one all-null row so no asset is
    * silently dropped.
    */
  def extractVideoFeatures(assets: DataFrame, frameStride: Int = 1): DataFrame = {
    require(frameStride > 0, s"frameStride must be positive, got $frameStride")
    val enc = RowEncoder.encoderFor(videoFeatureSchema)
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "payload")).mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getAs[Long]("asset_id")
        decodeVideo(r.getAs[Array[Byte]]("payload")) match {
          case None => Iterator.single(Row(id, null, null, null, null, null, null))
          case Some(v) =>
            Iterator.range(0, v.numFrames, frameStride).map(f =>
              Row(id, Int.box(v.width), Int.box(v.height), Int.box(v.fps),
                Int.box(v.numFrames), Int.box(f), Int.box(v.frameLumas(f))))
        }
      }
    }(enc)
  }

  /** Synthesize REAL uncompressed-DIB AVI assets whose decoded properties
    * are pure integer functions of the id — `width = 16 + (id % 4) * 8`,
    * `height = 8 + (id % 5) * 4`, `fps = 5 + id % 10`,
    * `frames = 2 + id % 6`, frame f solid gray `(id * 31 + f * 17) % 256`
    * (= that frame's exact mean luma) — so an oracle can predict the decode
    * output from the id without any video library.
    */
  def synthesizeAviAssets(spark: SparkSession, ids: DataFrame, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    graft.pipeline.Parallelize.widen(
      ids.select(col(idCol).cast("long").as("asset_id"))).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (16 + (id % 4) * 8).toInt
        val h = (8 + (id % 5) * 4).toInt
        val fps = (5 + id % 10).toInt
        val n = (2 + id % 6).toInt
        val grays = Array.tabulate(n)(f => ((id * 31 + f * 17) % 256).toInt)
        Row(id, "video", encodeGrayAvi(w, h, fps, grays))
      }
    }(enc)
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
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "modality", "payload")).mapPartitions { it =>
      // per-task (not per-row) decoder/context initialization; ImageIO's
      // plugin registry scan happens once per JVM on first use
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val modality = r.getAs[String]("modality")
        // image/audio/video: REAL decode (luminance / amplitude / per-frame
        // luminance histogram) when the payload decodes; undecodable bytes
        // (incl. compressed video codecs): deterministic byte-stub
        val feature = modality match {
          case "image" => imageHistogramFeature(payload).getOrElse(decodeStub(payload))
          case "audio" => audioHistogramFeature(payload).getOrElse(decodeStub(payload))
          case "video" => videoHistogramFeature(payload).getOrElse(decodeStub(payload))
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
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "payload")).mapPartitions { it =>
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
    * asset, nulls when the payload does not decode as signed PCM.
    */
  def extractAudioFeatures(assets: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(audioFeatureSchema)
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "payload")).mapPartitions { it =>
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
    graft.pipeline.Parallelize.widen(
      ids.select(col(idCol).cast("long").as("asset_id"))).mapPartitions { it =>
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
    graft.pipeline.Parallelize.widen(
      ids.select(col(idCol).cast("long").as("asset_id"))).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 25).toInt
        val h = (8 + (id / 25) % 25).toInt
        Row(id, "image", encodeGrayPng(w, h, (id % 256).toInt))
      }
    }(enc)
  }

  /** Perceptual difference hash (dHash) of a decodable image: luma is
    * average-pooled onto a 9×8 grid (cell boundaries at `i·w/9` / `j·h/8`,
    * integer means — deterministic, no resampling kernel), and bit
    * `y·8 + x` is set iff `cell(x+1, y) > cell(x, y)`. Near-identical
    * images (recompression, minor edits, small crops) land within a few
    * bits; unrelated images differ in ~32. None for undecodable payloads
    * or images smaller than the grid.
    */
  def dHash(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    val img =
      try readImageInMemory(payload)
      catch { case _: java.io.IOException => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < 9 || h < 8) return None
    val cells = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
            x += 1
          }
          y += 1
        }
        cells(gy)(gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (cells(y)(x + 1) > cells(y)(x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    Some(bits)
  }

  /** Batched dHash over partitions: (asset_id, dhash) with null for
    * undecodable/too-small payloads.
    */
  def imageDHashes(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "payload")).mapPartitions { it =>
      it.map { r =>
        Row(r.getAs[Long]("asset_id"),
          dHash(r.getAs[Array[Byte]]("payload")).map(Long.box).orNull)
      }
    }(enc)
  }

  /** Perceptual near-duplicate image pairs: all (idA, idB, hamming) with
    * dHash hamming distance ≤ `maxHamming` — the image-side analogue of
    * SimHash text dedup, riding the same EXACT chunk-banding join
    * ([[graft.pipeline.Dedup.hammingPairs]]: pigeonhole recall, never
    * probabilistic). Decode cost is one distributed pass (use
    * [[rebalanceForDecode]] first when payload sizes are skewed); the join
    * shuffles only (id, hash) tuples, never pixels.
    */
  def imageNearDupPairs(assets: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1 << 20): DataFrame =
    graft.pipeline.Dedup.hammingPairs(imageDHashes(assets), "asset_id",
      "dhash", maxHamming, 64, maxBucketSize)

  /** Perceptual hash of a decodable PCM audio payload: the mean-|sample|
    * envelope is computed over 65 equal windows (integer means, window
    * boundaries at `j·n/65`) and bit `j` is set iff `env(j+1) > env(j)` —
    * the 1-D analogue of [[dHash]], robust to gain-preserving re-encodes
    * and small trims. None for undecodable payloads or streams shorter
    * than 65 samples.
    */
  def audioDHash(payload: Array[Byte]): Option[Long] =
    decodePcm(payload).flatMap { pcm =>
      val n = pcm.nSamples
      if (n < 65) None
      else {
        val env = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val i0 = w * n / 65; val i1 = (w + 1) * n / 65
          var sum = 0L
          var i = i0
          while (i < i1) {
            sum += math.abs(pcm.sample(i).toLong)
            i += 1
          }
          env(w) = sum / (i1 - i0)
          w += 1
        }
        var h = 0L
        var j = 0
        while (j < 64) {
          if (env(j + 1) > env(j)) h |= 1L << j
          j += 1
        }
        Some(h)
      }
    }

  /** Batched audio perceptual hash: (asset_id, dhash) with null for
    * undecodable/too-short payloads.
    */
  def audioDHashes(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    graft.pipeline.Parallelize.widen(
      assets.select("asset_id", "payload")).mapPartitions { it =>
      it.map { r =>
        Row(r.getAs[Long]("asset_id"),
          audioDHash(r.getAs[Array[Byte]]("payload")).map(Long.box).orNull)
      }
    }(enc)
  }

  /** Perceptual near-duplicate audio pairs — same exact chunk-banded
    * hamming join as [[imageNearDupPairs]], over the envelope hash.
    */
  def audioNearDupPairs(assets: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1 << 20): DataFrame =
    graft.pipeline.Dedup.hammingPairs(audioDHashes(assets), "asset_id",
      "dhash", maxHamming, 64, maxBucketSize)

  /** Perceptual image dedup keeping ONE asset per transitive near-dup
    * cluster — the SCALE composition of [[imageNearDupPairs]]: identical
    * hashes first collapse to their min-id representative in one O(n)
    * aggregation (exact-duplicate mass NEVER reaches the pair join — an
    * all-pairs join over n docs sharing one hash is O(n²), the measured
    * failure mode at 10×), then the banded hamming join and transitive
    * clustering run over DISTINCT hashes only, bounded by hash-space
    * cardinality regardless of corpus size. Undecodable assets survive.
    */
  def imageDedup(assets: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1 << 20): DataFrame =
    perceptualDedup(assets, imageDHashes(assets), maxHamming, maxBucketSize)

  /** Audio analogue of [[imageDedup]]: same two-tier composition over the
    * envelope hash.
    */
  def audioDedup(assets: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 1 << 20): DataFrame =
    perceptualDedup(assets, audioDHashes(assets), maxHamming, maxBucketSize)

  private def perceptualDedup(assets: DataFrame, hashes: DataFrame,
      maxHamming: Int, maxBucketSize: Int): DataFrame = {
    // materialized: (id, dhash) feeds THREE plan branches (reps, the pair
    // join, exact-loser reconstruction) — without it each branch re-runs
    // the full decode pass upstream (measured: mm7 paid the image decode
    // 3× through here)
    val hashed = graft.pipeline.Dedup.materialize(
      hashes.filter(col("dhash").isNotNull))
    val reps = hashed.groupBy("dhash").agg(min(col("asset_id")).as("asset_id"))
    val pairs = graft.pipeline.Dedup.hammingPairs(
      reps, "asset_id", "dhash", maxHamming, 64, maxBucketSize)
    val cc = graft.pipeline.Dedup.connectedComponents(pairs, "idA", "idB")
    val losingReps = cc.filter(col("id") =!= col("cluster"))
      .select(col("id").as("asset_id"))
    val exactLosers = hashed
      .join(reps.withColumnRenamed("asset_id", "__rep"), "dhash")
      .filter(col("asset_id") =!= col("__rep"))
      .select("asset_id")
    assets.join(exactLosers.union(losingReps), Seq("asset_id"), "left_anti")
  }

  /** 65-sample two-level pattern WAV whose [[audioDHash]] is an
    * id-determined KNOWN value: sample j is `1000` or `4000` by
    * `((id/8)·13 + j·7) mod 17 < 8`, with sample 30 INVERTED when
    * `id mod 8 = 7` — ids sharing `id/8` hash identically and the inverted
    * member lands within 2 bits. At exactly 65 samples each envelope
    * window IS one sample, so an oracle reproduces the hash from the
    * formula alone.
    */
  def synthesizePatternWavAssets(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    graft.pipeline.Parallelize.widen(
      ids.select(col(idCol).cast("long").as("asset_id"))).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val samples = Array.tabulate(65) { j =>
          val base = ((id / 8) * 13 + j * 7) % 17 < 8
          val loud = if (id % 8 == 7 && j == 30) !base else base
          if (loud) 1000.toShort else 4000.toShort
        }
        Row(id, "audio", encodeWavPcm16(8000, samples))
      }
    }(enc)
  }

  /** 9×8 two-tone pattern PNG whose dHash is an id-determined KNOWN value:
    * pixel gray `g(id, x, y)` is 40 or 200 by
    * `((id/8)·7 + x·3 + y·5) mod 11 < 5`, with the (4,3) cell INVERTED when
    * `id mod 8 = 7` — ids sharing `id/8` get identical patterns (hamming-0
    * groups) and the inverted member lands within 2 bits of its group. At
    * 9×8 the pooling grid is the pixel grid, so an oracle reproduces the
    * hash from the formula alone, no image library needed.
    */
  def synthesizePatternPngAssets(spark: SparkSession, ids: DataFrame,
      idCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val enc = RowEncoder.encoderFor(schema)
    graft.pipeline.Parallelize.widen(
      ids.select(col(idCol).cast("long").as("asset_id"))).mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 9) {
            val base = ((id / 8) * 7 + x * 3 + y * 5) % 11 < 5
            val dark = if (id % 8 == 7 && x == 4 && y == 3) !base else base
            val g = if (dark) 40 else 200
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        writePngInMemory(img, bos)
        Row(id, "image", bos.toByteArray)
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
