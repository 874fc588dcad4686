package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus partition-friendly decode / feature-extraction
  * scaffolding.
  *
  * The Spark side — schema, batching via `mapPartitions`, partition sizing,
  * output shape — is real and tested. The actual codec calls are STUBBED
  * (this container has no image/audio libraries): [[decodeStub]] derives a
  * deterministic fake from the bytes so pipelines are end-to-end testable;
  * swap [[decodeStub]] for a real decoder (JNI/FFM to libjpeg/ffmpeg) without
  * touching any of the plumbing.
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

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio codec and emit model features. The stand-in derives a
    * deterministic 16-dim feature from the raw bytes (stable across runs and
    * partitionings) so downstream joins/ANN stages are fully exercisable.
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
      // >>> real decoder/context initialization would happen here, per task <<<
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(
          r.getAs[Long]("asset_id"),
          r.getAs[String]("modality"),
          if (payload == null) 0L else payload.length.toLong,
          contentHash(payload),
          decodeStub(payload))
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
