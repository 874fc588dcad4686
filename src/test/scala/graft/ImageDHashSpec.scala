package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Multimodal

/** dHash: formula agreement on the synthesized pattern assets, pooling on
  * larger images, and the exactness of the banded hamming pair join.
  */
class ImageDHashSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** The pattern formula replayed independently of the image path. */
  private def expectedHash(id: Long): Long = {
    def gray(x: Int, y: Int): Int = {
      val base = ((id / 8) * 7 + x * 3 + y * 5) % 11 < 5
      val dark = if (id % 8 == 7 && x == 4 && y == 3) !base else base
      if (dark) 40 else 200
    }
    var bits = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (gray(x + 1, y) > gray(x, y)) bits |= 1L << (y * 8 + x)
    bits
  }

  it("decodes pattern PNGs to the formula-predicted hash") {
    val ids = (0L until 64L).toDF("id")
    val assets = Multimodal.synthesizePatternPngAssets(spark, ids, "id")
    val got = Multimodal.imageDHashes(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 64)
    for (id <- 0L until 64L) assert(got(id) == expectedHash(id), s"id=$id")
  }

  it("pools larger images: scaled-up pattern gives the same hash") {
    // 36x32 = each 9x8 cell is a uniform 4x4 block -> identical cell means
    val img = new java.awt.image.BufferedImage(36, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 36) {
      val base = (7L + (x / 4) * 3 + (y / 4) * 5) % 11 < 5 // id/8 = 1 pattern
      val g = if (base) 40 else 200
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.dHash(bos.toByteArray).contains(expectedHash(8L)))
  }

  it("rejects undecodable and under-grid payloads") {
    assert(Multimodal.dHash(null).isEmpty)
    assert(Multimodal.dHash("not an image".getBytes).isEmpty)
    assert(Multimodal.dHash(Multimodal.encodeGrayPng(4, 4, 100)).isEmpty)
  }

  private def expectedAudioHash(id: Long): Long = {
    def v(j: Int): Int = {
      val base = ((id / 8) * 13 + j * 7) % 17 < 8
      val on = if (id % 8 == 7 && j == 30) !base else base
      if (on) 1000 else 4000
    }
    var bits = 0L
    for (j <- 0 until 64) if (v(j + 1) > v(j)) bits |= 1L << j
    bits
  }

  it("decodes pattern WAVs to the formula-predicted envelope hash") {
    val ids = (0L until 32L).toDF("id")
    val assets = Multimodal.synthesizePatternWavAssets(spark, ids, "id")
    val got = Multimodal.audioDHashes(assets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- 0L until 32L) assert(got(id) == expectedAudioHash(id), s"id=$id")
    // envelope pooling: doubling every sample (130 samples, windows of 2)
    // preserves the hash
    val doubled = Multimodal.encodeWavPcm16(8000, Array.tabulate(130) { i =>
      val j = i / 2
      val base = (0L * 13 + j * 7) % 17 < 8
      if (base) 1000.toShort else 4000.toShort
    })
    assert(Multimodal.audioDHash(doubled).contains(expectedAudioHash(0L)))
    assert(Multimodal.audioDHash("not audio".getBytes).isEmpty)
    assert(Multimodal.audioDHash(
      Multimodal.encodeWavPcm16(8000, Array.fill(10)(5.toShort))).isEmpty)
  }

  it("two-tier dedup keeps exactly one asset per transitive hash cluster") {
    val n = 64L
    val ids = (0L until n).toDF("id")
    val assets = Multimodal.synthesizePatternPngAssets(spark, ids, "id")
    val got = Multimodal.imageDedup(assets, maxHamming = 3)
      .select("asset_id").collect().map(_.getLong(0)).toSet
    // brute-force expected: union-find over (exact-equal OR hamming<=3)
    val hs = (0L until n).map(id => id -> expectedHash(id)).toMap
    val parent = scala.collection.mutable.HashMap((0L until n).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- 0L until n; b <- (a + 1) until n)
      if (java.lang.Long.bitCount(hs(a) ^ hs(b)) <= 3) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    val expected = (0L until n).groupBy(find).map(_._2.min).toSet
    assert(expected.size < n)
    assert(got == expected)
  }

  it("finds exactly the brute-force hamming pairs") {
    val ids = (0L until 48L).toDF("id")
    val assets = Multimodal.synthesizePatternPngAssets(spark, ids, "id")
    val got = Multimodal.imageNearDupPairs(assets, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = (0L until 48L).map(id => id -> expectedHash(id))
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).toSet
    assert(expected.nonEmpty)
    assert(got == expected)
  }
}
