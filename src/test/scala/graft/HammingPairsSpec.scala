package graft

import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Dedup

/** Equivalence spec for the two-tier (distinct-hash) formulation of
  * [[Dedup.hammingPairs]]: output must equal the brute-force O(n²) pair set
  * on corpora with heavy exact-duplicate mass, near-dup chains, and unique
  * tails — the duplicate-collapse restructure (round 17) must not change a
  * single emitted row.
  */
class HammingPairsSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def brute(rows: Seq[(Long, java.lang.Long)], maxHamming: Int)
      : Set[(Long, Long, Int)] = {
    val hs = rows.collect { case (id, h) if h != null => (id, h.longValue) }
    (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
    } yield (a, b, d)).toSet
  }

  private def viaOperator(rows: Seq[(Long, java.lang.Long)], maxHamming: Int)
      : Set[(Long, Long, Int)] =
    Dedup.hammingPairs(rows.toDF("id", "h"), "id", "h", maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  describe("Dedup.hammingPairs") {
    it("matches brute force on a duplicate-heavy corpus") {
      // 8-member exact-duplicate groups with a 2-bit-perturbed member —
      // the mm5/mm6 shape that motivated the distinct-hash collapse
      val rows: Seq[(Long, java.lang.Long)] = (0L until 200L).map { id =>
        val base = (id / 8) * 0x9E3779B97F4A7C15L
        val h = if (id % 8 == 7) base ^ 0x0000010000000100L else base
        (id, Long.box(h))
      }
      assert(viaOperator(rows, 3) == brute(rows, 3))
    }

    it("matches brute force on pseudo-random hashes with nulls") {
      val rnd = new scala.util.Random(7)
      val rows: Seq[(Long, java.lang.Long)] = (0L until 150L).map { id =>
        val h: java.lang.Long =
          if (id % 17 == 0) null
          else if (id % 3 == 0) Long.box(rnd.nextLong() & 0xFFL) // dense low byte: many close pairs
          else Long.box(rnd.nextLong())
        (id, h)
      }
      assert(viaOperator(rows, 3) == brute(rows, 3))
      assert(viaOperator(rows, 6) == brute(rows, 6))
    }

    it("matches brute force at maxHamming 0 (exact groups only)") {
      val rows: Seq[(Long, java.lang.Long)] =
        (0L until 60L).map(id => (id, Long.box((id % 5) * 1234567L)))
      assert(viaOperator(rows, 0) == brute(rows, 0))
    }
  }
}
