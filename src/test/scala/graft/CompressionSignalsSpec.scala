package graft

import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.TextAnalysis

class CompressionSignalsSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def ratios(docs: Seq[(Long, String)]): Map[Long, (Int, Int, Option[Double])] =
    TextAnalysis.compressionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  describe("TextAnalysis.corpusReport") {
    it("reports exact per-stratum volumes and duplicate rates") {
      val docs = Seq(
        (1L, "hello world", "en"),
        (2L, "hello world", "en"),  // exact duplicate content
        (3L, "Hello, WORLD!", "en"), // same fingerprint after normalization
        (4L, "bonjour", "fr")
      ).toDF("doc_id", "text", "lang")
      val out = TextAnalysis.corpusReport(docs).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      // en: 3 docs, tokens 2+2+4 ("Hello , WORLD !"), chars 11+11+13,
      // 1 distinct fingerprint, avg 8*10000/3 = 26666, dup (3-1)*10000/3 = 6666
      assert(out("en") == ((3L, 8L, 35L, 1L, 26666L, 6666L)))
      assert(out("fr") == ((1L, 1L, 7L, 1L, 10000L, 0L)))
    }

    it("one aggregation pass: a single stratum shuffle in the plan") {
      val docs = Seq((1L, "a", "en")).toDF("doc_id", "text", "lang")
      val plan = TextAnalysis.corpusReport(docs).queryExecution.executedPlan.toString
      // countDistinct expands to a two-stage aggregate over ONE key set —
      // no extra join or third exchange
      assert(!plan.contains("Join"), s"corpusReport grew a join:\n$plan")
    }
  }

  describe("TextAnalysis.compressionSignals") {
    it("repetitive text compresses far below natural text; random junk barely compresses") {
      val natural = "The quick brown fox jumps over the lazy dog while the cat watches " * 20
      val repetitive = "spam " * 256
      val rng = new scala.util.Random(42)
      val junk = Array.fill(1280)((rng.nextInt(94) + 33).toChar).mkString
      val out = ratios(Seq((1L, natural), (2L, repetitive), (3L, junk)))
      val Some(rNat) = out(1L)._3
      val Some(rRep) = out(2L)._3
      val Some(rJunk) = out(3L)._3
      assert(rRep < rNat / 2, s"repetitive ($rRep) should compress far below natural ($rNat)")
      assert(rJunk > 0.8, s"random junk should barely compress, got $rJunk")
      assert(rNat < 0.5 && rNat > 0.05, s"natural text ratio out of band: $rNat")
    }

    it("byte counts are UTF-8 sizes; empty docs get a NULL ratio") {
      val out = ratios(Seq((1L, ""), (2L, "héllo")))
      assert(out(1L) == ((0, out(1L)._2, None)))
      assert(out(2L)._1 == 6) // é is two UTF-8 bytes
    }

    it("is a pure map: no shuffle in the plan, partitioning-independent results") {
      val docs = (0L until 200L).map(i => (i, s"document $i " * (1 + (i % 7)).toInt))
      val a = TextAnalysis.compressionSignals(docs.toDF("doc_id", "text").repartition(1),
        "doc_id", "text")
      val b = TextAnalysis.compressionSignals(docs.toDF("doc_id", "text").repartition(13),
        "doc_id", "text")
      assertSmallDataFrameEquality(a, b)
      val plain = TextAnalysis.compressionSignals(docs.toDF("doc_id", "text"), "doc_id", "text")
      assert(!plain.queryExecution.executedPlan.toString.contains("Exchange"),
        "compressionSignals grew a shuffle")
    }
  }
}
