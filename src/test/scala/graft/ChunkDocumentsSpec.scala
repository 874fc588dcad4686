package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.TextAnalysis

/** chunkDocuments: window arithmetic, the no-contained-chunk rule, overlap
  * carry, and edge docs.
  */
class ChunkDocumentsSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def chunksOf(text: String, maxTokens: Int, overlap: Int) =
    TextAnalysis.chunkDocuments(Seq((1L, text)).toDF("id", "text"),
        "id", "text", maxTokens, overlap)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[Int]("n_tokens"),
        r.getAs[String]("chunk_text")))

  it("splits into overlapping windows covering every token") {
    val text = (1 to 10).map(i => s"w$i").mkString(" ")
    val out = chunksOf(text, maxTokens = 4, overlap = 1)
    // step 3: starts 0,3,6 then 9 (9 < 10-1 = 9 is false) -> 3 full + none
    assert(out.toSeq == Seq(
      (0, 4, "w1 w2 w3 w4"),
      (1, 4, "w4 w5 w6 w7"),
      (2, 4, "w7 w8 w9 w10")))
  }

  it("emits a short tail chunk but never a fully-contained one") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val out = chunksOf(text, maxTokens = 4, overlap = 2)
    // step 2: chunk i emitted iff i == 0 or 2i < 9-2 -> i <= 3
    assert(out.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(out.last == ((3, 3, "w7 w8 w9")))
    // exact fit: n = maxTokens -> one chunk only
    assert(chunksOf((1 to 4).map("w" + _).mkString(" "), 4, 2).toSeq ==
      Seq((0, 4, "w1 w2 w3 w4")))
  }

  it("handles messy whitespace and empty docs") {
    assert(chunksOf("  a\t\tb \n c  ", 2, 0).toSeq ==
      Seq((0, 2, "a b"), (1, 1, "c")))
    val out = TextAnalysis.chunkDocuments(
      Seq((1L, ""), (2L, "   "), (3L, null.asInstanceOf[String]))
        .toDF("id", "text"), "id", "text", 4, 0)
    assert(out.count() == 0)
  }

  it("rejects bad parameters") {
    val df = Seq((1L, "a")).toDF("id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "id", "text", 4, 4)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "id", "text", 0, 0)
    }
  }
}
