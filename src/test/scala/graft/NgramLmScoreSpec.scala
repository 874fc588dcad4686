package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.TextAnalysis

/** Hand-computed add-one-smoothed bigram LM scores, the topK pruning path,
  * and the short-doc exclusion rule.
  */
class NgramLmScoreSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  // train corpus: unigrams a:2 b:3 c:1 (V=3); bigrams (a,b):2 (b,a):1 (b,c):1
  private val train = Seq("a b a b", "b c").toDF("text")

  it("scores eval bigrams with exact smoothed probabilities") {
    val eval = Seq((1L, "a b c d"), (2L, "solo")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmScore(train, eval, "doc_id", "text").collect()
    // doc 2 has one token -> no bigrams -> absent
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 1L)
    // P(a,b)=(2+1)/(2+3)=0.6 ; P(b,c)=(1+1)/(3+3)=1/3 ; P(c,d)=(0+1)/(1+3)=0.25
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("prob_e9_sum") == 600000000L + 333333333L + 250000000L)
    assert(r.getAs[Double]("avg_prob") == 0.394444)
  }

  it("is partitioning-invariant (integer fixed-point sums)") {
    val eval = Seq.tabulate(50)(i => (i.toLong, "a b c a b")).toDF("doc_id", "text")
    val one = TextAnalysis.ngramLmScore(train, eval.repartition(1), "doc_id", "text")
    val many = TextAnalysis.ngramLmScore(train.repartition(5), eval.repartition(13), "doc_id", "text")
    assertSmallDataFrameEquality(many, one)
  }

  it("falls back to unseen counts under topK pruning without changing the contract") {
    val eval = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramLmScore(train, eval, "doc_id", "text",
      topKBigrams = 1, topKUnigrams = 1).collect().head
    // only (a,b) [count 2] and unigram b [count 3] survive the cut:
    // P(a,b)=(2+1)/(0+3)=1.0 ; P(b,c)=(0+1)/(3+3)=1/6
    assert(out.getAs[Long]("prob_e9_sum") == 1000000000L + 166666667L)
  }
}
