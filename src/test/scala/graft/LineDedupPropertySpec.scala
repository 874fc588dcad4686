package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Dedup

/** Model-based check of line-level corpus dedup: random corpora through the
  * engine must match a driver-side reference fold of the same rules
  * (trim-normalized document frequency, blank lines never banned, positions
  * preserved, empty-doc rebuild).
  */
class LineDedupPropertySpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  // small line alphabet forces cross-doc duplication; whitespace variants
  // exercise the trim normalization
  private val lineGen: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", " alpha ", "\tbeta", "", "  ",
    "unique snowflake", "the quick fox")
  private val docGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))
  private val corpusGen: Gen[List[String]] =
    Gen.choose(2, 12).flatMap(n => Gen.listOfN(n, docGen))

  private def strip(s: String): String = s.replaceAll("^\\s+|\\s+$", "")

  private def reference(docs: Seq[(Long, String)], minDocs: Int): Map[Long, (String, Int, Int)] = {
    val df = docs
      .flatMap { case (id, t) => t.split("\n", -1).map(l => (id, strip(l))) }
      .filter(_._2.nonEmpty)
      .distinct.groupBy(_._2).map { case (k, v) => k -> v.size }
    val banned = df.filter(_._2 >= minDocs).keySet
    docs.map { case (id, t) =>
      val lines = t.split("\n", -1)
      val kept = lines.filterNot(l => banned.contains(strip(l)))
      id -> ((kept.mkString("\n"), kept.length, lines.length - kept.length))
    }.toMap
  }

  it("random corpora match the driver-side reference fold") {
    val params = Gen.Parameters.default.withSize(20)
    (0 until 6).foreach { i =>
      corpusGen.apply(params, Seed(11L + i)).foreach { corpus =>
        val docs = corpus.zipWithIndex.map { case (t, id) => (id.toLong, t) }
        val minDocs = 2 + (i % 2)
        val got = Dedup.lineDedup(docs.toDF("doc_id", "text"), minDocs = minDocs)
          .collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
        val want = reference(docs, minDocs)
        assert(got == want, s"engine $got != reference $want for corpus $docs (minDocs=$minDocs)")
      }
    }
  }
}
