package graft

import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.Dedup

class LineDedupSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  describe("Dedup.lineDedup") {
    it("removes lines duplicated across >= minDocs docs, keeps the rest in order") {
      val docs = Seq(
        (1L, "SHARE THIS\nunique alpha\nCOPYRIGHT CORP"),
        (2L, "SHARE THIS\nunique beta\nCOPYRIGHT CORP"),
        (3L, "SHARE THIS\nunique gamma\nCOPYRIGHT CORP"),
        (4L, "only original content\nnothing shared here")
      ).toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, minDocs = 3).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      assert(out(1L) == (("unique alpha", 1, 2)))
      assert(out(2L) == (("unique beta", 1, 2)))
      assert(out(3L) == (("unique gamma", 1, 2)))
      assert(out(4L) == (("only original content\nnothing shared here", 2, 0)))
    }

    it("ban decisions trim-normalize but removal drops the raw line") {
      val docs = Seq(
        (1L, "  FOOTER  \nkeep one"),
        (2L, "FOOTER\nkeep two"),
        (3L, "\tFOOTER\nkeep three")
      ).toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, minDocs = 3).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == Map(1L -> "keep one", 2L -> "keep two", 3L -> "keep three"))
    }

    it("a line in minDocs-1 docs survives; blank lines are never banned") {
      val docs = Seq(
        (1L, "twice\n\nbody one"),
        (2L, "twice\n\nbody two"),
        (3L, "other\n\nbody three")
      ).toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, minDocs = 3).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // "twice" df=2 < 3 stays; the blank line (df=3) also stays
      assert(out(1L) == "twice\n\nbody one")
      assert(out(3L) == "other\n\nbody three")
    }

    it("a doc that loses every line comes back with empty text, counts consistent") {
      val docs = Seq(
        (1L, "spam"),
        (2L, "spam"),
        (3L, "spam"),
        (4L, "spam\nextra")
      ).toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, minDocs = 3).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      assert(out(1L) == (("", 0, 1)))
      assert(out(4L) == (("extra", 1, 1)))
    }

    it("null text behaves as empty text") {
      val docs = Seq((1L, null.asInstanceOf[String]), (2L, "real line"))
        .toDF("doc_id", "text")
      val out = Dedup.lineDedup(docs, minDocs = 2).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
      assert(out(1L) == (("", 1, 0))) // one empty "line", kept
      assert(out(2L) == (("real line", 1, 0)))
    }

    it("is independent of input partitioning") {
      val base = (0L until 60L).map { i =>
        val boiler = if (i % 2 == 0) "AD BANNER" else s"content ${i % 7}"
        (i, s"$boiler\nunique line $i")
      }
      val a = Dedup.lineDedup(base.toDF("doc_id", "text").repartition(1), minDocs = 5)
      val b = Dedup.lineDedup(base.toDF("doc_id", "text").repartition(13), minDocs = 5)
      assertSmallDataFrameEquality(a, b)
    }
  }
}
