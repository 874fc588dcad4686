package graft

import org.scalatest.funspec.AnyFunSpec

import graft.operators.ApplyChanges
import graft.streaming.StreamingOps
import graft.tables._

class ApplyChangesSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def mkTable(dir: String): GraftTable =
    GraftTable.create(spark, dir,
      Seq((1, "a", 0L), (2, "b", 0L), (3, "c", 0L))
        .toDF("id", "name", "seq").repartition(1))

  describe("ApplyChanges.applyChanges") {
    it("collapses a feed to its net effect: latest sequence per key wins") {
      val t = mkTable(tmpTableDir("ac-net"))
      val feed = Seq(
        (1, "stale", 1L, "upsert"),
        (1, "fresh", 2L, "upsert"),
        (2, "b2", 1L, "delete"),
        (4, "new", 1L, "upsert"),
        (9, "ghost", 1L, "delete") // delete of an absent key: no-op
      ).toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "fresh", 2L), (3, "c", 0L), (4, "new", 1L)).toDF("id", "name", "seq"))
    }

    it("at an equal sequence a delete applies after an upsert (DLT tie rule)") {
      val t = mkTable(tmpTableDir("ac-tie"))
      val feed = Seq(
        (1, "resurrected", 5L, "upsert"),
        (1, "x", 5L, "delete")
      ).toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((2, "b", 0L), (3, "c", 0L)).toDF("id", "name", "seq"))
    }

    it("stored sequence guards stale cross-call replays (apply∘stale = apply)") {
      val t = mkTable(tmpTableDir("ac-stale"))
      val fresh = Seq((1, "v5", 5L, "upsert")).toDF("id", "name", "seq", "op")
      val stale = Seq((1, "v2", 2L, "upsert"), (2, "v1", 1L, "delete"))
        .toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, fresh, Seq("id"), "seq", Some("op = 'delete'"))
      // the stale delete of id=2 has seq 1 >= stored 0, so it DOES apply;
      // the stale upsert of id=1 (seq 2 < stored 5) must not regress
      ApplyChanges.applyChanges(t, stale, Seq("id"), "seq", Some("op = 'delete'"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "v5", 5L), (3, "c", 0L)).toDF("id", "name", "seq"))
    }

    it("re-applying the same batch is value-idempotent") {
      val t = mkTable(tmpTableDir("ac-idem"))
      val feed = Seq((1, "v3", 3L, "upsert"), (2, "z", 4L, "delete"))
        .toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      val once = t.toDF.collect().map(_.toSeq).sortBy(_.mkString("|"))
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      val twice = t.toDF.collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(once.toSeq == twice.toSeq)
    }

    it("target without the sequence column applies unguarded and drops feed-only columns") {
      val t = GraftTable.create(spark, tmpTableDir("ac-noseq"),
        Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1))
      val feed = Seq((1, "upd", 7L, "upsert"), (3, "ins", 1L, "upsert"))
        .toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "upd"), (2, "b"), (3, "ins")).toDF("id", "name"))
    }

    it("target columns absent from the feed keep their value on update, go NULL on insert") {
      val t = GraftTable.create(spark, tmpTableDir("ac-partial"),
        // Option bonus → nullable column: the insert path writes null there
        Seq((1, "a", Some(100)), (2, "b", Some(200)))
          .toDF("id", "name", "bonus").repartition(1))
      val feed = Seq((1, "upd", 1L), (3, "ins", 1L)).toDF("id", "name", "seq")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", None)
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "upd", Some(100)), (2, "b", Some(200)), (3, "ins", None))
          .toDF("id", "name", "bonus"))
    }

    it("a NULL stored sequence means always-apply, not frozen") {
      // rows landed by a plain append lack the sequence column (schema-merge
      // NULL); the guard must let the change feed reach them
      val t = GraftTable.create(spark, tmpTableDir("ac-nullseq"),
        Seq((1, "a", Some(0L)), (2, "b", None), (3, "c", None))
          .toDF("id", "name", "seq").repartition(1))
      val feed = Seq((2, "updated", 5L, "upsert"), (3, "x", 5L, "delete"))
        .toDF("id", "name", "seq", "op")
      ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", Some("op = 'delete'"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "a", Some(0L)), (2, "updated", Some(5L))).toDF("id", "name", "seq"))
    }

    it("rejects a feed missing the key or sequence column") {
      val t = mkTable(tmpTableDir("ac-reject"))
      val feed = Seq((1, "a")).toDF("id", "name")
      intercept[IllegalArgumentException] {
        ApplyChanges.applyChanges(t, feed, Seq("id"), "seq", None)
      }
      intercept[IllegalArgumentException] {
        ApplyChanges.applyChanges(t, feed.withColumnRenamed("id", "k"), Seq("id"), "k", None)
      }
    }
  }

  describe("StreamingOps.propagateChanges") {
    it("replicates upstream state downstream: snapshot, update, delete, append") {
      val src = tmpTableDir("prop-src")
      val dst = tmpTableDir("prop-dst")
      val t = GraftTable.create(spark, src,
        Seq((0, "a"), (1, "b"), (2, "c")).toDF("id", "name").repartition(1),
        properties = Map(GraftLog.CdfProperty -> "true"))
      graft.operators.TableOps.update(t, Some("id = 0"), Map("name" -> "'A!'"))
      graft.operators.TableOps.delete(t, Some("id = 2"))
      t.append(Seq((9, "z")).toDF("id", "name"))
      GraftTable.createEmpty(spark, dst, t.snapshot.schema)
      val q = StreamingOps.propagateChanges(spark, src, dst, Seq("id"))
      try q.processAllAvailable() finally q.stop()
      assertSmallDataFrameEquality(GraftTable.forPath(spark, dst).toDF,
        Seq((0, "A!"), (1, "b"), (9, "z")).toDF("id", "name"))
    }
  }

  describe("StreamingOps.applyChangesStream") {
    it("folds a change stream into the table, one merge per micro-batch, late batch guarded") {
      implicit val sqlCtx = spark.sqlContext
      val dir = tmpTableDir("ac-stream")
      mkTable(dir)
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String, Long, String)]
      val q = StreamingOps.applyChangesStream(
        input.toDF().toDF("id", "name", "seq", "op"),
        dir, Seq("id"), "seq", Some("op = 'delete'"))
      try {
        input.addData((1, "b1", 10L, "upsert"), (2, "x", 10L, "delete"))
        q.processAllAvailable()
        input.addData((1, "late", 4L, "upsert"), (4, "d", 4L, "upsert"))
        q.processAllAvailable()
      } finally q.stop()
      assertSmallDataFrameEquality(GraftTable.forPath(spark, dir).toDF,
        Seq((1, "b1", 10L), (3, "c", 0L), (4, "d", 4L)).toDF("id", "name", "seq"))
    }
  }
}
