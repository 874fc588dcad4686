package graft

import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables._

class ProtocolSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  describe("table-features protocol") {
    it("a plain table carries the baseline protocol") {
      val t = GraftTable.create(spark, tmpTableDir("proto-plain"),
        Seq((1, "a")).toDF("id", "v"))
      assert(t.snapshot.protocol == Protocol())
    }

    it("enabling features upgrades the protocol at the enabling write") {
      val t = GraftTable.create(spark, tmpTableDir("proto-up"),
        Seq((1, "a"), (2, "b")).toDF("id", "v"),
        properties = Map(
          DeletionVectors.Property -> "true",
          GraftTable.IdentityPropertyPrefix + "rid" -> "1,1",
          GraftTable.ConstraintPropertyPrefix + "pos" -> "id >= 0"))
      val p = t.snapshot.protocol
      assert(p.readerFeatures == Seq("deletionVectors"))
      assert(p.writerFeatures ==
        Seq("checkConstraints", "deletionVectors", "identityColumns"))
    }

    it("an unknown READER feature fails the read loudly") {
      val dir = tmpTableDir("proto-reader")
      val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"))
      t.log.commit(1L, Seq(
        Protocol(readerFeatures = Seq("futureMagic"), writerFeatures = Seq("futureMagic")),
        CommitInfo(System.currentTimeMillis(), "UPGRADE")))
      val e = intercept[IllegalStateException] {
        GraftTable.forPath(spark, dir).toDF.collect()
      }
      assert(e.getMessage.contains("futureMagic"))
      assert(e.getMessage.contains("reader feature"))
    }

    it("an unknown WRITER feature blocks writes but not reads") {
      val dir = tmpTableDir("proto-writer")
      val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"))
      t.log.commit(1L, Seq(
        Protocol(writerFeatures = Seq("futureWriterMagic")),
        CommitInfo(System.currentTimeMillis(), "UPGRADE")))
      assert(GraftTable.forPath(spark, dir).toDF.count() == 1) // reads fine
      val e = intercept[IllegalStateException] {
        GraftTable.forPath(spark, dir).append(Seq((2, "b")).toDF("id", "v"))
      }
      assert(e.getMessage.contains("futureWriterMagic"))
      assert(e.getMessage.contains("writer feature"))
    }

    it("the protocol survives checkpoints and vacuum horizon rewrites") {
      val dir = tmpTableDir("proto-ckpt")
      val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"),
        properties = Map(DeletionVectors.Property -> "true"))
      (1 to GraftLog.CheckpointInterval + 1).foreach(i =>
        GraftTable.forPath(spark, dir).append(Seq((i + 10, "x")).toDF("id", "v")))
      val afterCkpt = GraftTable.forPath(spark, dir)
      assert(afterCkpt.log.checkpointVersions().nonEmpty)
      assert(afterCkpt.snapshot.protocol.readerFeatures == Seq("deletionVectors"))
      TableOps.vacuum(afterCkpt, retainVersion = GraftLog.CheckpointInterval.toLong)
      assert(GraftTable.forPath(spark, dir).snapshot.protocol
        .readerFeatures == Seq("deletionVectors"))
    }

    it("the protocol never downgrades when a feature property is unset") {
      val dir = tmpTableDir("proto-nodown")
      val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"),
        properties = Map(DeletionVectors.Property -> "true"))
      t.unsetProperties(Set(DeletionVectors.Property))
      GraftTable.forPath(spark, dir).append(Seq((2, "b")).toDF("id", "v"))
      assert(GraftTable.forPath(spark, dir).snapshot.protocol
        .readerFeatures == Seq("deletionVectors"))
    }
  }
}
