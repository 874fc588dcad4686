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

    it("metadata-only DDL upgrades the protocol too") {
      val t = GraftTable.create(spark, tmpTableDir("proto-ddl"),
        Seq((1, "a")).toDF("id", "v"))
      assert(t.snapshot.protocol == Protocol())
      t.setProperties(Map(DeletionVectors.Property -> "true"))
      assert(GraftTable.forPath(spark, t.path).snapshot.protocol
        .readerFeatures == Seq("deletionVectors"))
      // rename enables column mapping — a READER feature — via DDL
      val t2 = GraftTable.forPath(spark, t.path)
      t2.renameColumn("v", "w")
      assert(GraftTable.forPath(spark, t.path).snapshot.protocol
        .readerFeatures.contains("columnMapping"))
    }

    it("a shallow clone carries the source's protocol") {
      val srcDir = tmpTableDir("proto-clone-src")
      GraftTable.create(spark, srcDir, Seq((1, "a")).toDF("id", "v"),
        properties = Map(DeletionVectors.Property -> "true"))
      val clone = GraftTable.shallowClone(spark, srcDir, tmpTableDir("proto-clone-dst"))
      assert(clone.snapshot.protocol.readerFeatures == Seq("deletionVectors"))
    }

    it("the distributed read path is gated like the driver fold") {
      val dir = tmpTableDir("proto-dist")
      val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "v"))
      t.log.commit(1L, Seq(
        Protocol(readerFeatures = Seq("futureMagic")),
        CommitInfo(System.currentTimeMillis(), "UPGRADE")))
      val e = intercept[IllegalStateException] {
        DistributedSnapshot.addFilesDF(spark, dir).collect()
      }
      assert(e.getMessage.contains("futureMagic"))
    }

    it("batch CDF refuses an append vacuum-horizon rewrite but reads a CDC-covered one") {
      import graft.operators.TableOps
      val dir = tmpTableDir("proto-cdf-horizon")
      val t = GraftTable.create(spark, dir, Seq((0, "a"), (1, "b")).toDF("id", "v"),
        properties = Map(GraftLog.CdfProperty -> "true"))
      TableOps.update(t, Some("id = 0"), Map("v" -> "'a1'"))           // v1 (cdc)
      GraftTable.forPath(spark, dir).append(Seq((9, "z")).toDF("id", "v")) // v2 (no cdc)
      TableOps.vacuum(GraftTable.forPath(spark, dir), retainVersion = 2L)
      // the horizon v2 lost its original append content — reading it as
      // inserts would re-emit the whole table
      val e = intercept[IllegalStateException] {
        graft.log.ChangeDataFeedHelper(spark, dir, 2, 2).readCDF.collect()
      }
      assert(e.getMessage.contains("vacuum-horizon rewrite"))
      // whereas a CDC-covered horizon still reads its original changes
      val dir2 = tmpTableDir("proto-cdf-horizon2")
      val t2 = GraftTable.create(spark, dir2, Seq((0, "a")).toDF("id", "v"),
        properties = Map(GraftLog.CdfProperty -> "true"))
      TableOps.update(t2, Some("id = 0"), Map("v" -> "'a1'"))          // v1 (cdc)
      TableOps.vacuum(GraftTable.forPath(spark, dir2), retainVersion = 1L)
      val rows = graft.log.ChangeDataFeedHelper(spark, dir2, 1, 1).readCDF
        .select("id", "v", "_change_type").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
      assert(rows == Set((0, "a", "update_preimage"), (0, "a1", "update_postimage")))
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
