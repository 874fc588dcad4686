package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.operators.TableOps
import graft.tables.{DeletionVectors, GraftTable}

/** Merge-on-read deletion vectors: DELETE on a DV-enabled table masks rows
  * via position sidecars without rewriting data files; reads, time travel,
  * CDF, streaming, OPTIMIZE purge and vacuum all stay consistent.
  */
class DeletionVectorSpec extends AnyFunSpec with Matchers
    with BeforeAndAfterEach with SparkSessionTestWrapper {

  var dir: java.nio.file.Path = _
  override def beforeEach(): Unit = { dir = Files.createTempDirectory("graft-dv") }
  override def afterEach(): Unit = {
    org.apache.spark.sql.SparkSession.active.catalog.clearCache()
  }

  private def tablePath = dir.resolve("t").toString

  private def mkTable(n: Int = 100, parts: Int = 4, cdf: Boolean = false): GraftTable = {
    import spark.implicits._
    val df = (0 until n).map(i => (i.toLong, s"name_$i", i % 10)).toDF("id", "name", "bucket")
      .repartition(parts)
    val props = Map(DeletionVectors.Property -> "true") ++
      (if (cdf) Map("graft.enableChangeDataFeed" -> "true") else Map.empty)
    GraftTable.create(spark, tablePath, df, properties = props)
  }

  describe("deletion-vector DELETE") {

    it("masks matched rows without touching data files") {
      val t = mkTable()
      val before = t.snapshot.files.map(f => f.path -> Files.getLastModifiedTime(
        Paths.get(tablePath, f.path))).toMap
      val v = TableOps.delete(t, Some("id % 10 = 3"))
      v shouldBe 1L
      // logical result
      t.toDF.count() shouldBe 90L
      t.toDF.where("id % 10 = 3").count() shouldBe 0L
      // physical files unchanged: same paths, same mtimes, dv attached
      val after = t.snapshot.files
      after.map(_.path).toSet shouldBe before.keySet
      after.foreach { f =>
        Files.getLastModifiedTime(Paths.get(tablePath, f.path)) shouldBe before(f.path)
        f.dv shouldBe defined
      }
      after.map(_.dv.get.cardinality).sum shouldBe 10L
      val h = t.history().head._2
      h.operation shouldBe "DELETE"
      h.operationMetrics("numDeletedRows") shouldBe "10"
      h.operationMetrics("numDeletionVectorsAdded") shouldBe after.size.toString
    }

    it("merges positions across successive deletes") {
      val t = mkTable()
      TableOps.delete(t, Some("id < 10"))
      TableOps.delete(t, Some("id >= 10 AND id < 20"))
      t.toDF.count() shouldBe 80L
      t.toDF.where("id < 20").count() shouldBe 0L
      t.snapshot.files.map(_.dv.map(_.cardinality).getOrElse(0L)).sum shouldBe 20L
      val h = t.history().head._2
      h.operationMetrics("numDeletedRows") shouldBe "10"
      // second delete updated the existing descriptors
      h.operationMetrics("numDeletionVectorsUpdated").toLong should be > 0L
    }

    it("turns a fully-emptied file into a plain remove") {
      import spark.implicits._
      val df = (0 until 40).map(i => (i.toLong, i / 10)).toDF("id", "part")
      GraftTable.create(spark, tablePath,
        df.repartition(col("part")), partitionColumns = Seq("part"),
        properties = Map(DeletionVectors.Property -> "true"))
      val t = GraftTable.forPath(spark, tablePath)
      val nFiles = t.snapshot.files.size
      TableOps.delete(t, Some("part = 2"))
      t.toDF.count() shouldBe 30L
      val snap = t.snapshot
      snap.files.size shouldBe (nFiles - 1)
      // the surviving files carry no dv — the delete was partition-exact
      snap.files.foreach(_.dv shouldBe None)
    }

    it("matches the rewrite delete's results exactly") {
      import spark.implicits._
      val data = (0 until 500).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "name", "m")
      GraftTable.create(spark, dir.resolve("dv").toString, data.repartition(8),
        properties = Map(DeletionVectors.Property -> "true"))
      GraftTable.create(spark, dir.resolve("rw").toString, data.repartition(8))
      val tDv = GraftTable.forPath(spark, dir.resolve("dv").toString)
      val tRw = GraftTable.forPath(spark, dir.resolve("rw").toString)
      TableOps.delete(tDv, Some("m IN (2, 5) OR id > 450"))
      TableOps.delete(tRw, Some("m IN (2, 5) OR id > 450"))
      val a = tDv.toDF.orderBy("id").collect().map(_.toSeq)
      val b = tRw.toDF.orderBy("id").collect().map(_.toSeq)
      a should contain theSameElementsInOrderAs b
    }

    it("keeps time travel and SQL catalog reads exact") {
      val t = mkTable()
      TableOps.delete(t, Some("id < 50"))
      t.toDFAt(0).count() shouldBe 100L
      t.toDF.count() shouldBe 50L
      GraftTable.registerTable(spark, "dv_cat", tablePath)
      spark.sql("SELECT count(*) AS c FROM dv_cat").collect()(0).getLong(0) shouldBe 50L
      spark.sql("SELECT sum(id) AS s FROM dv_cat WHERE bucket = 0").collect()(0)
        .getLong(0) shouldBe (50L until 100L).filter(_ % 10 == 0).sum
    }

    it("emits CDC delete rows and streams them") {
      val t = mkTable(cdf = true)
      TableOps.delete(t, Some("id >= 90"))
      val cdf = graft.log.ChangeDataFeedHelper(spark, tablePath, 1, 1).readCDF
      cdf.where("_change_type = 'delete'").count() shouldBe 10L
      cdf.select(min("id")).collect()(0).getLong(0) shouldBe 90L
    }

    it("skips dv deletes under ignoreDeletes and fails loudly without CDF") {
      val t = mkTable() // no CDF
      TableOps.delete(t, Some("id = 1"))
      val checkpoint = dir.resolve("ckpt").toString
      // without ignoreDeletes: the stream cannot represent the delete
      val q = spark.readStream.format("graft")
        .option("startingVersion", "1").load(tablePath)
        .writeStream.format("memory").queryName("dv_fail")
        .option("checkpointLocation", checkpoint).start()
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      ex.getMessage should include("removed files but wrote no change data")
      q.stop()
      // with ignoreDeletes: the commit is skipped, later appends flow
      t.append(spark.range(1000, 1002).toDF("id")
        .withColumn("name", lit("x")).withColumn("bucket", lit(0)))
      val q2 = spark.readStream.format("graft")
        .option("startingVersion", "1").option("ignoreDeletes", "true").load(tablePath)
        .writeStream.format("memory").queryName("dv_skip")
        .option("checkpointLocation", dir.resolve("ckpt2").toString).start()
      q2.processAllAvailable()
      q2.stop()
      val got = spark.sql("SELECT id FROM dv_skip").collect().map(_.getLong(0)).sorted
      got shouldBe Array(1000L, 1001L)
    }

    it("OPTIMIZE purges deletion vectors and vacuum keeps live sidecars") {
      val t = mkTable(n = 200, parts = 6)
      TableOps.delete(t, Some("id % 4 = 0"))
      t.toDF.count() shouldBe 150L
      val dvDirs = t.snapshot.files.flatMap(_.dv.map(_.path)).distinct
      dvDirs should have size 1
      // purge: rewrite drops masked rows physically and clears descriptors
      TableOps.compact(t, targetFileSizeBytes = 1L << 20)
      val purged = t.snapshot
      purged.files.foreach(_.dv shouldBe None)
      t.toDF.count() shouldBe 150L
      // time travel to the masked version still reads through the sidecar
      t.toDFAt(1).count() shouldBe 150L
      // vacuum at the post-purge horizon: the sidecar is now unreferenced
      // but YOUNG — the in-flight age guard must keep it on disk
      TableOps.vacuum(t, purged.version)
      Files.exists(Paths.get(tablePath, dvDirs.head)) shouldBe true
    }

    it("REORG APPLY (PURGE) rewrites exactly the DV carriers; clean files stay") {
      import spark.implicits._
      val t = mkTable(100, parts = 4)
      TableOps.delete(t, Some("id = 0")) // masks exactly the holding file
      val masked = GraftTable.forPath(spark, tablePath)
      val dvFiles = masked.snapshot.files.filter(_.dv.exists(_.cardinality > 0))
      val cleanPaths = masked.snapshot.files
        .filterNot(_.dv.exists(_.cardinality > 0)).map(_.path).toSet
      assert(dvFiles.nonEmpty && cleanPaths.nonEmpty, "fixture needs both kinds")

      val v = spark.sql(s"REORG TABLE '$tablePath' APPLY (PURGE)")
        .collect()(0).getLong(0)
      val after = GraftTable.forPath(spark, tablePath)
      assert(after.version == v)
      // every DV is gone, the clean files were NOT rewritten
      assert(after.snapshot.files.forall(_.dv.isEmpty))
      assert(cleanPaths.subsetOf(after.snapshot.files.map(_.path).toSet))
      assert(after.toDF.count() == 99)
      assert(after.toDF.where("id = 0").count() == 0)
      val (_, ci) = after.history().head
      assert(ci.operation == "OPTIMIZE" &&
        ci.operationParameters.get("applyPurge").contains("true"))
      assert(ci.operationMetrics("numDeletionVectorsRemoved").toInt == dvFiles.size)

      // nothing left to purge: a second REORG is a no-op (no commit)
      assert(TableOps.reorgPurge(after) == after.version)
    }

    it("UPDATE masks old row versions and appends only the new ones") {
      val t = mkTable(n = 100, parts = 4, cdf = true)
      val beforePaths = t.snapshot.files.map(_.path).toSet
      TableOps.update(t, Some("id < 10"), Map("name" -> "concat('upd_', id)"))
      val snap = t.snapshot
      t.toDF.count() shouldBe 100L
      t.toDF.where(col("name").startsWith("upd_")).count() shouldBe 10L
      t.toDF.where(col("id") < 10 && !col("name").startsWith("upd_")).count() shouldBe 0L
      // old files survive (masked), new files carry only the 10 updated rows
      beforePaths.subsetOf(snap.files.map(_.path).toSet) shouldBe true
      val newFiles = snap.files.filterNot(f => beforePaths.contains(f.path))
      newFiles.flatMap(f => graft.tables.GraftLog.parseStats(f.stats))
        .map(_.numRecords).sum shouldBe 10L
      snap.files.filter(f => beforePaths.contains(f.path))
        .flatMap(_.dv).map(_.cardinality).sum shouldBe 10L
      val h = t.history().head._2
      h.operation shouldBe "UPDATE"
      h.operationMetrics("numUpdatedRows") shouldBe "10"
      h.operationMetrics("numCopiedRows") shouldBe "0"
      // CDC carries pre+post images
      val cdf = graft.log.ChangeDataFeedHelper(spark, tablePath, 1, 1).readCDF
      cdf.where("_change_type = 'update_preimage'").count() shouldBe 10L
      cdf.where("_change_type = 'update_postimage'").count() shouldBe 10L
    }

    it("UPDATE then DELETE compose through merged positions") {
      val t = mkTable(n = 60, parts = 3)
      TableOps.update(t, Some("id % 6 = 0"), Map("bucket" -> "99"))
      TableOps.delete(t, Some("bucket = 99"))
      t.toDF.count() shouldBe 50L
      t.toDF.where("id % 6 = 0").count() shouldBe 0L
      // rewrite-equivalent check
      val expect = (0 until 60).filterNot(_ % 6 == 0).map(_.toLong).sorted
      t.toDF.select("id").collect().map(_.getLong(0)).sorted shouldBe expect.toArray
    }

    it("routes SQL DELETE through deletion vectors") {
      val t = mkTable()
      val before = t.snapshot.files.map(_.path).toSet
      graft.sql.GraftSql.sql(spark, s"DELETE FROM '$tablePath' WHERE id < 30")
      val after = GraftTable.forPath(spark, tablePath).snapshot
      after.files.map(_.path).toSet shouldBe before
      after.files.flatMap(_.dv).map(_.cardinality).sum shouldBe 30L
      GraftTable.forPath(spark, tablePath).toDF.count() shouldBe 70L
    }
  }
}
