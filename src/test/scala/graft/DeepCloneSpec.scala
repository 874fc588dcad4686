package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables.{DeletionVectors, Fs, GraftLog, GraftTable}

/** DEEP CLONE: byte-identical distributed file copy into an independent
  * table — stats, partition values and DV/bloom sidecars carried over, no
  * recompression, and full independence from the source afterward.
  */
class DeepCloneSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val warehouse: String = SparkSessionTestWrapper.catalogWarehouse

  private def freshDir(): String =
    Files.createTempDirectory("graft-deepclone").toString

  it("copies a partitioned table byte-for-byte: contents, stats, layout carry") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    val df = (0 until 200).map(i => (i.toLong, s"n_$i", i % 4)).toDF("id", "name", "p")
    GraftTable.create(spark, src, df, partitionColumns = Seq("p"),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val t = GraftTable.deepClone(spark, src, dst)

    // identical contents, one commit, CLONE provenance
    assert(t.toDF.orderBy("id").collect().toSeq ==
      GraftTable.forPath(spark, src).toDF.orderBy("id").collect().toSeq)
    val ci = t.log.actionsAt(0L).collectFirst { case c: graft.tables.CommitInfo => c }.get
    assert(ci.operation == "CLONE" && ci.operationParameters("isShallow") == "false")

    // every AddFile is table-relative (no external refs), same relative
    // paths and the same per-file stats as the source — skipping works
    // from commit 0
    val srcFiles = GraftTable.forPath(spark, src).snapshot.files
      .map(f => f.path -> f.stats).toMap
    t.snapshot.files.foreach { f =>
      assert(!GraftTable.isExternalPath(f.path), f.path)
      assert(srcFiles(f.path) == f.stats, s"stats drifted for ${f.path}")
      assert(Fs.size(Fs.child(dst, f.path)) == f.size)
    }
    // partitioning and properties (CDF flag) carried
    assert(t.snapshot.metadata.partitionColumns == Seq("p"))
    assert(t.snapshot.cdfEnabled)
  }

  it("the clone is independent in both directions") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src,
      (0 until 50).map(i => (i.toLong, i.toString)).toDF("id", "v"))
    val clone = GraftTable.deepClone(spark, src, dst)
    val srcT = GraftTable.forPath(spark, src)
    TableOps.delete(srcT, Some("id >= 25"))
    assert(clone.toDF.count() == 50)
    TableOps.delete(GraftTable.forPath(spark, dst), Some("id < 10"))
    assert(GraftTable.forPath(spark, dst).toDF.count() == 40)
    assert(GraftTable.forPath(spark, src).toDF.count() == 25)
  }

  it("VERSION AS OF clones the historical state") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src, (0 until 30).map(i => Tuple1(i.toLong)).toDF("id"))
    val srcT = GraftTable.forPath(spark, src)
    TableOps.delete(srcT, Some("id >= 10"))
    val clone = GraftTable.deepClone(spark, src, dst, asOfVersion = Some(0L))
    assert(clone.toDF.count() == 30)
    assert(clone.log.actionsAt(0L).collectFirst { case c: graft.tables.CommitInfo => c }
      .get.operationParameters("sourceVersion") == "0")
  }

  it("carries deletion-vector sidecars; survives vacuum of the source") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src,
      (0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "b"),
      properties = Map(DeletionVectors.Property -> "true"))
    TableOps.delete(GraftTable.forPath(spark, src), Some("id % 2 = 0"))
    val srcT = GraftTable.forPath(spark, src)
    assert(srcT.snapshot.files.exists(_.dv.isDefined), "precondition: DV delete")

    val clone = GraftTable.deepClone(spark, src, dst)
    assert(clone.snapshot.files.exists(_.dv.isDefined))
    assert(clone.toDF.count() == 50)
    // destroy the source entirely — the deep clone must keep reading
    Fs.deleteRecursively(src)
    assert(GraftTable.forPath(spark, dst).toDF.count() == 50)
    assert(GraftTable.forPath(spark, dst).toDF.where("id % 2 = 0").count() == 0)
  }

  it("keeps hidden artifacts (checksum crc, _SUCCESS markers) out of the copy plan") {
    // Hadoop's local ChecksumFileSystem RECREATES `.crc` sidecars as a side
    // effect of copying their data file — if a crc enters the plan, a
    // sibling task's raw copy of the same path races that write (the
    // round-16 DeepCloneSpec flake). Seed hidden files into a DV sidecar
    // dir and the table root; the clone must succeed and carry none of them.
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src,
      (0 until 100).map(i => (i.toLong, i % 5)).toDF("id", "b"),
      properties = Map(DeletionVectors.Property -> "true"))
    TableOps.delete(GraftTable.forPath(spark, src), Some("id % 2 = 0"))
    val dvDirs = Fs.walkFiles(Fs.child(src, DeletionVectors.DirName))
      .map(f => new java.io.File(f).getParent).distinct
    assert(dvDirs.nonEmpty, "precondition: DV sidecar dir exists")
    dvDirs.foreach { d =>
      Files.write(java.nio.file.Paths.get(d, "._SUCCESS.crc"), Array[Byte](1, 2))
      Files.write(java.nio.file.Paths.get(d, ".part-0.crc"), Array[Byte](3, 4))
      Files.write(java.nio.file.Paths.get(d, "_SUCCESS"), Array.emptyByteArray)
    }
    val clone = GraftTable.deepClone(spark, src, dst)
    assert(clone.toDF.count() == 50)
    val hidden = Fs.walkFiles(dst)
      .filter(f => Fs.fileName(f).startsWith(".") &&
        !f.contains("_graft_log")) // the clone's own log dir is not in scope
    assert(hidden.isEmpty, s"hidden files leaked into the clone: $hidden")
    // the visible (non-hidden) _SUCCESS marker copies fine — only
    // `.`-prefixed names are excluded
  }

  it("a clone racing a source vacuum fails LOUDLY and commits nothing") {
    // posture pin: deepClone takes no lock against a concurrent source
    // vacuum — a vacuumed data file mid-copy fails its task (file gone or
    // length short), the pre-commit fence catches a pruned source version,
    // and in EVERY failure mode the destination has no readable table.
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src,
      (0 until 100).map(i => (i.toLong, s"n_$i")).toDF("id", "name"))
    val t0 = GraftTable.forPath(spark, src)
    // v1 rewrites everything, making v0's files dead; vacuum at v1 deletes
    // them — the "vacuum completed before the copy started" extreme of the
    // race, fully deterministic
    TableOps.update(t0, None, Map("name" -> "concat(name, '!')"))
    spark.conf.set("spark.graft.vacuum.untrackedMinAgeMillis", "0")
    try TableOps.vacuum(GraftTable.forPath(spark, src),
      GraftTable.forPath(spark, src).version)
    finally spark.conf.unset("spark.graft.vacuum.untrackedMinAgeMillis")
    val e = intercept[Exception] {
      GraftTable.deepClone(spark, src, dst, asOfVersion = Some(0L))
    }
    // loud either way: the pruned-version refusal (log cleanup ran) or the
    // copy task's FileNotFound (files gone, log retained)
    assert(e.getMessage != null)
    assert(!GraftTable.exists(dst), "a failed clone must not be readable")
  }

  it("carries bloom sidecars under _bloom/; probes keep pruning after source loss") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src,
      spark.range(0, 1024).selectExpr("id * 2 AS k", "concat('v', id) AS v")
        .repartition(8),
      properties = Map(
        graft.tables.BloomIndex.ColumnsProperty -> "k",
        graft.tables.BloomIndex.BitsProperty -> (1 << 16).toString))
    val srcT = GraftTable.forPath(spark, src)
    assert(srcT.snapshot.files.exists(f =>
      GraftLog.parseStats(f.stats).exists(_.bloomSidecar.isDefined)),
      "precondition: bloom sidecars written")
    val clone = GraftTable.deepClone(spark, src, dst)
    // sidecar ids carried verbatim and the dirs exist under the CLONE
    clone.snapshot.files.flatMap(f => GraftLog.parseStats(f.stats).flatMap(_.bloomSidecar))
      .foreach { id =>
        assert(Fs.isDirectory(Fs.child(Fs.child(dst, "_bloom"), id)), id)
      }
    Fs.deleteRecursively(src)
    // an equality probe on an absent even key reads NOTHING (bloom prune;
    // range stats alone keep every file — k is round-robin across files)
    val miss = GraftTable.forPath(spark, dst).toDF.where("k = 3").count()
    assert(miss == 0)
    assert(GraftTable.forPath(spark, dst).toDF.where("k = 6").count() == 1)
  }

  it("deep clone of a SHALLOW clone materializes the external references") {
    val root = freshDir()
    val src = Fs.child(root, "src")
    val mid = Fs.child(root, "mid")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src, (0 until 40).map(i => Tuple1(i.toLong)).toDF("id"))
    GraftTable.shallowClone(spark, src, mid)
    val deep = GraftTable.deepClone(spark, mid, dst)
    assert(deep.snapshot.files.forall(f => !GraftTable.isExternalPath(f.path)))
    // the ORIGINAL source can vanish; the deep clone owns its bytes
    Fs.deleteRecursively(src)
    assert(GraftTable.forPath(spark, dst).toDF.count() == 40)
  }

  it("SQL: CREATE TABLE ... DEEP CLONE on paths and catalog identifiers") {
    val _ = warehouse
    val root = freshDir()
    val src = Fs.child(root, "src")
    val dst = Fs.child(root, "dst")
    GraftTable.create(spark, src, (0 until 20).map(i => Tuple1(i.toLong)).toDF("id"))
    val row = spark.sql(s"CREATE TABLE '$dst' DEEP CLONE '$src'").collect()(0)
    assert(row.getLong(0) == 0L && row.getLong(1) > 0L)
    assert(GraftTable.forPath(spark, dst).toDF.count() == 20)
    assert(GraftTable.forPath(spark, dst).log.actionsAt(0L)
      .collectFirst { case c: graft.tables.CommitInfo => c }
      .get.operationParameters("isShallow") == "false")
    // IF NOT EXISTS short-circuits on an existing target
    val again = spark.sql(
      s"CREATE TABLE IF NOT EXISTS '$dst' DEEP CLONE '$src'").collect()(0)
    assert(again.getLong(0) == -1L)
    // catalog-identifier target lands in the warehouse and resolves by name
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.dc")
    spark.sql("DROP TABLE IF EXISTS graft_cat.dc.t")
    spark.sql(s"CREATE TABLE graft_cat.dc.t DEEP CLONE '$src'")
    assert(spark.table("graft_cat.dc.t").count() == 20)
    // SHALLOW keeps working through the same statement (isShallow=true)
    val sdst = Fs.child(root, "sdst")
    spark.sql(s"CREATE TABLE '$sdst' SHALLOW CLONE '$src'")
    assert(GraftTable.forPath(spark, sdst).log.actionsAt(0L)
      .collectFirst { case c: graft.tables.CommitInfo => c }
      .get.operationParameters("isShallow") == "true")
  }

  it("SQL: CLONE ... TIMESTAMP AS OF resolves on the source's history") {
    val root = freshDir()
    val src = Fs.child(root, "ts-src")
    val t = GraftTable.create(spark, src,
      (0 until 5).map(i => Tuple1(i.toLong)).toDF("id"))     // v0: 5 rows
    t.append((5 until 30).map(i => Tuple1(i.toLong)).toDF("id")) // v1: 30 rows
    // pin v0's commit a day back so a between-versions timestamp resolves
    // to it (same monotonized rule as timestampAsOf / RESTORE)
    val log = t.log
    val dayAgo = System.currentTimeMillis() - 24 * 3600 * 1000L
    log.rewriteVersion(0L, log.actionsAt(0L).map {
      case ci: graft.tables.CommitInfo => ci.copy(timestamp = dayAgo)
      case other                       => other
    })
    val ts = new java.sql.Timestamp(dayAgo + 3600 * 1000L).toString
    val dst = Fs.child(root, "ts-dst")
    val row = spark.sql(
      s"CREATE TABLE '$dst' DEEP CLONE '$src' TIMESTAMP AS OF '$ts'").collect()(0)
    assert(row.getLong(0) == 0L, s"resolved source version ${row.getLong(0)}")
    assert(GraftTable.forPath(spark, dst).toDF.count() == 5)
    // a pre-history timestamp refuses loudly
    val early = new java.sql.Timestamp(dayAgo - 3600 * 1000L).toString
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE '${Fs.child(root, "ts-bad")}' " +
        s"SHALLOW CLONE '$src' TIMESTAMP AS OF '$early'")
    }
    assert(e.getMessage.contains("before the table's first commit"), e.getMessage)
  }
}
