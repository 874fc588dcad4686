package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, PhysicalWriteInfo}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funspec.AnyFunSpec

import graft.streaming.{GraftEpochFilesMessage, GraftStreamingWrite}
import graft.tables.GraftTable

/** The V2 `StreamingWrite` behind `writeStream.toTable("graft_cat.ns.t")`:
  * per-task parquet DataWriters staging each epoch under the table, driver
  * commit registering the staged files atomically with the
  * `SetTransaction(appId, epoch)` watermark — plus the feature fallback
  * that routes constraint/generated-column tables through the full
  * DataFrame engine.
  */
class GraftStreamingWriteSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  // the JVM-shared warehouse (parallel suites, one session — see
  // SparkSessionTestWrapper.catalogWarehouse)
  private lazy val warehouse: String = SparkSessionTestWrapper.catalogWarehouse

  it("toTable streams into a partitioned catalog table; restart appends only new data") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.sw")
    val src = Files.createTempDirectory("sw-src").toString
    val ckpt = Files.createTempDirectory("sw-ckpt").toString
    spark.range(0, 40).select(col("id"), (col("id") % 3).cast("string").as("p"))
      .write.mode("overwrite").parquet(s"$src/files")
    def run(): Unit = {
      val q = spark.readStream.schema("id BIGINT, p STRING").parquet(s"$src/files")
        .writeStream.partitionBy("p")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("graft_cat.sw.t")
      q.awaitTermination(120000)
    }
    run()
    val t = GraftTable.forName(spark, "graft_cat.sw.t")
    assert(t.snapshot.metadata.partitionColumns == Seq("p"))
    assert(spark.table("graft_cat.sw.t").count() == 40)
    // partition values landed as dir-encoded values, exactly the batch
    // writer's layout
    assert(spark.table("graft_cat.sw.t").where("p = '1'").count() == 13)
    assert(t.history().exists(_._2.operation == "STREAMING UPDATE"))
    // restart with one NEW source file: only the delta appends
    spark.range(100, 110).select(col("id"), lit("9").as("p"))
      .write.mode("append").parquet(s"$src/files")
    run()
    assert(spark.table("graft_cat.sw.t").count() == 50)
    // and a replay-restart with nothing new appends nothing
    run()
    assert(spark.table("graft_cat.sw.t").count() == 50)
    // no staging debris left under the table
    val leftover = Files.list(Paths.get(warehouse, "sw", "t")).toArray
      .map(_.toString).filter(_.contains(".graft-stream-epoch-"))
    assert(leftover.isEmpty, s"staging debris: ${leftover.mkString(", ")}")
  }

  it("a replayed epoch commit is skipped and its staging cleaned (zombie attempt)") {
    val dir = tmpTableDir("sw-replay")
    GraftTable.create(spark, dir,
      spark.range(5).select(col("id"), (col("id") % 2).cast("string").as("p")),
      partitionColumns = Seq("p"))
    val schema = StructType.fromDDL("id BIGINT, p STRING")
    def info(app: String): LogicalWriteInfo = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("txnAppId", app))
      override def queryId(): String = "spec-query"
      override def schema(): StructType = StructType.fromDDL("id BIGINT, p STRING")
    }
    val phys = new PhysicalWriteInfo { override def numPartitions(): Int = 1 }
    def writeEpoch(epoch: Long, ids: Seq[Long]): Unit = {
      val w = new GraftStreamingWrite(dir, info("sw-app"), overwrite = false)
      val factory = w.createStreamingWriterFactory(phys)
      val task = factory.createWriter(0, 7L, epoch)
      ids.foreach(i => task.write(InternalRow(i, UTF8String.fromString((i % 2).toString))))
      w.commit(epoch, Array(task.commit()))
    }
    writeEpoch(0L, Seq(10L, 11L, 12L))
    val afterFirst = GraftTable.forPath(spark, dir).toDF.count()
    assert(afterFirst == 8)
    val vFirst = new graft.tables.GraftLog(dir).latestVersion()
    // zombie replay of the SAME epoch: fresh staging is written, but the
    // watermark makes the commit a no-op and the staging is removed
    writeEpoch(0L, Seq(10L, 11L, 12L))
    assert(GraftTable.forPath(spark, dir).toDF.count() == 8)
    assert(new graft.tables.GraftLog(dir).latestVersion() == vFirst)
    assert(!Files.list(Paths.get(dir)).toArray.map(_.toString)
      .exists(_.contains(".graft-stream-epoch-")))
    // the NEXT epoch lands normally
    writeEpoch(1L, Seq(20L))
    assert(GraftTable.forPath(spark, dir).toDF.count() == 9)
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.transactions.get("sw-app").contains(1L))
    // partition dirs carry the values, stats were harvested per file
    assert(snap.files.forall(f => f.partitionValues.contains("p") && f.stats.nonEmpty))
  }

  it("feature tables (CHECK constraint) fall back to the full engine and enforce") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.swc")
    spark.sql("CREATE TABLE graft_cat.swc.t (id BIGINT, p STRING) USING graft")
    val path = Paths.get(warehouse, "swc", "t").toString
    graft.sql.GraftSql.sql(spark, s"ALTER TABLE '$path' ADD CONSTRAINT small CHECK (id < 100)")
    val src = Files.createTempDirectory("swc-src").toString
    spark.range(0, 20).select(col("id"), lit("a").as("p"))
      .write.mode("overwrite").parquet(s"$src/ok")
    val q = spark.readStream.schema("id BIGINT, p STRING").parquet(s"$src/ok")
      .writeStream.option("checkpointLocation", Files.createTempDirectory("swc-ck1").toString)
      .trigger(Trigger.AvailableNow()).toTable("graft_cat.swc.t")
    q.awaitTermination(120000)
    assert(spark.table("graft_cat.swc.t").count() == 20)
    // a violating epoch fails the STREAM and commits nothing
    spark.range(95, 105).select(col("id"), lit("b").as("p"))
      .write.mode("overwrite").parquet(s"$src/bad")
    val qBad = spark.readStream.schema("id BIGINT, p STRING").parquet(s"$src/bad")
      .writeStream.option("checkpointLocation", Files.createTempDirectory("swc-ck2").toString)
      .trigger(Trigger.AvailableNow()).toTable("graft_cat.swc.t")
    val failed = intercept[Exception] { qBad.awaitTermination(120000) }
    assert(String.valueOf(failed.getMessage).contains("CHECK constraint") ||
      failed.getCause != null)
    assert(spark.table("graft_cat.swc.t").count() == 20)
  }

  it("commit registers ONLY message-listed files; orphan attempt files are pruned") {
    val dir = tmpTableDir("sw-prune")
    GraftTable.create(spark, dir, spark.range(2).toDF("id"))
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("txnAppId", "prune-app"))
      override def queryId(): String = "spec-prune"
      override def schema(): StructType = StructType.fromDDL("id BIGINT")
    }
    val w = new GraftStreamingWrite(dir, info, overwrite = false)
    val factory = w.createStreamingWriterFactory(
      new PhysicalWriteInfo { override def numPartitions(): Int = 2 })
    // task 0 commits its message; task 1 simulates a lost attempt whose
    // abort never ran: its (possibly torn) file stays in staging with NO
    // message — the commit must prune it, not register it as table data
    val good = factory.createWriter(0, 1L, 0L)
    good.write(InternalRow(10L))
    val goodMsg = good.commit().asInstanceOf[GraftEpochFilesMessage]
    val lost = factory.createWriter(1, 2L, 0L)
    lost.write(InternalRow(999L))
    lost.commit() // file closed on disk, but the MESSAGE is never delivered
    w.commit(0L, Array(goodMsg))
    val rows = GraftTable.forPath(spark, dir).toDF
      .select("id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(0L, 1L, 10L), s"orphan attempt rows must not commit, got $rows")
  }

  it("a MAPPED table (renamed column) falls back to the full engine and keeps data") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.swm")
    spark.sql("CREATE TABLE graft_cat.swm.t AS SELECT CAST(0 AS BIGINT) AS id, 'seed' AS v")
    spark.sql("ALTER TABLE graft_cat.swm.t RENAME COLUMN v TO w") // table now mapped
    val src = Files.createTempDirectory("sw-mapped-src").toString
    spark.range(1, 6).select(col("id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("x"), col("id")).as("w"))
      .write.mode("overwrite").parquet(s"$src/f")
    // the V2 StreamingWrite path: the mapping gate must see the TABLE's
    // schema (the stream schema carries no physicalName metadata) and route
    // every epoch through the DataFrame engine, which writes physical names
    val q = spark.readStream.schema("id BIGINT, w STRING").parquet(s"$src/f")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("sw-mapped-ck").toString)
      .option("txnAppId", "sw-mapped-app")
      .trigger(Trigger.AvailableNow()).toTable("graft_cat.swm.t")
    q.awaitTermination(120000)
    val read = spark.table("graft_cat.swm.t")
    assert(read.count() == 6)
    assert(read.where("w IS NULL").count() == 0,
      "mapped-table epochs must route through the DataFrame engine (physical names)")
    assert(read.where("w = 'x3'").count() == 1)
  }

  it("vacuum's staging sweep keys on the whole TREE's newest mtime") {
    val dir = tmpTableDir("sw-sweep")
    GraftTable.create(spark, dir, spark.range(3).toDF("id"))
    val old = System.currentTimeMillis() - 2 * graft.operators.TableOps.StreamStagingMinAgeMillis
    def mk(name: String, innerAge: Long): java.nio.file.Path = {
      val d = Paths.get(dir, name)
      Files.createDirectories(d)
      val f = d.resolve("part-0.parquet")
      Files.write(f, Array[Byte](1, 2, 3))
      Files.setLastModifiedTime(d, java.nio.file.attribute.FileTime.fromMillis(old))
      Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(innerAge))
      d
    }
    // LIVE epoch: stale root mtime but a freshly-written inner file
    val live = mk(".graft-stream-epoch-live", System.currentTimeMillis())
    // DEAD epoch: everything idle past the guard
    val dead = mk(".graft-stream-epoch-dead", old)
    val swept = graft.operators.TableOps.streamStagingOrphanDirs(dir)
    assert(swept.map(graft.tables.Fs.fileName) == Seq(".graft-stream-epoch-dead"))
    assert(Files.exists(live) && Files.exists(dead))
  }

  it("special-character and null partition values round-trip the dir escaping") {
    val dir = tmpTableDir("sw-esc")
    GraftTable.create(spark, dir,
      Seq((0L, "seed")).toDF("id", "p"), partitionColumns = Seq("p"))
    val schema = StructType.fromDDL("id BIGINT, p STRING")
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("txnAppId", "esc-app"))
      override def queryId(): String = "spec-esc"
      override def schema(): StructType = StructType.fromDDL("id BIGINT, p STRING")
    }
    val w = new GraftStreamingWrite(dir, info, overwrite = false)
    val factory = w.createStreamingWriterFactory(
      new PhysicalWriteInfo { override def numPartitions(): Int = 1 })
    val task = factory.createWriter(0, 1L, 0L)
    // the characters Spark's partition-path escaping must protect — plus a
    // multi-byte char and a NULL (the __HIVE_DEFAULT_PARTITION__ token)
    val values = Seq("a/b", "k=v", "50%", "dot:colon", "café", "sp ace", null)
    values.zipWithIndex.foreach { case (v, i) =>
      task.write(InternalRow(i.toLong + 100L,
        if (v == null) null else UTF8String.fromString(v)))
    }
    w.commit(0L, Array(task.commit()))
    val read = GraftTable.forPath(spark, dir).toDF
    val got = read.where("id >= 100")
      .select("id", "p").as[(Long, String)].collect().toMap
    values.zipWithIndex.foreach { case (v, i) =>
      assert(got.get(i.toLong + 100L).contains(v),
        s"partition value ${Option(v)} must round-trip, got ${got.get(i.toLong + 100L)}")
    }
    // and partition pruning on an escaped value still works
    assert(read.where(col("p") === "k=v").count() == 1)
    assert(read.where("p IS NULL").count() == 1)
  }

  it("abort deletes the epoch's staging files") {
    val dir = tmpTableDir("sw-abort")
    GraftTable.create(spark, dir, spark.range(3).toDF("id"))
    val schema = StructType.fromDDL("id BIGINT")
    val info = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap =
        new CaseInsensitiveStringMap(java.util.Map.of("txnAppId", "abort-app"))
      override def queryId(): String = "spec-abort"
      override def schema(): StructType = StructType.fromDDL("id BIGINT")
    }
    val w = new GraftStreamingWrite(dir, info, overwrite = false)
    val factory = w.createStreamingWriterFactory(
      new PhysicalWriteInfo { override def numPartitions(): Int = 1 })
    val task = factory.createWriter(0, 3L, 0L)
    task.write(InternalRow(42L))
    val msg = task.commit().asInstanceOf[GraftEpochFilesMessage]
    assert(Files.exists(Paths.get(msg.stagingDir)))
    w.abort(0L, Array(msg))
    assert(!Files.exists(Paths.get(msg.stagingDir)))
    // nothing committed
    assert(GraftTable.forPath(spark, dir).toDF.count() == 3)
  }
}
