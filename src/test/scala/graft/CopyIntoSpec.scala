package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables.{Fs, GraftTable}

/** COPY INTO: idempotent bulk-file ingestion — every matched source file
  * loads exactly once across re-runs, with the memory carried in the table
  * log (embedded for small batches, `_copy_into/` sidecars for large).
  */
class CopyIntoSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def freshDir(): String = Files.createTempDirectory("graft-copyinto").toString

  /** Write one parquet FILE (not directory) named `name` under `dir`. */
  private def landParquet(dir: String, name: String, ids: Range): Unit = {
    val stage = Fs.child(dir, s".stage_$name")
    ids.map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1).write.parquet(stage)
    val part = Fs.walkFiles(stage).find(_.endsWith(".parquet")).get
    Fs.moveNoReplace(part, Fs.child(dir, name))
    Fs.deleteRecursively(stage)
  }

  it("loads each file once across re-runs; new landings load incrementally") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    landParquet(land, "a.parquet", 0 until 10)
    landParquet(land, "b.parquet", 10 until 25)
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))

    val t = GraftTable.forPath(spark, tbl)
    val (v1, rows1, copied1, skipped1) = TableOps.copyInto(t, land, "parquet")
    assert((rows1, copied1, skipped1) == (25L, 2L, 0L), s"got $rows1/$copied1/$skipped1")
    assert(GraftTable.forPath(spark, tbl).toDF.count() == 25)

    // re-run: pure no-op — no commit, nothing read
    val before = GraftTable.forPath(spark, tbl).version
    val (v2, rows2, copied2, skipped2) = TableOps.copyInto(t, land, "parquet")
    assert((rows2, copied2, skipped2) == (0L, 0L, 2L))
    assert(v2 == before && GraftTable.forPath(spark, tbl).version == before)

    // a third file lands: only IT loads
    landParquet(land, "c.parquet", 25 until 30)
    val (_, rows3, copied3, skipped3) = TableOps.copyInto(t, land, "parquet")
    assert((rows3, copied3, skipped3) == (5L, 1L, 2L))
    assert(GraftTable.forPath(spark, tbl).toDF.count() == 30)
    assert(GraftTable.forPath(spark, tbl).toDF.select("id").as[Long]
      .collect().sorted.toSeq == (0L until 30L))
    assert(v1 != before || true)
  }

  it("force re-loads; PATTERN filters; hidden files are ignored") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    landParquet(land, "x.parquet", 0 until 4)
    landParquet(land, "y.snappy", 4 until 8)   // wrong extension for the pattern
    landParquet(land, "_committed.parquet", 100 until 104) // hidden convention
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val t = GraftTable.forPath(spark, tbl)

    val (_, rows1, copied1, _) =
      TableOps.copyInto(t, land, "parquet", pattern = Some("*.parquet"))
    assert((rows1, copied1) == (4L, 1L))

    // force re-loads the matched file even though it is recorded
    val (_, rows2, copied2, _) =
      TableOps.copyInto(t, land, "parquet", pattern = Some("*.parquet"), force = true)
    assert((rows2, copied2) == (4L, 1L))
    assert(GraftTable.forPath(spark, tbl).toDF.count() == 8)
  }

  it("distributed source listing (forced threshold) matches the driver walk exactly") {
    // a landing zone with many top-level dirs (dt=... ingestion partitions)
    // past spark.graft.copyInto.distributedListingThreshold lists one task
    // per dir via the vacuum sweep's fan-out — candidates, pattern filter,
    // hidden-file exclusion and loaded counts must be IDENTICAL to the
    // single-threaded driver walk
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    (0 until 6).foreach { d =>
      val sub = Fs.child(land, s"dt=$d"); Fs.mkdirs(sub)
      landParquet(sub, s"f$d.parquet", (d * 10) until (d * 10 + 10))
    }
    landParquet(land, "loose.parquet", 60 until 65)
    // hidden/dir-convention noise the filters must drop in BOTH modes
    Fs.mkdirs(Fs.child(land, "_staging"))
    landParquet(Fs.child(land, "_staging"), "x.parquet", 900 until 905)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(Fs.child(land, ".hidden")), Array[Byte](1))

    def run(threshold: String): (Long, Long, Long) = {
      val tbl = Fs.child(root, s"t$threshold")
      GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
      spark.conf.set("spark.graft.copyInto.distributedListingThreshold", threshold)
      try {
        val (_, rows, copied, skipped) =
          TableOps.copyInto(GraftTable.forPath(spark, tbl), land, "parquet")
        assert(GraftTable.forPath(spark, tbl).toDF.select("id").as[Long]
          .collect().sorted.toSeq == (0L until 65L))
        (rows, copied, skipped)
      } finally spark.conf.unset("spark.graft.copyInto.distributedListingThreshold")
    }
    val driver = run("1000") // driver walk (threshold never reached)
    val fanned = run("1")    // every top-level dir fans out
    assert(driver == ((65L, 7L, 0L)), s"driver walk got $driver")
    assert(fanned == driver, s"fan-out listing diverged: $fanned vs $driver")
  }

  it("CSV parses with the TARGET schema and format options") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    Fs.writeAtomic(Fs.child(land, "d.csv"),
      "id|v\n1|one\n2|two\n".getBytes("UTF-8"))
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val t = GraftTable.forPath(spark, tbl)
    val (_, rows, copied, _) = TableOps.copyInto(t, land, "csv",
      formatOptions = Map("header" -> "true", "sep" -> "|"))
    assert((rows, copied) == (2L, 1L))
    val got = GraftTable.forPath(spark, tbl).toDF.as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(1L -> "one", 2L -> "two"))
  }

  it("batches past the embed limit record through a _copy_into sidecar") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    // one parquet DIRECTORY with > CopyIntoEmbedLimit part files
    (0 until 1100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(550).write.parquet(Fs.child(land, "bulk"))
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val t = GraftTable.forPath(spark, tbl)
    val (v1, rows1, copied1, _) = TableOps.copyInto(t, land, "parquet")
    assert(rows1 == 1100L && copied1 > TableOps.CopyIntoEmbedLimit, s"$rows1/$copied1")
    val ci = t.log.actionsAt(v1)
      .collectFirst { case c: graft.tables.CommitInfo => c }.get
    assert(ci.operationParameters.contains("copyFilesSidecar"))
    assert(!ci.operationParameters.contains("copyFiles"))
    assert(Fs.isDirectory(Fs.child(Fs.child(tbl, TableOps.CopyIntoDirName),
      ci.operationParameters("copyFilesSidecar"))))
    // the sidecar memory dedupes the re-run
    val (_, rows2, copied2, skipped2) = TableOps.copyInto(t, land, "parquet")
    assert((rows2, copied2) == (0L, 0L) && skipped2 == copied1)

    // a MISSING sidecar of a live commit must refuse loudly — silently
    // dropping it would re-load every file that commit recorded
    Fs.deleteRecursively(Fs.child(Fs.child(tbl, TableOps.CopyIntoDirName),
      ci.operationParameters("copyFilesSidecar")))
    val e = intercept[IllegalStateException] { TableOps.copyInto(t, land, "parquet") }
    assert(e.getMessage.contains("memory sidecar"), e.getMessage)
    // a clone of the damaged source refuses the same way
    val e2 = intercept[IllegalStateException] {
      GraftTable.shallowClone(spark, tbl, Fs.child(root, "t-clone"))
    }
    assert(e2.getMessage.contains("ingestion memory"), e2.getMessage)
    // force stays the explicit escape hatch: deliberate full re-load
    val (_, rows3, copied3, _) = TableOps.copyInto(t, land, "parquet", force = true)
    assert(rows3 == 1100L && copied3 == copied1)
  }

  it("RACING loads never double-ingest: the loser aborts on the watermark") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    landParquet(land, "a.parquet", 0 until 10)
    landParquet(land, "b.parquet", 10 until 25)
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val t = GraftTable.forPath(spark, tbl)

    // both threads pass the barrier BEFORE either can commit, so both
    // decide from the pre-ingest snapshot: exactly one may land
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentHashMap[Int, Either[Throwable, (Long, Long, Long, Long)]]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        barrier.await()
        results.put(i,
          try Right(TableOps.copyInto(t, land, "parquet"))
          catch { case e: Throwable => Left(e) })
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(results.size == 2, "both racers must finish")
    val (wins, losses) = (0 until 2).map(results.get).partition(_.isRight)
    assert(wins.size == 1, s"exactly one racer may ingest, got $results")
    assert(wins.head.toOption.get._3 == 2L) // both files, once
    // the loser failed LOUDLY (watermark/OCC), it did not silently no-op
    assert(losses.head.swap.toOption.get.getMessage != null)
    assert(GraftTable.forPath(spark, tbl).toDF.count() == 25)
    // the loser's documented recovery — re-run — is a clean skip
    val (_, rows, copied, skipped) = TableOps.copyInto(t, land, "parquet")
    assert((rows, copied, skipped) == (0L, 0L, 2L))
    assert(GraftTable.forPath(spark, tbl).toDF.count() == 25)
  }

  it("CLONES carry the ingestion memory: a cloned table does not re-load") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    landParquet(land, "a.parquet", 0 until 10)
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val t = GraftTable.forPath(spark, tbl)
    TableOps.copyInto(t, land, "parquet")

    // DEEP clone: memory carried, the clone skips the loaded file and
    // ingests only what lands AFTER the clone
    val deep = GraftTable.deepClone(spark, tbl, Fs.child(root, "deep"))
    landParquet(land, "b.parquet", 10 until 14)
    val (_, dRows, dCopied, dSkipped) = TableOps.copyInto(deep, land, "parquet")
    assert((dRows, dCopied, dSkipped) == (4L, 1L, 1L), s"$dRows/$dCopied/$dSkipped")
    assert(deep.toDF.count() == 14)

    // SHALLOW clone carries the memory too — t has loaded only a.parquet,
    // so the clone skips it and ingests b.parquet
    val sc = GraftTable.shallowClone(spark, tbl, Fs.child(root, "shallow"))
    val (_, sRows, sCopied, sSkipped) = TableOps.copyInto(sc, land, "parquet")
    assert((sRows, sCopied, sSkipped) == (4L, 1L, 1L), s"$sRows/$sCopied/$sSkipped")

    // a LARGE memory (sidecar path) consolidates into the clone
    val wide = Fs.child(root, "wide"); Fs.mkdirs(wide)
    (0 until 1100).map(i => (i.toLong, s"w$i")).toDF("id", "v")
      .repartition(550).write.parquet(Fs.child(wide, "bulk"))
    val big = Fs.child(root, "big")
    GraftTable.create(spark, big, Seq.empty[(Long, String)].toDF("id", "v"))
    val tb = GraftTable.forPath(spark, big)
    TableOps.copyInto(tb, wide, "parquet")
    val bigClone = GraftTable.deepClone(spark, big, Fs.child(root, "bigclone"))
    val ci = bigClone.log.actionsAt(0L)
      .collectFirst { case c: graft.tables.CommitInfo => c }.get
    assert(ci.operationParameters.contains("copyFilesSidecar"))
    val (_, bRows, bCopied, bSkipped) = TableOps.copyInto(bigClone, wide, "parquet")
    assert(bRows == 0L && bCopied == 0L && bSkipped > 500L, s"$bRows/$bCopied/$bSkipped")
  }

  it("SQL surface: COPY INTO with options; watermark serializes racing loads") {
    val root = freshDir()
    val land = Fs.child(root, "landing"); Fs.mkdirs(land)
    val tbl = Fs.child(root, "t")
    landParquet(land, "a.parquet", 0 until 6)
    GraftTable.create(spark, tbl, Seq.empty[(Long, String)].toDF("id", "v"))
    val r1 = spark.sql(
      s"COPY INTO '$tbl' FROM '$land' FILEFORMAT = PARQUET PATTERN = '*.parquet'")
      .collect()(0)
    assert(r1.getLong(1) == 6L && r1.getLong(2) == 1L && r1.getLong(3) == 0L)
    val r2 = spark.sql(
      s"COPY INTO '$tbl' FROM '$land' FILEFORMAT = PARQUET " +
        "COPY_OPTIONS ('force' = 'true')").collect()(0)
    assert(r2.getLong(1) == 6L && r2.getLong(2) == 1L)
    // the SetTransaction watermark advanced once per LOADING run
    val t = GraftTable.forPath(spark, tbl)
    assert(t.snapshot.transactions(TableOps.CopyIntoTxnApp) == 1L)
  }
}
