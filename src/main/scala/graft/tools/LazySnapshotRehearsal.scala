package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.{DistributedSnapshot, GraftLog, GraftTable}

/** Scale rehearsal for the Dataset-backed read path (LazyFileIndex) — NOT
  * part of the library surface. Builds a REAL table past the default
  * `spark.graft.snapshot.driverFileLimit` (120k one-row parquet files via
  * `maxRecordsPerFile=1` — file-count scale, not byte scale) with a
  * parquet checkpoint, then asserts the 100 TB read posture:
  *
  *  - the table crosses the DEFAULT limit (no conf forcing);
  *  - a POINT query (partition conjunct + id conjunct) returns exactly its
  *    row with ZERO full driver snapshot folds (the per-table fold watch)
  *    — planning never materialized the 120k-entry file list;
  *  - the executed scan read ≤ one partition's files (FileSourceScanExec
  *    numFiles metric), i.e. skipping ran distributed AND pruned;
  *  - driver heap growth across the point query stays bounded (GC'd
  *    before/after; the eager path's fold allocates the full AddFile list
  *    + stats strings);
  *  - the same query through the FORCED eager path (limit lifted) returns
  *    identical rows — parity at the crossover, both timings printed.
  *
  * {{{ sbt "runMain graft.tools.LazySnapshotRehearsal" }}}
  */
object LazySnapshotRehearsal {
  private def timed[A](label: String)(f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"REHEARSAL $label%-28s $s%8.2f s")
    (r, math.round(s * 1000) / 1000.0)
  }

  private def usedHeap(): Long = {
    System.gc(); Thread.sleep(200); System.gc()
    val rt = Runtime.getRuntime
    rt.totalMemory() - rt.freeMemory()
  }

  def main(args: Array[String]): Unit = {
    val nFiles = if (args.nonEmpty) args(0).toInt else 120000
    val scratch = java.nio.file.Files.createTempDirectory("graft-lazy-rehearsal-").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("lazy-snapshot-rehearsal")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = graft.tables.Fs.child(scratch, "t")
    val nBuckets = 1200
    // one row per file: maxRecordsPerFile rolls files WITHIN tasks, so the
    // fan-out costs 128 writer open/closes per task, not 120k task launches
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    val (_, tCreate) = timed(s"create_${nFiles}_files") {
      val df = spark.range(0, nFiles.toLong).select(
        col("id"),
        (col("id") % nBuckets).cast("int").as("bucket"),
        concat(lit("name_"), col("id")).as("name"))
        .repartition(128)
      GraftTable.create(spark, dir, df, partitionColumns = Seq("bucket"),
        properties = Map("graft.checkpoint.format" -> "parquet"))
    }
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    val t = GraftTable.forPath(spark, dir)
    val (_, tCkpt) = timed("parquet_checkpoint") {
      DistributedSnapshot.writeCheckpoint(spark, dir, t.version)
    }
    require(t.snapshot.numFiles >= nFiles,
      s"expected >= $nFiles files, table has ${t.snapshot.numFiles}")

    // the DEFAULT limit routes this table onto the Dataset-backed path
    require(GraftTable.lazyReadEligible(spark, t.log, t.version),
      s"table (${nFiles} files) must cross the DEFAULT driver-file limit " +
        s"(${GraftTable.driverFileLimit(spark)})")

    val probeId = (nFiles * 7L) / 9L
    val probeBucket = (probeId % nBuckets).toInt

    // ---- lazy point query: zero folds, bounded heap, pruned scan ----
    GraftLog.watchFolds(dir)
    val heapBefore = usedHeap()
    val (rows, tLazy) = timed("lazy_point_query") {
      val df = GraftTable.forPath(spark, dir).toDF
        .where(s"bucket = $probeBucket AND id = $probeId")
        .select("id", "name")
      val out = df.collect()
      // executed-scan footprint: the file-source scan's numFiles metric —
      // distributed skipping must have pruned to (at most) one partition
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val numFiles = scans.map(_.metrics("numFiles").value).sum
      require(numFiles > 0 && numFiles <= nFiles / nBuckets,
        s"scan read $numFiles files; expected <= ${nFiles / nBuckets} (one partition)")
      println(s"REHEARSAL scan numFiles = $numFiles (of $nFiles live)")
      out
    }
    val heapAfter = usedHeap()
    val folds = GraftLog.foldCount(dir)
    GraftLog.unwatchFolds(dir)
    require(rows.map(_.getLong(0)).toSeq == Seq(probeId),
      s"point query returned ${rows.mkString(",")}")
    require(rows.head.getString(1) == s"name_$probeId")
    require(folds == 0L, s"lazy point query performed $folds FULL driver folds")
    val heapDeltaMb = (heapAfter - heapBefore).toDouble / (1 << 20)
    println(f"REHEARSAL driver heap delta      $heapDeltaMb%8.1f MB")
    require(heapDeltaMb < 256.0,
      f"driver heap grew $heapDeltaMb%.1f MB across one lazy point query")

    // ---- parity + timing vs the forced EAGER path ----
    val (eagerRows, tEager) = timed("eager_point_query") {
      spark.conf.set(GraftTable.DriverFileLimitConf, Long.MaxValue.toString)
      try GraftTable.forPath(spark, dir).toDF
        .where(s"bucket = $probeBucket AND id = $probeId")
        .select("id", "name").collect()
      finally spark.conf.unset(GraftTable.DriverFileLimitConf)
    }
    require(eagerRows.toSeq == rows.toSeq, "eager/lazy parity broke")

    // ---- full-scan aggregate: answered from stats in ONE metadata job ----
    val (cnt, tCount) = timed("lazy_metadata_count") {
      GraftLog.watchFolds(dir)
      try {
        val q = GraftTable.forPath(spark, dir).toDF
          .selectExpr("count(*) AS c")
        // LOGICAL-plan assert: AQE hides physical scans inside
        // AdaptiveSparkPlanExec, so an executedPlan collect would be
        // vacuously empty (the round-17 rehearsal bug that hid a full
        // 120k-file scan behind a green assert)
        val rels = q.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
        }
        require(rels.isEmpty, "count(*) on the lazy path planned a data scan")
        val c = q.collect().head.getLong(0)
        require(GraftLog.foldCount(dir) == 0L, "metadata count folded")
        c
      } finally GraftLog.unwatchFolds(dir)
    }
    require(cnt == nFiles.toLong, s"metadata count $cnt != $nFiles")

    // ---- write paths: append + point DELETE commit from the head ----
    GraftLog.watchFolds(dir)
    val (_, tAppend) = timed("lazy_append") {
      GraftTable.forPath(spark, dir).append(
        spark.range(nFiles.toLong, nFiles + 50L).selectExpr(
          "id", s"CAST(id % $nBuckets AS INT) AS bucket",
          "concat('name_', id) AS name"))
    }
    val (_, tDelete) = timed("lazy_point_delete") {
      graft.operators.TableOps.delete(
        GraftTable.forPath(spark, dir),
        Some(s"bucket = $probeBucket AND id = $probeId"))
    }
    val writeFolds = GraftLog.foldCount(dir)
    GraftLog.unwatchFolds(dir)
    require(writeFolds == 0L,
      s"append + point delete performed $writeFolds full driver folds")
    require(GraftTable.forPath(spark, dir).toDF
      .where(s"id = $probeId").count() == 0, "point delete missed")
    require(GraftTable.forPath(spark, dir).toDF
      .where(s"id = ${nFiles + 10L}").count() == 1, "append row missing")

    println(f"REHEARSAL OK files=$nFiles create=$tCreate%.1fs ckpt=$tCkpt%.1fs " +
      f"lazy_point=$tLazy%.2fs eager_point=$tEager%.2fs meta_count=$tCount%.2fs " +
      f"append=$tAppend%.2fs point_delete=$tDelete%.2fs " +
      f"heap_delta=$heapDeltaMb%.1fMB folds=0")
  }
}
