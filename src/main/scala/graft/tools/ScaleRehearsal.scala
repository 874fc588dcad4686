package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{GraftMerge, TableOps}
import graft.pipeline.Dedup
import graft.tables.GraftTable

/** Scale rehearsal for the heaviest operator families — NOT part of the
  * library surface. The per-round bench runs at sf0.1 (600k lineitem rows);
  * this main upsamples the sf0.1 inputs by `copies` (key-shifted, so merge
  * keys stay unique and duplicated documents form KNOWN clusters) and runs
  * the expensive shapes at ~sf1 (6M rows / 50k docs), asserting
  * row-exactness where the construction makes the expected result exact:
  *
  *  - m9-style MERGE (update 5% + insert ~1.7%) — exact output count and
  *    updated-rows aggregate.
  *  - d2/d8 MinHash dedup-clusters — upsampled copies carry IDENTICAL text,
  *    so signatures/buckets/components collapse every copy group onto its
  *    original's cluster: survivor count at N× MUST equal the 1× count.
  *  - d29 substring dedup — output stays one row per doc; timing.
  *  - OPTIMIZE Z-ORDER over the 6M-row table — count-preserving; timing.
  *  - CDF-on REPLACE — the round-16 read-time-synthesis path (commit writes
  *    no change rows) timed against the round-15 write path's floor: one
  *    job that materializes the delete+insert union to scratch parquet.
  *    readCDF of the replace version must count old+new exactly.
  *  - CDF-on RESTORE — same synthesis posture (late round 16): the undo of
  *    the replace commits metadata-only; readCDF counts new+old exactly.
  *  - VACUUM untracked sweep — 200 aged orphans planted in the 6M-row
  *    clone; LITE (log-only) must skip them, FULL must sweep exactly them.
  *
  * Run twice (copies=1, copies=10) and compare s/row in BENCH_NOTES.md:
  * {{{ sbt "runMain graft.tools.ScaleRehearsal /root/testdata/sf0.1 10" }}}
  */
object ScaleRehearsal {
  private val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    val s = (System.nanoTime() - t0) / 1e9
    times(label) = math.round(s * 1000) / 1000.0
    println(f"REHEARSAL $label%-28s $s%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = if (args.length > 1) args(1).toInt else 10
    val scratch = java.nio.file.Files.createTempDirectory("graft-rehearsal-").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scale-rehearsal")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- upsampled inputs (key-shifted copies) ----------------------------
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxOrder = li0.agg(max("l_orderkey")).as[Long].collect()(0)
    val maxDoc = docs0.agg(max("doc_id")).as[Long].collect()(0)
    def upsample(df: DataFrame, keyCol: String, shift: Long): DataFrame =
      (0 until copies).map(i =>
        df.withColumn(keyCol, col(keyCol) + lit(i * shift))).reduce(_.unionByName(_))
    // parquet-pinned so every rehearsal reads the same bytes (not a
    // recomputed union plan)
    val liPath = s"$scratch/lineitem"
    val docsPath = s"$scratch/documents"
    upsample(li0, "l_orderkey", maxOrder + 1).write.parquet(liPath)
    upsample(docs0, "doc_id", maxDoc + 1).write.parquet(docsPath)
    val li = spark.read.parquet(liPath)
    val docs = spark.read.parquet(docsPath)
    val nRows = li.count()
    val nDocs = docs.count()
    println(s"REHEARSAL inputs: lineitem=$nRows docs=$nDocs (copies=$copies)")

    // ---- A) m9-style MERGE ------------------------------------------------
    val mergeDir = s"$scratch/t-merge"
    val t = timed("create_table")(GraftTable.create(spark, mergeDir, li))
    // 5% updates (bump quantity by 1000) + inserts beyond the key space
    val updates = li.where(col("l_orderkey") % 20 === 0)
      .withColumn("l_quantity", col("l_quantity") + 1000.0)
    val inserts = li.where(col("l_orderkey") % 60 === 1)
      .withColumn("l_orderkey", col("l_orderkey") + lit(copies * (maxOrder + 1)))
    val srcMerge = updates.unionByName(inserts)
    val nUpd = updates.count(); val nIns = inserts.count()
    timed("merge_6m") {
      GraftMerge(t, "t")
        .merge(srcMerge, "t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber " +
          "AND t.l_partkey = s.l_partkey", Some("s"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    }
    val after = GraftTable.forPath(spark, mergeDir).toDF
    require(after.count() == nRows + nIns,
      s"merge count: got ${after.count()}, want ${nRows + nIns}")
    // updated rows carry +1000 exactly: total quantity rose by 1000*nUpd
    // plus the inserts' own quantity
    val q0 = li.agg(sum("l_quantity")).as[Double].collect()(0)
    val qIns = inserts.agg(sum("l_quantity")).as[Double].collect()(0)
    val q1 = after.agg(sum("l_quantity")).as[Double].collect()(0)
    require(math.abs(q1 - (q0 + 1000.0 * nUpd + qIns)) < 1.0,
      s"merge quantity: got $q1, want ${q0 + 1000.0 * nUpd + qIns}")

    // ---- B) MinHash dedup clusters (d2/d8 family) --------------------------
    val survivors1 = timed("minhash_clusters_1x")(
      Dedup.minhashDedupClusters(docs0, "doc_id", "text").count())
    val survivorsN = timed("minhash_clusters_Nx")(
      Dedup.minhashDedupClusters(docs, "doc_id", "text").count())
    require(survivorsN == survivors1,
      s"minhash survivors: got $survivorsN at ${copies}x, want $survivors1 " +
        "(identical-text copies must collapse onto their original's cluster)")

    // ---- C) substring dedup (d29) ------------------------------------------
    val sub = timed("substring_dedup_Nx")(
      Dedup.dedupSubstrings(docs, "doc_id", "text", 50).count())
    require(sub == nDocs, s"substring dedup rows: got $sub, want $nDocs")

    // ---- D) OPTIMIZE Z-ORDER ------------------------------------------------
    timed("zorder_6m")(TableOps.zorder(t, Seq("l_partkey", "l_suppkey")))
    val afterZ = GraftTable.forPath(spark, mergeDir).toDF
    require(afterZ.count() == nRows + nIns, "zorder changed the row count")

    // ---- E) CDF-on REPLACE: read-time synthesis vs the write-path floor ----
    val replDir = s"$scratch/t-replace"
    val tr = GraftTable.create(spark, replDir, li,
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val newContents = li.where(col("l_orderkey") % 2 === 0)
      .withColumn("l_quantity", col("l_quantity") * 2.0)
    val nNew = newContents.count()
    val vRepl = timed("replace_commit") {
      TableOps.replaceTable(tr, Some(newContents),
        properties = Map("graft.enableChangeDataFeed" -> "true"))
    }
    require(tr.log.actionsAt(vRepl)
        .count(_.isInstanceOf[graft.tables.AddCDCFile]) == 0,
      "replace wrote change files")
    // the round-15 write path's FLOOR: materialize old-as-delete + new-as-
    // insert and write it once (what every CDF-on replace paid at commit)
    timed("replace_writepath_floor") {
      spark.read.parquet(liPath).withColumn("_change_type", lit("delete"))
        .unionByName(newContents.withColumn("_change_type", lit("insert")))
        .write.mode("overwrite").parquet(s"$scratch/cdc-floor")
    }
    val cdfRows = timed("replace_cdf_read") {
      graft.log.ChangeDataFeedHelper(spark, replDir, vRepl, vRepl).readCDF.count()
    }
    require(cdfRows == nRows + nNew,
      s"replace CDF rows: got $cdfRows, want ${nRows + nNew}")

    // ---- F) DEEP CLONE of the 6M-row table ---------------------------------
    // the distributed byte copy: wall-clock = bytes / copy bandwidth, no
    // decode — compare against create_table (a full encode) above
    val cloneDir = s"$scratch/t-clone"
    val srcSnap = GraftTable.forPath(spark, mergeDir).snapshot
    val dc = timed("deep_clone_Nx")(GraftTable.deepClone(spark, mergeDir, cloneDir))
    require(dc.snapshot.numFiles == srcSnap.numFiles &&
        dc.snapshot.sizeInBytes == srcSnap.sizeInBytes,
      "deep clone file inventory drifted")
    require(dc.toDF.count() == nRows + nIns, "deep clone row count drifted")

    // ---- G) COPY INTO over a wide landing dir ------------------------------
    // ~800 part files forces the sidecar memory path; the re-run's skip
    // must stay metadata-plane (anti-join, no data read)
    val landing = s"$scratch/landing"
    docs.repartition(800).write.parquet(landing)
    val ciDir = s"$scratch/t-copyinto"
    GraftTable.create(spark, ciDir, docs.limit(0))
    val tci = GraftTable.forPath(spark, ciDir)
    val (_, ciRows, ciCopied, _) = timed("copy_into_800files")(
      TableOps.copyInto(tci, landing, "parquet"))
    require(ciRows == nDocs && ciCopied >= 800,
      s"copy into loaded $ciRows rows / $ciCopied files, want $nDocs / >=800")
    val (_, r2, c2, s2) = timed("copy_into_rerun_skip")(
      TableOps.copyInto(tci, landing, "parquet"))
    require(r2 == 0 && c2 == 0 && s2 == ciCopied,
      s"copy into re-run must skip all: got $r2/$c2/$s2")

    // ---- H) RESTORE with CDF: read-time synthesis at scale ------------------
    // undo the replace: drop its files, re-add the original 6M rows — the
    // commit is metadata-only (no change rows written); the CDF read
    // synthesizes delete(new)+insert(old) exactly
    val vRest = timed("restore_commit")(TableOps.restore(tr, 0L))
    require(tr.log.actionsAt(vRest)
        .count(_.isInstanceOf[graft.tables.AddCDCFile]) == 0,
      "restore wrote change files")
    val restCdf = timed("restore_cdf_read") {
      graft.log.ChangeDataFeedHelper(spark, replDir, vRest, vRest).readCDF.count()
    }
    require(restCdf == nNew + nRows,
      s"restore CDF rows: got $restCdf, want ${nNew + nRows}")

    // ---- I) VACUUM untracked-orphan sweep over the cloned 6M-row table -----
    // plant 200 aged orphans (a crashed writer's strandings), assert the
    // listing-based sweep finds exactly them and LITE skips the listing
    val orphanRels = (0 until 200).map(i => s"part-orphan-$i.parquet")
    orphanRels.foreach { rel =>
      val p = java.nio.file.Paths.get(cloneDir, rel)
      java.nio.file.Files.write(p, Array[Byte](1, 2, 3))
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 7200000L))
    }
    val tcl = GraftTable.forPath(spark, cloneDir)
    val liteN = timed("vacuum_lite")(TableOps.vacuum(tcl, tcl.version, lite = true))
    require(liteN == 0, s"LITE vacuum must skip orphans, deleted $liteN")
    val sweptN = timed("vacuum_full_sweep")(TableOps.vacuum(tcl, tcl.version))
    require(sweptN == 200, s"full vacuum swept $sweptN, want the 200 orphans")
    require(tcl.toDF.count() == nRows + nIns, "vacuum touched live data")

    val json = "{" + List(
      s""""sfDir":"$sfDir"""",
      s""""copies":$copies""",
      s""""lineitemRows":$nRows""",
      s""""docRows":$nDocs""",
      s""""mergeUpdated":$nUpd""",
      s""""mergeInserted":$nIns""",
      s""""minhashSurvivors":$survivorsN""",
      s""""timings":{${times.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}"""
    ).mkString(",") + "}"
    println(s"REHEARSAL_JSON $json")
    spark.stop()
  }
}
