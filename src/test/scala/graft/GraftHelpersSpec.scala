package graft

import org.scalatest.funspec.AnyFunSpec

import graft.operators.{GraftHelpers, TableOps}
import graft.tables._

class GraftHelpersSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  describe("M3 killDuplicateRecords") {
    it("deletes every row whose dup-key occurs more than once (no survivor)") {
      val t = GraftTable.create(spark, tmpTableDir("m3"),
        Seq((1, "Benito", "Jackson"), (2, "Maria", "Willis"), (3, "Jose", "Travolta"),
          (4, "Benito", "Jackson"), (5, "Jose", "Travolta"), (6, "Jose", "Travolta"))
          .toDF("id", "firstname", "lastname").repartition(1))
      GraftHelpers.killDuplicateRecords(t, Seq("firstname", "lastname"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((2, "Maria", "Willis")).toDF("id", "firstname", "lastname"))
    }

    it("rejects empty duplicateColumns") {
      val t = GraftTable.create(spark, tmpTableDir("m3e"), Seq((1, "a")).toDF("id", "x"))
      assertThrows[NoSuchElementException] {
        GraftHelpers.killDuplicateRecords(t, Nil)
      }
    }
  }

  describe("NULL-key asymmetry (SURVEY §2.1 nuance)") {
    it("merge-based dedup never deletes NULL-keyed rows; dropDuplicates does collapse them") {
      // M3/M4 join on null-unsafe '=': rows with NULL in a dup column are
      // invisible to the delete merge — they must all survive
      val data = Seq((1, Some("a")), (2, Some("a")), (3, None), (4, None))
        .toDF("id", "k")
      val t1 = GraftTable.create(spark, tmpTableDir("null-m3"), data)
      GraftHelpers.killDuplicateRecords(t1, Seq("k"))
      val ids1 = t1.toDF.select("id").collect().map(_.getInt(0)).toSet
      assert(ids1 == Set(3, 4)) // 'a' dups killed; both NULL rows survive

      val t2 = GraftTable.create(spark, tmpTableDir("null-m4"), data)
      GraftHelpers.removeDuplicateRecords(t2, "id", Seq("k"))
      val ids2 = t2.toDF.select("id").collect().map(_.getInt(0)).toSet
      assert(ids2 == Set(1, 3, 4)) // keep lowest-id 'a'; NULLs untouched

      // M5 uses dropDuplicates, which treats NULLs as equal — one survives
      val t3 = GraftTable.create(spark, tmpTableDir("null-m5"), data.select("k"))
      GraftHelpers.removeDuplicateRecords(t3, Seq("k"))
      assert(t3.toDF.count() == 2) // one 'a' + one NULL
    }
  }

  describe("M4 removeDuplicateRecords(pk)") {
    it("keeps the row with the lowest primary key per dup-key") {
      val t = GraftTable.create(spark, tmpTableDir("m4"),
        Seq((1, "Benito", "Jackson"), (4, "Benito", "Jackson"), (2, "Maria", "Willis"),
          (3, "Jose", "Travolta"), (6, "Jose", "Travolta"))
          .toDF("id", "firstname", "lastname").repartition(1))
      GraftHelpers.removeDuplicateRecords(t, "id", Seq("firstname", "lastname"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "Benito", "Jackson"), (2, "Maria", "Willis"), (3, "Jose", "Travolta"))
          .toDF("id", "firstname", "lastname"))
    }
  }

  describe("M5 removeDuplicateRecords(cols only)") {
    it("keeps one arbitrary survivor per dup-key") {
      val t = GraftTable.create(spark, tmpTableDir("m5"),
        Seq(("a", 1), ("a", 1), ("b", 2)).toDF("k", "v"))
      GraftHelpers.removeDuplicateRecords(t, Seq("k", "v"))
      assertSmallDataFrameEquality(t.toDF, Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    }
  }

  describe("M6 validateAppend") {
    it("appends when columns satisfy the allowlist; missing table cols become null") {
      val t = GraftTable.create(spark, tmpTableDir("m6"),
        Seq((1, "a", "x")).toDF("id", "name", "extra"))
      GraftHelpers.validateAppend(t, Seq((2, "b")).toDF("id", "name"),
        requiredCols = List("id", "name"), optionalCols = List("extra"))
      assert(t.toDF.count() == 2)
      assert(t.toDF.filter("extra IS NULL").count() == 1)
    }
    it("rejects columns outside the allowlist") {
      val t = GraftTable.create(spark, tmpTableDir("m6e"), Seq((1, "a")).toDF("id", "name"))
      assertThrows[IllegalArgumentException] {
        GraftHelpers.validateAppend(t, Seq((2, "b", "oops")).toDF("id", "name", "rogue"),
          requiredCols = List("id", "name"), optionalCols = Nil)
      }
    }
    it("rejects appends missing required columns") {
      val t = GraftTable.create(spark, tmpTableDir("m6e2"), Seq((1, "a")).toDF("id", "name"))
      assertThrows[IllegalArgumentException] {
        GraftHelpers.validateAppend(t, Seq(2).toDF("id"),
          requiredCols = List("id", "name"), optionalCols = Nil)
      }
    }
  }

  describe("M7 appendWithoutDuplicates") {
    it("drops in-batch dups and inserts only unseen keys") {
      val t = GraftTable.create(spark, tmpTableDir("m7"),
        Seq((1, "a"), (2, "b")).toDF("id", "name"))
      GraftHelpers.appendWithoutDuplicates(t,
        Seq((2, "x"), (3, "c"), (3, "c")).toDF("id", "name"), Seq("id"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name"))
    }
  }

  describe("M8 copyTable") {
    it("copies data + partitioning + properties, not history") {
      val src = GraftTable.create(spark, tmpTableDir("m8src"),
        Seq((1, "US"), (2, "DE")).toDF("id", "country"),
        partitionColumns = Seq("country"), properties = Map("graft.foo" -> "bar"))
      src.append(Seq((3, "FR")).toDF("id", "country"))
      val destDir = tmpTableDir("m8dst")
      GraftHelpers.copyTable(src, targetPath = Some(destDir))
      val dest = GraftTable.forPath(spark, destDir)
      assertSmallDataFrameEquality(dest.toDF, src.toDF)
      assert(dest.snapshot.metadata.partitionColumns == Seq("country"))
      assert(dest.snapshot.metadata.properties("graft.foo") == "bar")
      assert(dest.version == 0L) // history NOT copied
    }
    it("name-based copy creates a registered GraftTable in the warehouse") {
      val src = GraftTable.create(spark, tmpTableDir("m8n"),
        Seq((1, "US"), (2, "DE")).toDF("id", "country"),
        properties = Map("graft.foo" -> "bar"))
      val name = "m8copy_" + System.nanoTime
      GraftHelpers.copyTable(src, targetTableName = Some(name))
      val dest = GraftTable.forName(spark, name)
      assertSmallDataFrameEquality(dest.toDF, src.toDF)
      assert(dest.snapshot.metadata.properties("graft.foo") == "bar")
    }

    it("rejects ambiguous destinations") {
      val src = GraftTable.create(spark, tmpTableDir("m8e"), Seq(1).toDF("id"))
      assertThrows[GraftValidationError] {
        GraftHelpers.copyTable(src, Some("/tmp/x"), Some("tbl"))
      }
    }
  }

  describe("K1 withMD5Columns") {
    it("appends a deterministic md5 surrogate key") {
      val df = Seq(("Elia", "Kenya")).toDF("firstname", "lastname")
      val out = GraftHelpers.withMD5Columns(df, List("firstname", "lastname"), "unique_id")
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest("Elia||Kenya".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(out.select("unique_id").collect()(0).getString(0) == expected)
    }
    it("derives the default column name from the inputs") {
      val df = Seq(("a", "b")).toDF("c1", "c2")
      val out = GraftHelpers.withMD5Columns(df, List("c1", "c2"))
      assert(out.columns.contains("_md5c1c2"))
    }
  }

  describe("K3/K4 composite key discovery") {
    it("finds the smallest unique combination") {
      val t = GraftTable.create(spark, tmpTableDir("k3"),
        Seq((1, "a", "x"), (2, "b", "x"), (3, "c", "y")).toDF("id", "name", "grp"))
      assert(GraftHelpers.findCompositeKeyCandidate(t) == Seq("id"))
      assert(GraftHelpers.findCompositeKeyCandidate(t, excludeCols = Seq("id")) == Seq("name"))
    }
    it("approx prefilter keeps NULL-permuted tuples distinct (no false negative)") {
      // (a,b) is the minimal key, but half its tuples are NULL-permutations:
      // ('k_i', NULL) vs (NULL, 'k_i'). concat_ws skips NULLs, so without a
      // NULL marker both collapse to "k_i", the approx NDV halves, and the
      // prefilter would reject the true key — returning Nil where the exact
      // path finds it.
      val rows = (1 to 100).flatMap { i =>
        Seq((Option(s"k$i"), Option.empty[String], "z"),
            (Option.empty[String], Option(s"k$i"), "z"))
      }
      val t = GraftTable.create(spark, tmpTableDir("k3null"),
        rows.toDF("a", "b", "grp"))
      val exact = GraftHelpers.findCompositeKeyCandidate(t, approxPrefilter = false)
      assert(exact == Seq("a", "b"))
      assert(GraftHelpers.findCompositeKeyCandidate(t) == exact)
    }
    it("returns Nil when no proper-subset combination is unique") {
      // every row distinct, but only the full column set is a key — the
      // all-columns combination is excluded (reference guard :470)
      val t = GraftTable.create(spark, tmpTableDir("k3n"),
        Seq((1, "a"), (1, "b"), (2, "a"), (2, "b")).toDF("c1", "c2"))
      assert(GraftHelpers.findCompositeKeyCandidate(t) == Nil)
    }
    it("isCompositeKeyCandidate detects uniqueness") {
      val t = GraftTable.create(spark, tmpTableDir("k4"),
        Seq((1, "a"), (2, "a")).toDF("id", "name"))
      assert(GraftHelpers.isCompositeKeyCandidate(t, List("id")))
      assert(!GraftHelpers.isCompositeKeyCandidate(t, List("name")))
    }
  }

  describe("S2/S3 file sizes") {
    it("reports size/count/average and humanizes bytes") {
      // repartitionByRange: round-robin's random start can collocate both
      // rows (the empty shard is dropped from the commit) — range split is
      // deterministic
      val t = GraftTable.create(spark, tmpTableDir("s2"),
        Seq((1, "a"), (2, "b")).toDF("id", "name")
          .repartitionByRange(2, org.apache.spark.sql.functions.col("id")))
      val m = GraftHelpers.fileSizes(t)
      assert(m("number_of_files") == 2.0)
      assert(m("size_in_bytes") > 0)
      assert(GraftHelpers.humanizeBytes(1320d) == "1.3 kB")
      assert(GraftHelpers.humanizeBytes(100d) == "100 B")
      assert(GraftHelpers.humanizeBytes(2.5e9) == "2.5 GB")
    }
  }

  describe("S5/S7 distributions") {
    it("computes per-partition file size and record distributions") {
      val df = (1 to 100).map(i => (i, if (i % 2 == 0) "even" else "odd")).toDF("id", "par")
      val t = GraftTable.create(spark, tmpTableDir("s5"), df, partitionColumns = Seq("par"))
      val dist = GraftHelpers.fileSizeDistribution(t).collect()
      assert(dist.length == 2)
      val rec = GraftHelpers.numRecordDistribution(t, Some("par = 'even'")).collect()
      assert(rec.length == 1)
    }
  }

  describe("S8 data-skipping introspection") {
    it("reports per-bucket file survival for a mixed condition") {
      // force multiple small files with known id ranges
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
      try {
        val df = (1 to 24).map(i => (i, s"name$i")).toDF("id", "name").orderBy("id").coalesce(1)
        val t = GraftTable.create(spark, tmpTableDir("s8"), df)
        assert(t.snapshot.numFiles == 6)
        val m = GraftHelpers.getNumShuffleFiles(t, "id >= 10 AND id <= 12")
        assert(m("overall") == 1) // ids 9-12 in one file
        assert(m("totalFilesInTable") == 6L)
        val contradiction = GraftHelpers.getNumShuffleFiles(t, "id <= 10 AND id >= 12")
        assert(contradiction("overall") == 0)
        val unresolved = GraftHelpers.getNumShuffleFiles(t, "id >= 10 AND bogus = 1")
        assert(unresolved("unresolvedColumns") == List("bogus"))
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }
  }

  describe("TableOps delete/update") {
    it("deletes matching rows, rewrites only touched files, records metrics") {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
      try {
        val df = (1 to 12).map(i => (i, s"n$i")).toDF("id", "name").orderBy("id").coalesce(1)
        val t = GraftTable.create(spark, tmpTableDir("del"), df)
        assert(t.snapshot.numFiles == 3)
        TableOps.delete(t, Some("id <= 4"))
        assert(t.toDF.count() == 8)
        val m = t.history().head._2.operationMetrics
        assert(m("numDeletedRows") == "4")
        assert(m("numRemovedFiles") == "1") // only the 1-4 file touched
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }

    it("updates matching rows in place") {
      val t = GraftTable.create(spark, tmpTableDir("upd"),
        Seq((1, 10.0), (2, 20.0)).toDF("id", "amount").repartition(1))
      TableOps.update(t, Some("id = 2"), Map("amount" -> "amount * 2"))
      assertSmallDataFrameEquality(t.toDF, Seq((1, 10.0), (2, 40.0)).toDF("id", "amount"))
      assert(t.history().head._2.operationMetrics("numUpdatedRows") == "1")
    }

    it("delete keeps rows whose predicate evaluates to NULL (3-valued logic)") {
      // (2, NULL) shares the single file with the matched row (1, 5.0): the
      // file is rewritten, and SQL DELETE semantics require the NULL-
      // evaluating row to survive and count as copied
      val t = GraftTable.create(spark, tmpTableDir("delnull"),
        Seq((1, Some(5.0)), (2, None)).toDF("id", "value").repartition(1))
      TableOps.delete(t, Some("value = 5"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((2, None: Option[Double])).toDF("id", "value"))
      val m = t.history().head._2.operationMetrics
      assert(m("numDeletedRows") == "1")
      assert(m("numCopiedRows") == "1")
    }

    it("update leaves NULL-predicate rows unmodified and counts them copied") {
      val t = GraftTable.create(spark, tmpTableDir("updnull"),
        Seq((1, Some(5.0)), (2, None)).toDF("id", "value").repartition(1))
      TableOps.update(t, Some("value = 5"), Map("value" -> "value * 10"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, Some(50.0)), (2, None)).toDF("id", "value"))
      val m = t.history().head._2.operationMetrics
      assert(m("numUpdatedRows") == "1")
      assert(m("numCopiedRows") == "1")
    }

    it("replaceWhere swaps the matching region in one commit, untouched files survive") {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
      try {
        val df = (1 to 12).map(i => (i, s"n$i")).toDF("id", "name").orderBy("id").coalesce(1)
        val t = GraftTable.create(spark, tmpTableDir("rw"), df)
        assert(t.snapshot.numFiles == 3)
        val untouched = t.snapshot.files.map(_.path).toSet
        val v = TableOps.overwriteWhere(t,
          Seq((2, "repl2"), (3, "repl3")).toDF("id", "name"), "id <= 4")
        // region id<=4 fully replaced by the 2 incoming rows; 5..12 intact
        assert(t.toDF.count() == 10)
        assert(t.toDF.where("id <= 4").collect().map(_.getString(1)).toSet ==
          Set("repl2", "repl3"))
        assert(t.toDF.where("id >= 5 and id <= 12").count() == 8)
        // only the file containing 1..4 was removed — the other two files
        // were never read or rewritten (stats pruning)
        val removed = t.log.actionsAt(v).collect { case r: RemoveFile => r.path }
        assert(removed.size == 1 && untouched.intersect(removed.toSet).size == 1)
        val m = t.history().head._2.operationMetrics
        assert(m("numDeletedRows") == "4")
        assert(t.history().head._2.operationParameters("predicate").contains("id <= 4"))
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }

    it("replaceWhere rejects incoming rows outside the predicate, atomically") {
      val t = GraftTable.create(spark, tmpTableDir("rw_reject"),
        Seq((1, "a"), (9, "z")).toDF("id", "name").repartition(1))
      val vBefore = t.version
      val e = intercept[Exception] {
        TableOps.overwriteWhere(t, Seq((1, "ok"), (7, "outside")).toDF("id", "name"), "id <= 4")
      }
      assert(Causes.messages(e).exists(_.contains("does not match the predicate")),
        Causes.messages(e).mkString("; "))
      assert(t.version == vBefore && t.toDF.count() == 2)
      // NULL-predicate incoming rows are rejected too (must SATISFY, not
      // merely not-contradict)
      val e2 = intercept[Exception] {
        TableOps.overwriteWhere(t,
          Seq((Option.empty[Int], "n")).toDF("id", "name"), "id <= 4")
      }
      assert(Causes.messages(e2).exists(_.contains("does not match the predicate")),
        Causes.messages(e2).mkString("; "))
      // and missing columns fail loudly before any scan
      val e3 = intercept[IllegalArgumentException] {
        TableOps.overwriteWhere(t, Seq(1).toDF("id"), "id <= 4")
      }
      assert(e3.getMessage.contains("missing table column"), e3.getMessage)
    }

    it("replaceWhere keeps NULL-predicate EXISTING rows and emits delete+insert CDC") {
      val t = GraftTable.create(spark, tmpTableDir("rw_cdc"),
        Seq((Some(1), "a"), (None, "null-row"), (Some(8), "h")).toDF("id", "name")
          .repartition(1),
        properties = Map("graft.enableChangeDataFeed" -> "true"))
      val v = TableOps.overwriteWhere(t,
        Seq((Some(2), "b")).toDF("id", "name"), "id <= 4")
      // existing NULL-id row survives (3VL delete semantics)
      assert(t.toDF.collect().map(_.getString(1)).toSet == Set("b", "null-row", "h"))
      val changes = spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("startingVersion", v).option("endingVersion", v)
        .load(t.path)
        .select($"name", $"_change_type").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(changes == Set(("a", "delete"), ("b", "insert")), changes.toString)
    }

    it("replaceWhere rides the writer option and enforces its mode/existence rules") {
      val dir = tmpTableDir("rw_opt")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a"), (9, "z")).toDF("id", "name").repartition(1))
      Seq((3, "c")).toDF("id", "name").write.format("graft")
        .mode("overwrite").option("replaceWhere", "id <= 4").save(dir)
      assert(t.toDF.collect().map(_.getString(1)).toSet == Set("c", "z"))
      val e1 = intercept[IllegalArgumentException] {
        Seq((4, "d")).toDF("id", "name").write.format("graft")
          .mode("append").option("replaceWhere", "id <= 4").save(dir)
      }
      assert(e1.getMessage.contains("requires mode 'overwrite'"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException] {
        Seq((4, "d")).toDF("id", "name").write.format("graft")
          .mode("overwrite").option("replaceWhere", "id <= 4")
          .save(tmpTableDir("rw_opt_missing"))
      }
      assert(e2.getMessage.contains("existing graft table"), e2.getMessage)
      // a blank predicate is a caller bug, not a full-table overwrite
      val e3 = intercept[IllegalArgumentException] {
        Seq((4, "d")).toDF("id", "name").write.format("graft")
          .mode("overwrite").option("replaceWhere", "  ").save(dir)
      }
      assert(e3.getMessage.contains("predicate is empty"), e3.getMessage)
      assert(t.toDF.count() == 2) // nothing replaced by the rejected writes
      // extra incoming columns are rejected, not silently projected away
      val e4 = intercept[IllegalArgumentException] {
        TableOps.overwriteWhere(GraftTable.forPath(spark, dir),
          Seq((3, "c", 1.0)).toDF("id", "name", "score"), "id <= 4")
      }
      assert(e4.getMessage.contains("absent from the table schema"), e4.getMessage)
    }

    it("replaceWhere with txnAppId/txnVersion replays idempotently") {
      val dir = tmpTableDir("rw_txn")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a"), (9, "z")).toDF("id", "name").repartition(1))
      def once(): Unit =
        Seq((2, "b")).toDF("id", "name").write.format("graft")
          .mode("overwrite").option("replaceWhere", "id <= 4")
          .option("txnAppId", "rwjob").option("txnVersion", "1").save(dir)
      once()
      val vAfter = t.version
      once() // replay: watermark says applied — no new commit, no double swap
      assert(t.version == vAfter)
      assert(t.toDF.collect().map(_.getString(1)).toSet == Set("b", "z"))
    }

    it("where-scoped compaction leaves other partitions' files untouched") {
      val t = GraftTable.create(spark, tmpTableDir("opt_where"),
        Seq((1, "p0"), (2, "p0"), (3, "p0"), (4, "p1"), (5, "p1"))
          .toDF("id", "part").repartition(3),
        partitionColumns = Seq("part"))
      val before = t.snapshot.files
      val p1Before = before.filter(_.partitionValues.get("part").contains("p1")).map(_.path).toSet
      assert(before.count(_.partitionValues.get("part").contains("p0")) > 1)
      TableOps.compact(t, where = Some("part = 'p0'"))
      val after = t.snapshot.files
      // p0 collapsed to fewer files; every p1 file byte-identical (same path)
      assert(after.count(_.partitionValues.get("part").contains("p0")) == 1)
      assert(after.filter(_.partitionValues.get("part").contains("p1")).map(_.path).toSet == p1Before)
      assert(t.toDF.count() == 5)
    }

    it("compaction with nothing to do commits no new version") {
      val t = GraftTable.create(spark, tmpTableDir("optnoop"),
        Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1))
      val v0 = t.version
      // single file: nothing to compact
      assert(TableOps.compact(t) == v0)
      // all files right-sized: nothing to compact
      assert(TableOps.compact(t, onlyFilesSmallerThan = 1L) == v0)
      assert(t.version == v0)
    }

    it("compaction with onlyFilesSmallerThan leaves right-sized files alone") {
      val t = GraftTable.create(spark, tmpTableDir("optsz"),
        (1 to 100).map(i => (i, s"n$i")).toDF("id", "name").repartition(4))
      val bigFile = t.snapshot.files.maxBy(_.size)
      TableOps.compact(t, onlyFilesSmallerThan = bigFile.size)
      // the largest file survived untouched; the rest packed into one
      assert(t.snapshot.files.map(_.path).contains(bigFile.path))
      assert(t.toDF.count() == 100)
    }

    it("compaction preserves data while reducing file count") {
      val t = GraftTable.create(spark, tmpTableDir("opt"),
        (1 to 100).map(i => (i, s"n$i")).toDF("id", "name").repartition(8))
      assert(t.snapshot.numFiles == 8)
      val before = t.toDF.collect().toSet
      TableOps.compact(t)
      assert(t.snapshot.numFiles == 1)
      assert(t.toDF.collect().toSet == before)
      assert(t.history().head._2.operation == "OPTIMIZE")
    }

    it("vacuum removes unreferenced files and checkpoints the horizon") {
      val t = GraftTable.create(spark, tmpTableDir("vac"),
        Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1))
      t.overwrite(Seq((3, "c")).toDF("id", "name"))   // v1: v0 files now dead
      t.append(Seq((4, "d")).toDF("id", "name"))       // v2
      val before = t.toDF.collect().toSet
      val deleted = TableOps.vacuum(t, retainVersion = 1)
      assert(deleted >= 1)
      // current state fully readable after vacuum
      assert(t.toDF.collect().toSet == before)
      assert(t.toDFAt(1).count() == 1)
      // time travel below the horizon is gone
      assertThrows[Exception] { t.toDFAt(0) }
    }

    it("distributed vacuum deletes match the driver loop exactly") {
      val t = GraftTable.create(spark, tmpTableDir("vac-dist"),
        (1 to 40).map(i => (i, s"n$i")).toDF("id", "name").repartition(8))
      t.overwrite(Seq((0, "z")).toDF("id", "name")) // 8 dead files
      val before = t.toDF.collect().toSet
      spark.conf.set("spark.graft.vacuum.distributedDeleteThreshold", "1")
      try {
        val deleted = TableOps.vacuum(t, retainVersion = 1)
        assert(deleted >= 8, s"expected >=8 distributed deletes, got $deleted")
        assert(t.toDF.collect().toSet == before)
        // dead files really gone from disk
        val dataFiles = new java.io.File(t.path).listFiles()
          .count(f => f.isFile && f.getName.endsWith(".parquet"))
        assert(dataFiles == t.snapshot.files.size)
      } finally spark.conf.unset("spark.graft.vacuum.distributedDeleteThreshold")
    }

    it("vacuum sweeps untracked write orphans; young and hidden files survive") {
      import java.nio.file.{Files, Paths}
      // data files move into the table dir BEFORE their OCC commit: a
      // crashed or race-losing writer strands files no log version
      // references — only a directory listing can find them (Delta's
      // vacuum posture). Eligible = non-hidden segments + _change_data;
      // sweepable = older than the horizon commit AND the in-flight guard.
      val t = GraftTable.create(spark, tmpTableDir("vac_orphan"),
        Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1))
      t.append(Seq((3, "c")).toDF("id", "name")) // v1
      val before = t.toDF.collect().toSet

      def plant(rel: String, ageHours: Double): String = {
        val p = Paths.get(t.path, rel)
        Files.createDirectories(p.getParent)
        Files.write(p, Array[Byte](1, 2, 3))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - (ageHours * 3600 * 1000).toLong))
        rel
      }
      val oldRoot = plant("part-orphan-root.parquet", 2.0)
      val oldPart = plant("p=1/part-orphan-part.parquet", 2.0)
      val oldCdc  = plant("_change_data/cdc-orphan.parquet", 2.0)
      val young   = plant("part-orphan-young.parquet", 0.0)
      val hidden  = plant("_junk/inner.bin", 2.0)

      // VACUUM LITE (log-only dead-file derivation, Delta 4.0's keyword)
      // skips the listing: orphans survive it, by design
      assert(TableOps.vacuum(t, retainVersion = 1, lite = true) == 0)
      assert(Files.exists(Paths.get(t.path, oldRoot)))
      assert(TableOps.vacuumDryRun(t, retainVersion = 1, lite = true).isEmpty)

      // dry run reports the old orphans; the young and hidden ones are out
      val planned = TableOps.vacuumDryRun(t, retainVersion = 1)
      assert(Set(oldRoot, oldPart, oldCdc).subsetOf(planned.toSet), planned)
      assert(!planned.contains(young) && !planned.contains(hidden), planned)

      val deleted = TableOps.vacuum(t, retainVersion = 1)
      assert(deleted == planned.size, s"deleted $deleted planned $planned")
      assert(!Files.exists(Paths.get(t.path, oldRoot)))
      assert(!Files.exists(Paths.get(t.path, oldPart)))
      assert(!Files.exists(Paths.get(t.path, oldCdc)))
      // in-flight guard: a young unreferenced file may belong to an
      // uncommitted concurrent write; hidden segments have their own sweeps
      assert(Files.exists(Paths.get(t.path, young)))
      assert(Files.exists(Paths.get(t.path, hidden)))
      assert(t.toDF.collect().toSet == before)

      // the distributed listing (threshold 1 forces the Spark-job walk)
      // derives the same orphan set
      val old2 = plant("q=2/part-orphan2.parquet", 2.0)
      spark.conf.set("spark.graft.vacuum.distributedListingThreshold", "1")
      try {
        val planned2 = TableOps.vacuumDryRun(t, retainVersion = 1)
        assert(planned2.contains(old2), planned2)
        assert(TableOps.vacuum(t, retainVersion = 1) == planned2.size)
        assert(!Files.exists(Paths.get(t.path, old2)))
      } finally spark.conf.unset("spark.graft.vacuum.distributedListingThreshold")
      assert(t.toDF.collect().toSet == before)
    }

    it("duration-based vacuum resolves the horizon from commit timestamps") {
      val t = GraftTable.create(spark, tmpTableDir("vac_dur"),
        Seq((1, "a")).toDF("id", "name").repartition(1))      // v0
      t.overwrite(Seq((2, "b")).toDF("id", "name"))           // v1: v0 files dead
      t.append(Seq((3, "c")).toDF("id", "name"))              // v2
      // clock-controlled history: rewrite each version's CommitInfo
      // timestamp (v0: 100 h ago, v1: 50 h ago, v2: 1 h ago)
      val log = t.log
      def ageVersion(v: Long, hoursAgo: Double): Unit = {
        val ts = System.currentTimeMillis() - (hoursAgo * 3600 * 1000).toLong
        log.rewriteVersion(v, log.actionsAt(v).map {
          case ci: CommitInfo => ci.copy(timestamp = ts)
          case other          => other
        })
      }
      ageVersion(0L, 100); ageVersion(1L, 50); ageVersion(2L, 1)

      // retain 24 h: cutoff falls between v1 and v2 → horizon is v1 (the
      // state a reader at the cutoff would see); v0 vacuumed, v1+v2 stay
      val before = t.toDF.collect().toSet
      assert(TableOps.vacuum(t, retainHours = 24.0) >= 1)
      assert(log.versions() == Seq(1L, 2L))
      assert(t.toDF.collect().toSet == before)
      assert(t.toDFAt(1).count() == 1)

      // everything younger than the cutoff: nothing to vacuum
      assert(TableOps.vacuum(t, retainHours = 1000.0) == 0)
      assert(log.versions() == Seq(1L, 2L))
    }

    it("vacuumDryRun lists exactly what vacuum would delete, committing nothing") {
      val t = GraftTable.create(spark, tmpTableDir("vac_dry"),
        Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1))
      t.overwrite(Seq((3, "c")).toDF("id", "name"))   // v1: v0 files dead
      t.append(Seq((4, "d")).toDF("id", "name"))      // v2
      val planned = TableOps.vacuumDryRun(t, retainVersion = 1)
      assert(planned.nonEmpty)
      // read-only: all files still on disk, log untouched, history travelable
      assert(planned.forall(p =>
        graft.tables.Fs.exists(GraftTable.resolveDataPath(t.path, p))))
      assert(t.log.versions() == Seq(0L, 1L, 2L))
      assert(t.toDFAt(0).count() == 2)
      // the real vacuum deletes exactly the planned set
      val deleted = TableOps.vacuum(t, retainVersion = 1)
      assert(deleted == planned.size)
      assert(planned.forall(p =>
        !graft.tables.Fs.exists(GraftTable.resolveDataPath(t.path, p))))
    }

    it("vacuumDryRun matches vacuum on bloom-indexed and externally-damaged tables") {
      import java.nio.file.{Files, Paths}
      val t = GraftTable.create(spark, tmpTableDir("vac_dry_bloom"),
        (0 until 256).map(i => (i, s"v$i")).toDF("id", "name").repartition(2),
        properties = Map(graft.tables.BloomIndex.ColumnsProperty -> "id"))
      // v1: v0's data files AND its bloom sidecar become dead
      t.overwrite((0 until 256).map(i => (i, s"w$i")).toDF("id", "name").repartition(2))
      // one dead file's bytes are already gone (external damage): vacuum's
      // deleteIfExists won't count it, so the dry run must not list it
      val gone = t.log.actionsAt(0L).collect { case a: graft.tables.AddFile => a.path }.head
      Files.delete(Paths.get(t.path, gone))
      // age every sidecar past the in-flight guard; the live one survives on
      // reference, the orphan becomes collectible
      val bloomRoot = Paths.get(t.path, graft.tables.BloomIndex.SidecarDirName)
      val dirs = Files.list(bloomRoot)
      try {
        import scala.jdk.CollectionConverters._
        dirs.iterator().asScala.foreach(p => Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() -
            TableOps.BloomSidecarMinAgeMillis - 1000)))
      } finally dirs.close()
      val planned = TableOps.vacuumDryRun(t, retainVersion = 1)
      assert(!planned.contains(gone), "dry run listed an already-missing file")
      assert(planned.exists(_.startsWith(graft.tables.BloomIndex.SidecarDirName)),
        s"dry run omitted the orphaned bloom sidecar: $planned")
      val deleted = TableOps.vacuum(t, retainVersion = 1)
      assert(deleted == planned.size, s"dry run planned ${planned.size}, vacuum deleted $deleted")
    }

    it("restoreToTimestamp resolves like timestampAsOf and restores that state") {
      val t = GraftTable.create(spark, tmpTableDir("restore_ts"),
        Seq((1, "a")).toDF("id", "name").repartition(1))        // v0
      t.overwrite(Seq((2, "b")).toDF("id", "name"))             // v1
      t.append(Seq((3, "c")).toDF("id", "name"))                // v2
      def ageVersion(v: Long, hoursAgo: Double): Unit = {
        val ts = System.currentTimeMillis() - (hoursAgo * 3600 * 1000).toLong
        t.log.rewriteVersion(v, t.log.actionsAt(v).map {
          case ci: CommitInfo => ci.copy(timestamp = ts)
          case other          => other
        })
      }
      ageVersion(0L, 100); ageVersion(1L, 50); ageVersion(2L, 10)
      // 24 h ago falls between v1 and v2 → restore to v1's state
      val iso = java.time.Instant
        .ofEpochMilli(System.currentTimeMillis() - 24L * 3600 * 1000).toString
      TableOps.restoreToTimestamp(t, iso)
      assert(t.toDF.collect().map(_.getString(1)).toSet == Set("b"))
      // a timestamp before the first commit fails loudly
      val e = intercept[IllegalArgumentException] {
        TableOps.restoreToTimestamp(t, java.time.Instant
          .ofEpochMilli(System.currentTimeMillis() - 2000L * 3600 * 1000).toString)
      }
      assert(e.getMessage.contains("first commit"), e.getMessage)
    }

    it("fsck drops dangling file references; dry run only reports them") {
      spark.conf.set("spark.sql.files.maxRecordsPerFile", "2")
      try {
        val t = GraftTable.create(spark, tmpTableDir("fsck"),
          (1 to 6).map(i => (i, s"n$i")).toDF("id", "name").orderBy("id").coalesce(1))
        assert(t.snapshot.numFiles == 3)
        // clean table: nothing reported, nothing committed
        assert(TableOps.fsck(t).isEmpty && t.version == 0L)
        // delete one physical file out from under the table
        val victim = t.snapshot.files.head.path
        graft.tables.Fs.deleteIfExists(GraftTable.resolveDataPath(t.path, victim))
        intercept[Exception] { t.toDF.collect() } // scans now die
        assert(TableOps.fsck(t, dryRun = true) == Seq(victim))
        assert(t.version == 0L) // dry run committed nothing
        assert(TableOps.fsck(t) == Seq(victim))
        val t2 = GraftTable.forPath(spark, t.path)
        assert(t2.version == 1L)
        assert(t2.history().head._2.operation == "FSCK")
        assert(t2.toDF.count() == 4) // the two lost rows are gone, rest reads
      } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    }

    it("duration-based vacuum survives non-monotonic commit timestamps") {
      val t = GraftTable.create(spark, tmpTableDir("vac_skew"),
        Seq((1, "a")).toDF("id", "name").repartition(1))      // v0
      t.overwrite(Seq((2, "b")).toDF("id", "name"))           // v1
      t.append(Seq((3, "c")).toDF("id", "name"))              // v2
      val log = t.log
      def ageVersion(v: Long, hoursAgo: Double): Unit = {
        val ts = System.currentTimeMillis() - (hoursAgo * 3600 * 1000).toLong
        log.rewriteVersion(v, log.actionsAt(v).map {
          case ci: CommitInfo => ci.copy(timestamp = ts)
          case other          => other
        })
      }
      // v2's writer clock runs BEHIND: its wall-clock timestamp (50 h ago)
      // is older than v1's (10 h ago). A naive "max version with ts <=
      // cutoff" would pick v2 as the 24 h horizon and vacuum v1 — a version
      // younger than the cutoff. Monotonized timestamps keep v1 safe.
      ageVersion(0L, 100); ageVersion(1L, 10); ageVersion(2L, 50)
      TableOps.vacuum(t, retainHours = 24.0)
      assert(log.versions().contains(1L),
        "clock-skewed v2 must not drag the younger v1 below the horizon")
      assert(t.toDFAt(1).count() == 1)
    }

    it("no-arg vacuum reads graft.logRetentionDuration (default 7 days)") {
      val t = GraftTable.create(spark, tmpTableDir("vac_prop"),
        Seq((1, "a")).toDF("id", "name").repartition(1),
        properties = Map(graft.operators.TableOps.LogRetentionProperty -> "interval 30 hours"))
      t.overwrite(Seq((2, "b")).toDF("id", "name")) // v1
      t.append(Seq((3, "c")).toDF("id", "name"))    // v2
      val log = t.log
      def ageVersion(v: Long, hoursAgo: Double): Unit = {
        val ts = System.currentTimeMillis() - (hoursAgo * 3600 * 1000).toLong
        log.rewriteVersion(v, log.actionsAt(v).map {
          case ci: CommitInfo => ci.copy(timestamp = ts)
          case other          => other
        })
      }
      ageVersion(0L, 100); ageVersion(1L, 40); ageVersion(2L, 1)
      // 30 h retention: v1 (40 h old) is the horizon, v0 goes
      assert(TableOps.vacuum(t) >= 1)
      assert(log.versions() == Seq(1L, 2L))

      // malformed retention fails loudly instead of deleting history
      t.setProperties(Map(graft.operators.TableOps.LogRetentionProperty -> "30h"))
      val e = intercept[IllegalArgumentException] { TableOps.vacuum(t) }
      assert(e.getMessage.contains("interval 7 days"), e.getMessage)

      // parser vocabulary
      assert(graft.operators.TableOps.parseRetentionHours("interval 2 days") == 48.0)
      assert(graft.operators.TableOps.parseRetentionHours("Interval 1 week") == 168.0)
      assert(graft.operators.TableOps.parseRetentionHours("interval 12 HOURS") == 12.0)
    }

    it("restore undoes a DV delete: the dv-changed path re-adds the target entry") {
      // a DV delete keeps the file's PATH and attaches a dv descriptor —
      // restore must diff by (path, dv), not path alone, or the "restored"
      // state silently keeps the mask and loses the target's rows
      val t = GraftTable.create(spark, tmpTableDir("restore-dv"),
        (0 until 10).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1),
        properties = Map(GraftLog.CdfProperty -> "true",
          graft.tables.DeletionVectors.Property -> "true"))       // v0
      TableOps.delete(t, Some("id < 3"))                           // v1: same path + dv
      val masked = GraftTable.forPath(spark, t.path)
      assert(masked.snapshot.files.exists(_.dv.exists(_.cardinality == 3)),
        "fixture must take the DV merge-on-read path")
      assert(masked.toDF.count() == 7)

      val rv = TableOps.restore(t, 0L)                             // v2
      val t2 = GraftTable.forPath(spark, t.path)
      assert(t2.toDF.count() == 10, "restore must unmask the DV'd rows")
      assert(t2.snapshot.files.forall(_.dv.isEmpty),
        "the restored entry must be the target's (no dv)")
      // synthesized CDF: the masked file's 7 LIVE rows leave, all 10 return
      assert(!t2.log.actionsAt(rv).exists(_.isInstanceOf[graft.tables.AddCDCFile]))
      val cdf = graft.log.ChangeDataFeedHelper(spark, t.path, rv, rv).readCDF
        .groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cdf == Map("delete" -> 7L, "insert" -> 10L), s"restore-over-DV CDF: $cdf")
      // the STREAM synthesizes the same commit (insert side = ALL adds —
      // the same-path re-add carries the returning rows)
      val sink = "restore_dv_sink_" + System.nanoTime()
      val q = spark.readStream.format("graft")
        .option("startingVersion", rv).format("graft").load(t.path)
        .writeStream.format("memory").queryName(sink).outputMode("append").start()
      try {
        q.processAllAvailable()
        val byType = spark.table(sink).groupBy("_change_type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(byType == Map("delete" -> 7L, "insert" -> 10L), s"stream: $byType")
      } finally q.stop()
      // a target whose DV SIDECAR is gone is as unreconstructible as one
      // whose data bytes are (fsck's rule): restore to the dv-carrying v1
      // after sweeping _dv must refuse, not resurrect the deleted rows
      graft.tables.Fs.deleteRecursively(
        graft.tables.Fs.child(t.path, graft.tables.DeletionVectors.DirName))
      val e = intercept[IllegalStateException] { TableOps.restore(t2, 1L) }
      assert(e.getMessage.contains("vacuumed"), e.getMessage)
    }

    it("restore reverts data, schema and properties; history stays travelable") {
      val t = GraftTable.create(spark, tmpTableDir("restore"),
        Seq((0, "a"), (1, "b"), (2, "c")).toDF("id", "name").coalesce(1),
        properties = Map(GraftLog.CdfProperty -> "true"))        // v0
      TableOps.delete(t, Some("id = 1"))                          // v1: rewrites the file
      t.append(Seq((9, "z", 5L)).toDF("id", "name", "extra"))     // v2: schema evolves

      val rv = TableOps.restore(t, 0L)                            // v3
      assert(rv == 3L)
      // data and schema are the v0 state again
      assert(t.toDF.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
        Set((0, "a"), (1, "b"), (2, "c")))
      assert(t.snapshot.schema.fieldNames.toSeq == Seq("id", "name"))
      assert(t.history().head._2.operation == "RESTORE")
      // the undone states remain time-travelable (restore is a NEW commit)
      assert(t.toDFAt(2).count() == 3) // rows 0,2,9
      assert(t.toDFAt(1).count() == 2)
      // CDF consumers see the restore as data change: the current rows that
      // vanished as deletes, the returning v0 rows as inserts
      val cdf = graft.log.ChangeDataFeedHelper(spark, t.path, 3, 3).readCDF
        .groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cdf == Map("delete" -> 3L, "insert" -> 3L), s"restore CDF: $cdf")
      // ...SYNTHESIZED from the commit's remove/add actions: the restore
      // writes ZERO change files (write-time materialization would be
      // O(diff) write amplification — the REPLACE posture applies)
      assert(!t.log.actionsAt(3L).exists(_.isInstanceOf[graft.tables.AddCDCFile]),
        "RESTORE must not write _change_data files")
      // restoring to the current version is a no-op
      assert(TableOps.restore(t, 3L) == 3L)

      // a target whose FILES are gone (log intact) names the vacuumed state
      val v2Only = t.log.snapshot(2L).files.map(_.path)
        .filterNot(t.snapshot.files.map(_.path).toSet)
      java.nio.file.Files.delete(java.nio.file.Paths.get(t.path, v2Only.head))
      val e = intercept[IllegalStateException] { TableOps.restore(t, 2L) }
      assert(e.getMessage.contains("vacuumed"), e.getMessage)
      // a target whose LOG was vacuumed fails at snapshot resolution
      v2Only.tail.foreach(p =>
        java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(t.path, p)))
      TableOps.vacuum(t, retainVersion = 3L)
      assertThrows[IllegalArgumentException] { TableOps.restore(t, 2L) }
    }

    it("zOrderBy tightens per-file min/max ranges") {
      val df = (1 to 64).map(i => ((i * 37) % 64, s"n$i")).toDF("id", "name").repartition(4)
      val t = GraftTable.create(spark, tmpTableDir("zo"), df)
      TableOps.zOrderBy(t, Seq("id"), numFiles = 4)
      val ranges = t.snapshot.files.flatMap(f => GraftLog.parseStats(f.stats))
        .map(s => (s.minValues("id").toLong, s.maxValues("id").toLong))
      // non-overlapping ranges after range-partitioned rewrite
      val sorted = ranges.sortBy(_._1)
      sorted.sliding(2).foreach {
        case Seq((_, max1), (min2, _)) => assert(max1 <= min2)
        case _ => ()
      }
    }

    it("2-column zOrderBy prunes on the SECOND column alone (real interleave)") {
      // 64x64 grid in random row order → 16 files. A lexicographic (x, y)
      // sort leaves every file's y-range at full width (zero pruning on y);
      // real bit-interleaved z-order gives each file a tile, so a y-strip
      // predicate must prune more than half the files.
      val rnd = new scala.util.Random(42)
      val grid = rnd.shuffle((0 until 64).flatMap(x => (0 until 64).map(y => (x, y))).toVector)
      val t = GraftTable.create(spark, tmpTableDir("zo2"),
        grid.toDF("x", "y").repartition(4))
      TableOps.zOrderBy(t, Seq("x", "y"), numFiles = 16)
      assert(t.snapshot.files.size == 16)
      assert(t.toDF.count() == 64 * 64)

      val mY = GraftHelpers.getNumShuffleFiles(t, "y >= 0 AND y <= 7")
      val total = mY("totalFilesInTable").asInstanceOf[Long]
      assert(total == 16L)
      assert(mY("overall").asInstanceOf[Int] <= 8,
        s"y-only predicate kept ${mY("overall")} of $total files — second column not clustered")
      // the first column keeps pruning too
      val mX = GraftHelpers.getNumShuffleFiles(t, "x >= 0 AND x <= 7")
      assert(mX("overall").asInstanceOf[Int] <= 8,
        s"x predicate kept ${mX("overall")} of $total files")
    }
  }
}
