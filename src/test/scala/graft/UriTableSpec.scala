package graft

import org.scalatest.funspec.AnyFunSpec

import org.apache.spark.sql.functions._

import graft.operators.{GraftMerge, TableOps}
import graft.tables.{DistributedSnapshot, Fs, GraftLog, GraftTable, HadoopLogStore, LogStore}

/** End-to-end engine surface on a REMOTE-scheme table path (`faux://` —
  * a foreign Hadoop filesystem; see [[graft.tools.FauxFileSystem]]): create / append /
  * scan / merge / delete / update / CDF / time travel / checkpoints
  * (JSON + parquet, driver + distributed) / vacuum / OCC / streaming /
  * convert / shallow clone / catalog, all addressed by URI. What this
  * proves: no code path between the commit log and the scan assumes local
  * `java.nio` storage — the gap the round-13 horizon named ("HadoopLogStore
  * serves hadoop-API IO but GraftLog's JPath addressing keeps log objects
  * local") is closed.
  */
class UriTableSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def fauxDir(prefix: String): String = {
    // the shared session must exist before any Fs call: its Hadoop conf
    // carries the faux:// scheme registration (exactly like production,
    // where the scheme impl rides the cluster's spark.hadoop.* conf)
    spark.sparkContext
    "faux://" + java.nio.file.Files.createTempDirectory(prefix)
      .resolve("table").toString
  }

  /** ONE faux_cat warehouse for every catalog-exercising case here — Spark
    * caches the catalog instance with the warehouse of FIRST use, so the
    * cases must share it and isolate by namespace (the same rule as the
    * shared graft_cat warehouse).
    */
  private lazy val fauxCatWarehouse: String = {
    val w = fauxDir("uri-wh")
    spark.conf.set("spark.sql.catalog.faux_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.faux_cat.warehouse", w)
    w
  }
  private def fauxCat(): String = fauxCatWarehouse

  describe("Fs scheme dispatch") {
    it("classifies paths and joins children per scheme") {
      assert(Fs.isRemote("faux:///a/b"))
      assert(Fs.isRemote("hdfs://nn:8020/t"))
      assert(!Fs.isRemote("/a/b"))
      assert(!Fs.isRemote("file:/a/b"))
      assert(!Fs.isRemote("a:b")) // not a scheme — no "//"
      assert(Fs.normalize("file:/a/b") == "/a/b")
      assert(Fs.normalize("faux:///a/b/") == "faux:///a/b")
      assert(Fs.normalize("faux://nn/t//") == "faux://nn/t") // idempotent-canonical
      assert(Fs.normalize("faux:///") == "faux:///") // scheme root keeps its slash
      // java.net.URI's null-authority single-slash rendering (Spark's DDL
      // LOCATION normalization produces it) converges to the canonical form
      assert(Fs.isRemote("faux:/a/b"))
      assert(Fs.normalize("faux:/a/b") == "faux:///a/b")
      assert(Fs.child("faux:/a", "b") == "faux:///a/b")
      assert(Fs.parent("faux:/a/b") == "faux:///a")
      assertThrows[IllegalArgumentException](Fs.parent("lonesegment"))
      assert(Fs.child("faux:///a", "b/c") == "faux:///a/b/c")
      assert(Fs.child("/a", "b/c") == "/a/b/c")
      assert(Fs.parent("faux:///a/b") == "faux:///a")
      assert(Fs.fileName("faux:///a/b.json") == "b.json")
      assert(Fs.relativize("faux:///a", "faux:///a/b/c") == "b/c")
    }

    it("file: URIs with URI-hostile characters normalize to intact local paths") {
      // '#' is a URI fragment delimiter and '%' is illegal un-escaped —
      // both are legal POSIX file-name bytes; normalize must not parse
      // them away (a '#' used to silently TRUNCATE the path)
      assert(Fs.normalize("file:/a/b#2024/c") == "/a/b#2024/c")
      assert(Fs.normalize("file:/a/100%table") == "/a/100%table")
      assert(Fs.normalize("file:/a/x%20y") == "/a/x y") // real escapes decode
      // (multi-byte UTF-8 escapes decode too, but this JVM's ASCII locale
      // rejects non-ASCII in Paths.get — same limit as vanilla Spark here)
      assert(Fs.normalize("file:///a/b") == "/a/b")
      assert(Fs.normalize("file://localhost/a/b") == "/a/b")
      assertThrows[IllegalArgumentException](Fs.normalize("file://otherhost/a/b"))
      // File.toURI round-trip (the spelling Spark hands around)
      val f = new java.io.File("/tmp/graft weird#dir")
      assert(Fs.normalize(f.toURI.toString) == "/tmp/graft weird#dir")
    }

    it("routes remote paths to the Hadoop log store automatically") {
      assert(LogStore.forPath("faux:///x/t").isInstanceOf[HadoopLogStore])
      assert(LogStore.forPath("/x/t") eq LogStore.Posix)
    }

    it("round-trips IO on the remote scheme") {
      val dir = fauxDir("fs-io")
      Fs.mkdirs(dir)
      assert(Fs.isDirectory(dir))
      val f = Fs.child(dir, "x.txt")
      Fs.writeAtomic(f, "a\nb\n".getBytes("UTF-8"))
      assert(Fs.readLines(f) == Seq("a", "b"))
      assert(Fs.size(f) == 4L)
      assert(Fs.listNames(dir).map(_._1) == Seq("x.txt"))
      assert(Fs.walkFiles(dir).map(Fs.fileName(_)) == Seq("x.txt"))
      val g = Fs.child(dir, "y.txt")
      Fs.moveNoReplace(f, g)
      assert(!Fs.exists(f) && Fs.exists(g))
      assertThrows[java.nio.file.FileAlreadyExistsException] {
        Fs.writeAtomic(f, "z".getBytes); Fs.moveNoReplace(f, g)
      }
      assert(Fs.deleteIfExists(g))
      Fs.deleteRecursively(dir)
      assert(!Fs.exists(dir))
    }
  }

  describe("graft table on a faux:// URI") {
    it("create / scan / filter / append / time travel") {
      val dir = fauxDir("uri-basic")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "name"))
      assert(t.toDF.count() == 3)
      assert(t.toDF.where($"id" === 2).select($"name").as[String].collect().toSeq == Seq("b"))
      t.append(Seq((4, "d")).toDF("id", "name"))
      assert(t.toDF.count() == 4)
      // time travel by version through the URI-addressed log
      assert(t.snapshotAt(0L).files.nonEmpty)
      assert(GraftTable.forPath(spark, dir).toDFAt(0L).count() == 3)
      // input files surface as faux:// URIs
      assert(t.toDF.inputFiles.forall(_.startsWith("faux://")))
    }

    it("partitioned create prunes partitions from log metadata") {
      val dir = fauxDir("uri-part")
      val t = GraftTable.create(spark, dir,
        Seq((1, "x", "2024"), (2, "y", "2025"), (3, "z", "2025"))
          .toDF("id", "name", "year"),
        partitionColumns = Seq("year"))
      val pruned = t.toDF.where($"year" === "2025")
      assert(pruned.count() == 2)
      // only the matching partition's files are actually scanned
      val scanned = pruned.select(input_file_name()).distinct().as[String].collect()
      assert(scanned.nonEmpty && scanned.forall(u => u.contains("year=2025")))
    }

    it("merge / update / delete rewrite through hadoop-fs staging") {
      val dir = fauxDir("uri-dml")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("id", "name", "score"))
      GraftMerge(t, "old")
        .merge(Seq((2, "B!", 200), (4, "d", 40)).toDF("id", "name", "score"),
          "old.id = new.id", Some("new"))
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "a", 10), (2, "B!", 200), (3, "c", 30), (4, "d", 40))
          .toDF("id", "name", "score"))
      TableOps.update(t, Some("id = 1"), Map("score" -> "11"))
      TableOps.delete(t, Some("id = 3"))
      assertSmallDataFrameEquality(t.toDF,
        Seq((1, "a", 11), (2, "B!", 200), (4, "d", 40)).toDF("id", "name", "score"))
    }

    it("deletion vectors mask rows on the remote scheme") {
      val dir = fauxDir("uri-dv")
      val t = GraftTable.create(spark, dir,
        (1 to 20).map(i => (i, s"n$i")).toDF("id", "name"),
        properties = Map(graft.tables.DeletionVectors.Property -> "true"))
      // a per-file PARTIAL delete (a whole-file match would be a plain
      // remove — no descriptor by design)
      TableOps.delete(t, Some("id % 4 = 1"))
      assert(t.toDF.count() == 15)
      assert(t.toDF.where($"id" % 4 === 1).count() == 0)
      // the position sidecar landed under the table's OWN scheme (the bug
      // class: a java.nio join would mangle the URI and strand the sidecar)
      assert(t.snapshot.files.exists(_.dv.exists(_.cardinality > 0)))
      assert(Fs.isDirectory(Fs.child(dir, graft.tables.DeletionVectors.DirName)))
    }

    it("CDF round-trips through URI-addressed change files") {
      val dir = fauxDir("uri-cdf")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a")).toDF("id", "name"),
        properties = Map(GraftLog.CdfProperty -> "true"))
      TableOps.update(t, Some("id = 1"), Map("name" -> "'A'"))
      val cdf = graft.log.ChangeDataFeedHelper(spark, dir, 0).readCDF
      val types = cdf.select($"_change_type").as[String].collect().toSet
      assert(types == Set("insert", "update_preimage", "update_postimage"))
    }

    it("checkpoints (JSON auto + parquet + distributed) fold on the URI log") {
      val dir = fauxDir("uri-ckpt")
      val t = GraftTable.create(spark, dir, Seq((0, "v0")).toDF("id", "name"),
        properties = Map(GraftLog.CheckpointFormatProperty -> "parquet"))
      (1 to 11).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "name")))
      val log = new GraftLog(dir)
      // the commit-cadence checkpoint fired at v10 with the parquet format
      assert(log.checkpointVersions().contains(10L))
      assert(Fs.isDirectory(log.checkpointParquetDir(10L)))
      assert(log.snapshot().files.size == 12)
      // the EXECUTOR fold reads the same URI-addressed log
      val dist = DistributedSnapshot.addFiles(spark, dir).map(_.path).toSet
      assert(dist == log.snapshot().files.map(_.path).toSet)
      // distributed checkpoint writer over the URI log
      DistributedSnapshot.writeCheckpoint(spark, dir)
      assert(log.checkpointVersions().contains(log.latestVersion()))
      // pruned planning collects only matching files
      val pruned = DistributedSnapshot.prunedFiles(spark, dir, "id = 7")
      assert(pruned.nonEmpty && pruned.size < 12)
    }

    it("vacuum deletes dead remote files and rewrites the horizon") {
      val dir = fauxDir("uri-vacuum")
      val t = GraftTable.create(spark, dir,
        (1 to 100).map(i => (i, s"n$i")).toDF("id", "name").repartition(2))
      TableOps.delete(t, Some("id <= 50"))
      val deadBefore = TableOps.vacuumDryRun(t, t.version)
      assert(deadBefore.nonEmpty)
      val deleted = TableOps.vacuum(t, t.version)
      assert(deleted >= deadBefore.size)
      assert(t.toDF.count() == 50)
      assert(TableOps.vacuumDryRun(GraftTable.forPath(spark, dir),
        new GraftLog(dir).latestVersion()).isEmpty)
    }

    it("concurrent appends arbitrate through the Hadoop store's claim") {
      val dir = fauxDir("uri-occ")
      GraftTable.create(spark, dir, Seq((0, "base")).toDF("id", "name"))
      val threads = (1 to 2).map { w =>
        new Thread(() => {
          val mine = GraftTable.forPath(spark, dir)
          (0 until 3).foreach(i => mine.append(Seq((w * 10 + i, s"w$w")).toDF("id", "name")))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val t = GraftTable.forPath(spark, dir)
      assert(t.version == 6L)
      assert(t.toDF.count() == 7)
    }

    it("exactly-once streaming sink writes epochs to the URI table") {
      val dir = fauxDir("uri-stream")
      implicit val sqlCtx = spark.sqlContext
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]
      src.addData((1, "a"), (2, "b"))
      val q = graft.streaming.GraftSink
        .writeStreamTo(src.toDF().toDF("id", "name"), dir, appId = "uri-stream-app")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("uri-stream-ckpt").toString)
        .start()
      q.awaitTermination(60000)
      val t = GraftTable.forPath(spark, dir)
      assert(t.toDF.count() == 2)
      // the epoch watermark rode the same commit
      assert(t.snapshot.transactions.contains("uri-stream-app"))
    }

    it("CONVERT and shallow clone work across the scheme boundary") {
      val dir = fauxDir("uri-convert")
      Seq((1, "a"), (2, "b")).toDF("id", "name").write.parquet(dir)
      val t = GraftTable.convert(spark, dir)
      assert(t.toDF.count() == 2)
      // clone the URI table into a LOCAL dir: external refs stay faux:// URIs
      val localDest = tmpTableDir("uri-clone-dest")
      val clone = GraftTable.shallowClone(spark, dir, localDest)
      assert(clone.snapshot.files.forall(f => f.path.startsWith("faux://")))
      assert(clone.toDF.count() == 2)
      // the clone's vacuum never touches the source's files
      TableOps.vacuum(clone, clone.version)
      assert(GraftTable.forPath(spark, dir).toDF.count() == 2)
    }

    it("streaming source reads a faux:// table with exactly-once admission") {
      val dir = fauxDir("uri-src")
      val t = GraftTable.create(spark, dir,
        Seq((1, "a"), (2, "b")).toDF("id", "name"))
      t.append(Seq((3, "c")).toDF("id", "name"))
      val mem = s"uri_src_mem_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      val q = spark.readStream.format("graft").option("path", dir).load()
        .writeStream.format("memory").queryName(mem)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("uri-src-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      assert(spark.table(mem).count() == 3)
    }

    it("distributed vacuum delete fans out over the remote scheme") {
      // force the executor-side hadoop-fs delete branch (threshold 1);
      // restore the conf even on failure — suites share the session
      spark.conf.set("spark.graft.vacuum.distributedDeleteThreshold", "1")
      try {
        val dir = fauxDir("uri-vac-dist")
        val t = GraftTable.create(spark, dir,
          (1 to 100).map(i => (i, s"n$i")).toDF("id", "name").repartition(4))
        TableOps.delete(t, Some("id <= 50"))
        val dead = TableOps.vacuumDryRun(t, t.version)
        assert(dead.nonEmpty)
        val deleted = TableOps.vacuum(t, t.version)
        assert(deleted >= dead.size)
        assert(t.toDF.count() == 50)
        // the dead bytes are physically gone from the remote scheme
        dead.foreach(rel => assert(!Fs.exists(Fs.child(dir, rel)), rel))
      } finally spark.conf.unset("spark.graft.vacuum.distributedDeleteThreshold")
    }

    it("writeStream.toTable streams into a faux-warehouse catalog table") {
      fauxCat()
      spark.sql("CREATE NAMESPACE IF NOT EXISTS faux_cat.sw")
      implicit val sqlCtx = spark.sqlContext
      val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Int, String)]
      src.addData((1, "a"), (2, "b"), (3, "c"))
      val q = src.toDF().toDF("id", "name")
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("uri-tot-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("faux_cat.sw.st")
      q.awaitTermination(60000)
      assert(spark.sql("SELECT count(*) FROM faux_cat.sw.st").head().getLong(0) == 3L)
      // the per-task writers staged DIRECTLY on the remote scheme and the
      // epoch registered through the pre-staged seam with its watermark
      val t = GraftTable.forName(spark, "faux_cat.sw.st")
      assert(t.path.startsWith("faux://"))
      assert(t.snapshot.transactions.nonEmpty)
    }

    it("V2 catalog serves a faux:// warehouse") {
      fauxCat()
      spark.sql("CREATE NAMESPACE faux_cat.ns")
      spark.sql("CREATE TABLE faux_cat.ns.t (id INT, name STRING) USING graft")
      spark.sql("INSERT INTO faux_cat.ns.t VALUES (1, 'a'), (2, 'b')")
      assert(spark.sql("SELECT * FROM faux_cat.ns.t").count() == 2)
      spark.sql("UPDATE faux_cat.ns.t SET name = 'A' WHERE id = 1")
      assert(spark.sql("SELECT name FROM faux_cat.ns.t WHERE id = 1")
        .as[String].collect().toSeq == Seq("A"))
      assert(spark.sql("SHOW TABLES IN faux_cat.ns").count() == 1)
      spark.sql("DROP TABLE faux_cat.ns.t")
      assert(spark.sql("SHOW TABLES IN faux_cat.ns").count() == 0)
    }
  }
}
