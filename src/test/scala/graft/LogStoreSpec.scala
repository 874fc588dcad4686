package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funspec.AnyFunSpec

import graft.tables._

/** The commit protocol against the [[LogStore]] seam: the conditional-put
  * store (object-store shape: one atomic claim-and-publish primitive, no
  * debris recovery, no marker fallback) and the fault-injecting in-memory
  * store (duplicate-claim, list-lag, lost read visibility). The invariant
  * under every fault: the conditional put arbitrates — a version is never
  * silently overwritten and never double-claimed, even when listing or
  * reads lie.
  */
class LogStoreSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def schemaJson =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType))).json

  /** Join every writer against ONE shared deadline, then assert none is
    * still alive — a silent `join` timeout must read as "storm did not
    * finish in budget" (liveness), never fall through to the chain
    * assertions and get misreported as lost commits.
    */
  private def joinAllOrFail(writers: Seq[Thread], budgetMs: Long): Unit = {
    val deadline = System.nanoTime() + budgetMs * 1000000L
    writers.foreach { t =>
      t.join(math.max(1L, (deadline - System.nanoTime()) / 1000000L))
    }
    val stillRunning = writers.count(_.isAlive)
    if (stillRunning > 0) {
      writers.foreach(_.interrupt())
      fail(s"storm liveness budget (${budgetMs / 1000} s) expired with " +
        s"$stillRunning writers still retrying — a TIMEOUT, not lost commits")
    }
  }

  describe("ConditionalPutLogStore") {
    it("rejects the second claimant of a version (non-POSIX claim shape)") {
      val dir = tmpTableDir("ls-cput")
      Files.createDirectories(Paths.get(dir))
      val log = new GraftLog(dir, LogStore.ConditionalPut)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      // store-level: present key = conflict, full stop
      intercept[java.nio.file.FileAlreadyExistsException] {
        LogStore.ConditionalPut.putIfAbsent(log.versionFile(0L), "x".getBytes)
      }
      // log-level translation
      intercept[CommitConflictException] {
        log.commit(0L, Seq(CommitInfo(1L, "WRITE")))
      }
      // the loser never tore the winner's content
      assert(log.actionsAt(0L).collect { case ci: CommitInfo => ci.operation }
        == Seq("CREATE TABLE"))
    }

    it("full table lifecycle works through the conditional-put store") {
      val dir = tmpTableDir("ls-cput-table")
      LogStore.register(dir, LogStore.ConditionalPut)
      try {
        val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
        assert(t.log.store eq LogStore.ConditionalPut)
        t.append(Seq((3L, "c")).toDF("id", "v"))
        graft.operators.TableOps.delete(t, Some("id = 1"))
        val t2 = GraftTable.forPath(spark, dir)
        assert(t2.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
        assert(t2.toDFAt(0L).count() == 2)
      } finally LogStore.unregister(dir)
    }
  }

  describe("HadoopLogStore (FileSystem/FileContext backend)") {
    it("rejects the second claimant of a version via rename-no-overwrite") {
      val dir = tmpTableDir("ls-hadoop")
      Files.createDirectories(Paths.get(dir))
      val store = LogStore.Hadoop
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      intercept[java.nio.file.FileAlreadyExistsException] {
        store.putIfAbsent(log.versionFile(0L), "x".getBytes)
      }
      intercept[CommitConflictException] {
        log.commit(0L, Seq(CommitInfo(1L, "WRITE")))
      }
      // the loser never tore the winner's content, and no temp debris stays
      assert(log.actionsAt(0L).collect { case ci: CommitInfo => ci.operation }
        == Seq("CREATE TABLE"))
      assert(!store.list(log.logDir).exists(_._1.endsWith(".tmp")))
      // store primitives round-trip
      val side = graft.tables.Fs.child(log.logDir, "side.txt")
      store.overwrite(side, "a\nb".getBytes)
      assert(store.read(side) == Seq("a", "b"))
      store.overwrite(side, "c".getBytes)
      assert(store.read(side) == Seq("c"))
      assert(store.delete(side) && !store.exists(side))
    }

    it("full lifecycle + executor-side fold work through the hadoop store") {
      val dir = tmpTableDir("ls-hadoop-table")
      LogStore.register(dir, LogStore.Hadoop)
      try {
        val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
        assert(t.log.store eq LogStore.Hadoop)
        t.append(Seq((3L, "c")).toDF("id", "v"))
        graft.operators.TableOps.delete(t, Some("id = 1"))
        val t2 = GraftTable.forPath(spark, dir)
        assert(t2.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
        assert(t2.toDFAt(0L).count() == 2)
        // filesystemBacked: DistributedSnapshot's executor fold applies
        val dist = graft.tables.DistributedSnapshot.addFiles(spark, dir)
          .map(_.path).toSet
        assert(dist == t2.snapshot.files.map(_.path).toSet)
      } finally LogStore.unregister(dir)
    }

    it("in-JVM claim storm: exactly one winner per version, contiguous chain") {
      val dir = tmpTableDir("ls-hadoop-race")
      Files.createDirectories(Paths.get(dir))
      val store = LogStore.Hadoop
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val threads = 8
      val versions = 12
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        (1 to versions).foreach { v =>
          val latch = new java.util.concurrent.CountDownLatch(threads)
          val done = new java.util.concurrent.CountDownLatch(threads)
          (0 until threads).foreach { tIdx =>
            pool.execute { () =>
              latch.countDown(); latch.await()
              try {
                log.commit(v.toLong, Seq(CommitInfo(v.toLong, s"WRITE-$tIdx")))
                wins.incrementAndGet()
              } catch { case _: CommitConflictException => () }
              finally done.countDown()
            }
          }
          done.await()
        }
      } finally pool.shutdown()
      // one winner per version, log contiguous, every file full content
      assert(wins.get() == versions)
      assert(log.versions() == (0L to versions.toLong))
      (0L to versions.toLong).foreach { v =>
        assert(log.actionsAt(v).nonEmpty, s"torn/empty version $v")
      }
    }

    it("declares its cross-process atomicity capability per scheme") {
      val store = new graft.tables.HadoopLogStore(
        new org.apache.hadoop.conf.Configuration())
      assert(store.crossProcessAtomic("hdfs"))
      assert(store.crossProcessAtomic("abfss"))
      assert(!store.crossProcessAtomic("file"), "LocalFs rename-no-overwrite is " +
        "check-then-rename — cross-process claims need PosixLogStore there")
      assert(!store.crossProcessAtomic("s3a"))
    }
  }

  describe("InMemoryLogStore fault injection") {
    it("duplicate-claim: racing writers get exactly one winner per version") {
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-race")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val n = 20
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val losses = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 4).map { w =>
        new Thread(() => {
          var committed = 0
          while (committed < n) {
            val v = log.latestVersion() + 1
            try {
              log.commit(v, Seq(CommitInfo(System.currentTimeMillis(), "RACE",
                operationParameters = Map("writer" -> w.toString))))
              committed += 1; wins.incrementAndGet(); ()
            } catch { case _: CommitConflictException => losses.incrementAndGet(); () }
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(60000))
      assert(wins.get == 4 * n)
      // contiguous chain: every claimed version has exactly one committed body
      assert(log.versions() == (0L to 4L * n))
      assert(losses.get > 0, "the race never contended — not a meaningful proof")
    }

    it("list-lag: a writer working from a stale listing is rejected, never overwrites") {
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-lag")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      // the list lags from here on: the NEXT commit is invisible to listings
      store.freezeListNow()
      log.commit(1L, Seq(AddFile("f1.parquet"), CommitInfo(1L, "WRITE")))
      assert(log.versions() == Seq(0L), "lag injection did not take")
      // a writer computing "next version" from the lagging list collides
      // with the real head — the conditional put rejects it LOUDLY
      val next = log.latestVersion() + 1
      assert(next == 1L)
      intercept[CommitConflictException] {
        log.commit(next, Seq(CommitInfo(2L, "WRITE")))
      }
      // nothing was overwritten: once the lag clears, version 1 is intact
      store.unfreezeList()
      assert(log.versions() == Seq(0L, 1L))
      assert(log.snapshot(1L).files.map(_.path) == Seq("f1.parquet"))
      // and the retry-at-next-version path (what TableWriter does on
      // conflict) now lands cleanly
      log.commit(2L, Seq(CommitInfo(3L, "WRITE")))
      assert(log.versions() == Seq(0L, 1L, 2L))
    }

    it("lost read visibility: an invisible commit still cannot be replaced") {
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-viz")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      store.freezeReadsNow()
      store.freezeListNow()
      log.commit(1L, Seq(AddFile("f1.parquet"), CommitInfo(1L, "WRITE")))
      // the winner's commit is invisible to BOTH list and read...
      assert(!store.exists(log.versionFile(1L)))
      // ...but the claim still arbitrates: no writer can take its place
      intercept[CommitConflictException] {
        log.commit(1L, Seq(CommitInfo(9L, "EVIL")))
      }
      store.unfreezeReads()
      store.unfreezeList()
      assert(log.actionsAt(1L).collect { case ci: CommitInfo => ci.operation }
        == Seq("WRITE"))
    }

    it("randomized fault storm: list/read lag toggling mid-race never breaks the chain") {
      // 4 writers race 15 commits each while a chaos thread freezes and
      // unfreezes list/read visibility on a fixed schedule — under EVERY
      // interleaving the conditional put must keep the chain contiguous
      // with exactly one body per version (deterministic seed, so a
      // failure replays)
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-storm")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val n = 15
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val chaos = new Thread(() => {
        val rnd = new scala.util.Random(42)
        while (!stop.get()) {
          rnd.nextInt(4) match {
            case 0 => store.freezeListNow()
            case 1 => store.unfreezeList()
            case 2 => store.freezeReadsNow()
            case 3 => store.unfreezeReads()
          }
          Thread.sleep(1)
        }
        store.unfreezeList(); store.unfreezeReads()
      })
      chaos.start()
      val writers = (1 to 4).map { w =>
        new Thread(() => {
          var committed = 0
          var guess = 1L
          while (committed < n) {
            // under list lag latestVersion() can repeat stale answers —
            // a real writer advances its own guess past known conflicts
            val v = math.max(log.latestVersion() + 1, guess)
            try {
              log.commit(v, Seq(CommitInfo(System.currentTimeMillis(), "STORM",
                operationParameters = Map("writer" -> w.toString))))
              committed += 1
              guess = v + 1
            } catch { case _: CommitConflictException => guess = v + 1 }
          }
        })
      }
      writers.foreach(_.start())
      try joinAllOrFail(writers, 120000)
      finally { stop.set(true); chaos.join(10000) }
      val vs = log.versions()
      assert(vs == (0L to vs.last), s"non-contiguous chain: $vs")
      assert(vs.last >= 4L * n, s"writers lost commits: head ${vs.last}")
      (1L to vs.last).foreach { v =>
        val cis = log.actionsAt(v).collect { case ci: CommitInfo => ci }
        assert(cis.size == 1, s"version $v has ${cis.size} commit bodies")
      }
      // every writer landed exactly n wins
      val wins = (1L to vs.last).flatMap(v => log.actionsAt(v)
        .collectFirst { case ci: CommitInfo => ci.operationParameters("writer") })
      (1 to 4).foreach(w =>
        assert(wins.count(_ == w.toString) == n, s"writer $w win count off"))
    }

    it("a GraftTable write flow retries blind appends over the in-memory store") {
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-table")
      LogStore.register(dir, store)
      try {
        val t = GraftTable.create(spark, dir, Seq((0L, "base")).toDF("id", "v"))
        val threads = (1 to 2).map { w =>
          new Thread(() => {
            val mine = GraftTable.forPath(spark, dir)
            (0 until 3).foreach(i =>
              mine.append(Seq((w * 10L + i, s"w$w-$i")).toDF("id", "v")))
          })
        }
        threads.foreach(_.start()); threads.foreach(_.join(120000))
        val t2 = GraftTable.forPath(spark, dir)
        assert(t2.toDF.count() == 7) // base + 2 writers x 3 appends
        assert(t2.log.versions() == (0L to 6L))
      } finally LogStore.unregister(dir)
    }

    it("a parquet checkpoint keeps reading after re-routing to a non-fs store") {
      // the dir sidecar is written with java.nio regardless of the log's
      // store, so a table whose LOG is re-routed onto an object-store-shaped
      // backend must still fold its parquet checkpoints — silently folding
      // to an empty file set here was a round-13 review find
      val dir = tmpTableDir("ls-ckpt-reroute")
      val t = GraftTable.create(spark, dir, spark.range(10).toDF("id"),
        properties = Map(graft.tables.GraftLog.CheckpointFormatProperty -> "parquet"))
      t.append(spark.range(10, 15).toDF("id"))
      val log = new GraftLog(dir)
      val v = log.latestVersion()
      log.writeCheckpoint(v)
      val truth = log.snapshot(v).files.map(_.path).toSet
      assert(truth.nonEmpty)
      // mirror the log objects into an in-memory store and re-route
      val mem = new InMemoryLogStore
      val logDir = java.nio.file.Paths.get(dir, graft.tables.GraftLog.LogDirName)
      mem.createDirectories(logDir.toString)
      val listing = java.nio.file.Files.list(logDir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.foreach { p =>
          if (java.nio.file.Files.isRegularFile(p))
            mem.overwrite(p.toString, java.nio.file.Files.readAllBytes(p))
        }
      } finally listing.close()
      LogStore.register(dir, mem)
      try {
        val rerouted = new GraftLog(dir)
        assert(rerouted.store eq mem)
        assert(rerouted.snapshot(v).files.map(_.path).toSet == truth,
          "parquet checkpoint must fold through the local dir sidecar")
      } finally LogStore.unregister(dir)
    }

    it("non-fs parquet-property checkpoints: stamped-empty folds, missing-dir is loud") {
      // (a) a table living on a non-fs store with the parquet property
      // writes the self-contained JSON fallback — an EMPTY table's add-less
      // head must fold to empty (the stamp says it is complete)
      val memA = new InMemoryLogStore
      val dirA = tmpTableDir("ls-ckpt-stamp")
      LogStore.register(dirA, memA)
      try {
        val t = GraftTable.create(spark, dirA, spark.range(5).toDF("id"),
          properties = Map(graft.tables.GraftLog.CheckpointFormatProperty -> "parquet"))
        graft.operators.TableOps.delete(t, None) // live file set: empty
        val log = new GraftLog(dirA)
        log.writeCheckpoint(log.latestVersion())
        assert(log.snapshot().files.isEmpty) // complete, not an error
      } finally LogStore.unregister(dirA)

      // (b) a FS-written parquet checkpoint mirrored to a non-fs store
      // WITHOUT its dir sidecar (the lost-sidecar migration) must be LOUD,
      // never a silent empty fold
      val dirB = tmpTableDir("ls-ckpt-lost")
      val tB = GraftTable.create(spark, dirB, spark.range(8).toDF("id"),
        properties = Map(graft.tables.GraftLog.CheckpointFormatProperty -> "parquet"))
      val logB = new GraftLog(dirB)
      logB.writeCheckpoint(logB.latestVersion())
      val memB = new InMemoryLogStore
      val logDirB = java.nio.file.Paths.get(dirB, graft.tables.GraftLog.LogDirName)
      memB.createDirectories(logDirB.toString)
      val lb = java.nio.file.Files.list(logDirB)
      try {
        import scala.jdk.CollectionConverters._
        lb.iterator().asScala.foreach { p =>
          if (java.nio.file.Files.isRegularFile(p))
            memB.overwrite(p.toString, java.nio.file.Files.readAllBytes(p))
        }
      } finally lb.close()
      // drop the LOCAL sidecar dir: only the mirrored log objects survive
      graft.tables.Fs.deleteRecursively(
        logB.checkpointParquetDir(logB.latestVersion()))
      LogStore.register(dirB, memB)
      try {
        val e = intercept[IllegalStateException] { new GraftLog(dirB).snapshot() }
        assert(e.getMessage.contains("sidecar"))
      } finally LogStore.unregister(dirB)
    }

    it("DistributedSnapshot refuses a non-filesystem store loudly") {
      val store = new InMemoryLogStore
      val dir = tmpTableDir("ls-mem-ds")
      LogStore.register(dir, store)
      try {
        GraftTable.create(spark, dir, Seq((0L, "base")).toDF("id", "v"))
        val e = intercept[IllegalArgumentException] {
          DistributedSnapshot.addFilesDF(spark, dir).collect()
        }
        assert(e.getMessage.contains("file-addressable"))
      } finally LogStore.unregister(dir)
    }
  }

  describe("ObjectStoreLogStore (conditional-put API)") {
    import graft.tables.{LocalObjectStoreClient, ObjectStore, ObjectStoreLogStore}

    it("rejects the second claimant via If-None-Match; crossProcessAtomic holds") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      assert(store.crossProcessAtomic, "service-side arbitration is the point")
      val dir = tmpTableDir("ls-obj")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      intercept[ObjectStore.PreconditionFailedException] {
        client.putIfNoneMatch(log.versionFile(0L), "x".getBytes)
      }
      intercept[java.nio.file.FileAlreadyExistsException] {
        store.putIfAbsent(log.versionFile(0L), "x".getBytes)
      }
      intercept[CommitConflictException] {
        log.commit(0L, Seq(CommitInfo(1L, "WRITE")))
      }
      assert(log.actionsAt(0L).collect { case ci: CommitInfo => ci.operation }
        == Seq("CREATE TABLE"))
      // no temp debris from the losing claims
      assert(!store.list(log.logDir).exists(_._1.endsWith(".tmp")))
    }

    it("full table lifecycle + executor-side fold work through the object store") {
      val dir = tmpTableDir("ls-obj-table")
      LogStore.register(dir, new ObjectStoreLogStore(new LocalObjectStoreClient))
      try {
        val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
        t.append(Seq((3L, "c")).toDF("id", "v"))
        graft.operators.TableOps.delete(t, Some("id = 1"))
        val t2 = GraftTable.forPath(spark, dir)
        assert(t2.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
        assert(t2.toDFAt(0L).count() == 2)
        // fileAddressable client => filesystemBacked store => executor folds
        val dist = graft.tables.DistributedSnapshot.addFiles(spark, dir)
          .map(_.path).toSet
        assert(dist == t2.snapshot.files.map(_.path).toSet)
      } finally LogStore.unregister(dir)
    }

    it("claim storm: exactly one winner per version, contiguous chain") {
      val dir = tmpTableDir("ls-obj-race")
      val store = new ObjectStoreLogStore(new LocalObjectStoreClient)
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val threads = 8
      val versions = 12
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        (1 to versions).foreach { v =>
          val latch = new java.util.concurrent.CountDownLatch(threads)
          val done = new java.util.concurrent.CountDownLatch(threads)
          (0 until threads).foreach { tIdx =>
            pool.execute { () =>
              latch.countDown(); latch.await()
              try {
                log.commit(v.toLong, Seq(CommitInfo(v.toLong, s"WRITE-$tIdx")))
                wins.incrementAndGet()
              } catch { case _: CommitConflictException => () }
              finally done.countDown()
            }
          }
          done.await()
        }
      } finally pool.shutdown()
      assert(wins.get() == versions)
      assert(log.versions() == (0L to versions.toLong))
      (0L to versions.toLong).foreach { v =>
        assert(log.actionsAt(v).nonEmpty, s"torn/empty version $v")
      }
    }

    it("throttling (503-shaped pushback) is retried transparently") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-throttle")
      val log = new GraftLog(dir, store)
      client.throttleNextPuts(3)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      assert(client.throttleCount == 3, "the retry path never ran")
      assert(log.versions() == Seq(0L))
      // exhaustion is loud, not silent: more throttles than attempts fails
      client.throttleNextPuts(1000)
      intercept[ObjectStore.ThrottledException] {
        log.commit(1L, Seq(CommitInfo(1L, "WRITE")))
      }
      client.throttleNextPuts(0)
      log.commit(1L, Seq(CommitInfo(1L, "WRITE")))
      assert(log.versions() == Seq(0L, 1L))
    }

    it("ambiguous outcome, put LANDED: read-back recovery claims the win") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-amb-landed")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      // the service times out AFTER durably writing our object — failing
      // here would abandon a landed commit; blind retry would self-conflict
      client.ambiguousNextPut(land = true)
      log.commit(1L, Seq(CommitInfo(1L, "WRITE")))
      assert(log.versions() == Seq(0L, 1L))
      val cis = log.actionsAt(1L).collect { case ci: CommitInfo => ci }
      assert(cis.size == 1 && cis.head.operation == "WRITE")
    }

    it("ambiguous outcome, nothing landed: the retry lands it") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-amb-lost")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      client.ambiguousNextPut(land = false)
      log.commit(1L, Seq(CommitInfo(1L, "WRITE")))
      assert(log.versions() == Seq(0L, 1L))
    }

    it("ambiguous outcome, a RIVAL landed inside the timeout window: conflict, never overwrite") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-amb-rival")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      // our request's outcome is unknown AND a competing writer won the
      // version meanwhile — read-back must concede, never replace
      val rivalLog = new GraftLog(dir, new ObjectStoreLogStore(new LocalObjectStoreClient))
      val rivalBody = {
        // render a rival commit body through a scratch log at another dir
        val scratchDir = tmpTableDir("ls-obj-amb-rival-scratch")
        val scratch = new GraftLog(scratchDir, LogStore.Posix)
        scratch.commit(0L, Seq(CommitInfo(99L, "RIVAL")))
        java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(scratch.versionFile(0L)))
      }
      client.ambiguousNextPut(land = false, rival = Some(rivalBody))
      intercept[CommitConflictException] {
        log.commit(1L, Seq(CommitInfo(1L, "MINE")))
      }
      assert(rivalLog.actionsAt(1L).collect { case ci: CommitInfo => ci.operation }
        == Seq("RIVAL"), "the rival's landed commit must survive untouched")
    }

    it("two-JVM soak: 500 commits each under a randomized fault storm, gap-free chain") {
      // the claim/fault batteries prove the PRIMITIVES; this proves their
      // COMPOSITION under sustained cross-process contention: two real JVMs
      // alternate 500 commits each through their own client, arming a
      // random fault (throttle / ambiguous put landed / lost / ambiguous
      // or throttled GET) ahead of nearly every claim
      val dir = Files.createTempDirectory("ls-obj-soak").resolve("t").toString
      Files.createDirectories(Paths.get(dir))
      val store = new ObjectStoreLogStore(new LocalObjectStoreClient)
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      val n = 500
      def spawn(id: String, seed: Long): Process =
        new ProcessBuilder((Seq(javaBin, "-Xmx512m", "-cp", cp,
          "graft.tools.ObjectStoreSoak", dir, id, n.toString, seed.toString)): _*)
          .inheritIO().start()
      val a = spawn("A", 11L)
      val b = spawn("B", 77L)
      assert(a.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "soaker A hung")
      assert(b.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "soaker B hung")
      assert(a.exitValue() == 0 && b.exitValue() == 0,
        s"soaker exit codes: A=${a.exitValue()} B=${b.exitValue()}")
      // gap-free, double-claim-free version chain
      assert(log.versions() == (0L to 2L * n), s"non-contiguous: ${log.versions().take(20)}...")
      // byte-stable snapshots: every version re-reads identically through a
      // FRESH independent store (no torn/merged writes), parses cleanly,
      // and carries exactly one commitInfo
      val check = new ObjectStoreLogStore(new LocalObjectStoreClient)
      val checkLog = new GraftLog(dir, check)
      val winners = (1L to 2L * n).map { v =>
        val viaA = store.read(log.versionFile(v))
        val viaB = check.read(checkLog.versionFile(v))
        assert(viaA == viaB, s"version $v bytes differ across independent reads")
        val cis = checkLog.actionsAt(v).collect { case ci: CommitInfo => ci }
        assert(cis.size == 1, s"version $v has ${cis.size} commitInfo actions")
        assert(cis.head.operation == "SOAK")
        cis.head.operationParameters("writer")
      }
      assert(winners.count(_ == "A") == n && winners.count(_ == "B") == n,
        s"winner split: ${winners.groupBy(identity).view.mapValues(_.size).toMap}")
      // per-writer sequence numbers land exactly once, in order
      Seq("A", "B").foreach { w =>
        val seqs = (1L to 2L * n).flatMap { v =>
          val ci = checkLog.actionsAt(v).collectFirst { case c: CommitInfo => c }.get
          if (ci.operationParameters("writer") == w)
            Some(ci.operationParameters("seq").toInt)
          else None
        }
        assert(seqs == (0 until n), s"writer $w seq order broken: ${seqs.take(20)}...")
      }
      // the folded snapshot is whole and final
      assert(log.snapshot().version == 2L * n)
    }

    it("ambiguous GETs (SDK read timeouts) are re-issued, not surfaced") {
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-amb-get")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      // a GET is idempotent: a timed-out read says nothing about the
      // object — the store must simply read again
      client.ambiguousNextGets(2)
      assert(log.actionsAt(0L).collect { case ci: CommitInfo => ci.operation }
        == Seq("CREATE TABLE"))
      // throttled GETs back off and retry the same way
      client.throttleNextGets(2)
      assert(log.versions() == Seq(0L) ||
        log.actionsAt(0L).nonEmpty) // reads keep working under GET throttle
      // the read-back RECOVERY path itself survives a blip on its GET:
      // ambiguous put (landed) + ambiguous get during recovery
      client.ambiguousNextPut(land = true)
      client.ambiguousNextGets(1)
      log.commit(1L, Seq(CommitInfo(1L, "WRITE")))
      assert(log.versions() == Seq(0L, 1L))
      // exhaustion stays loud: more ambiguous reads than attempts fails
      client.ambiguousNextGets(1000)
      intercept[ObjectStore.AmbiguousOutcomeException] {
        store.read(log.versionFile(0L)); ()
      }
      client.ambiguousNextGets(0)
      assert(log.versions() == Seq(0L, 1L))
    }

    it("randomized fault storm: throttles + ambiguous outcomes mid-race never break the chain") {
      // 4 writers race 15 commits each while a chaos thread arms throttle
      // and ambiguous-outcome faults on a fixed schedule — under every
      // interleaving the conditional put plus read-back recovery must keep
      // the chain contiguous with exactly one body per version and every
      // writer credited exactly its own wins (deterministic seed)
      val client = new LocalObjectStoreClient
      val store = new ObjectStoreLogStore(client)
      val dir = tmpTableDir("ls-obj-storm")
      val log = new GraftLog(dir, store)
      log.commit(0L, Seq(Metadata(schemaJson), CommitInfo(0L, "CREATE TABLE")))
      val n = 15
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      // the storm arms a BOUNDED number of faults (not "until the writers
      // finish"): an open-ended chaos loop couples fault volume to how slow
      // the box is — under full-suite parallel load the writers back off,
      // the storm keeps re-arming against them, and the liveness budget
      // becomes a coin flip. 600 arms × ~1 ms is a dense storm over the
      // contended early phase whose TOTAL backoff cost is fixed, so the
      // writers always drain it and finish, loaded box or not.
      val maxArms = 600
      val chaos = new Thread(() => {
        val rnd = new scala.util.Random(1414)
        var arms = 0
        while (!stop.get() && arms < maxArms) {
          rnd.nextInt(3) match {
            case 0 => client.throttleNextPuts(1 + rnd.nextInt(2))
            case 1 => client.ambiguousNextPut(land = true)
            case 2 => client.ambiguousNextPut(land = false)
          }
          arms += 1
          Thread.sleep(1)
        }
        client.throttleNextPuts(0)
      })
      chaos.start()
      val died = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writers = (1 to 4).map { w =>
        new Thread(() => {
          var committed = 0
          var guess = 1L
          while (committed < n) {
            val v = math.max(log.latestVersion() + 1, guess)
            try {
              log.commit(v, Seq(CommitInfo(System.currentTimeMillis(), "STORM",
                operationParameters = Map("writer" -> w.toString))))
              committed += 1
              guess = v + 1
            } catch {
              case _: CommitConflictException => guess = v + 1
              case _: ObjectStore.ThrottledException => () // backoff exhausted: retry same v
              case _: ObjectStore.AmbiguousOutcomeException =>
                // disambiguation retries exhausted mid-storm: the put's
                // outcome is genuinely unknown and the store surfaces it
                // loudly BY DESIGN (the exhaustion test above pins that).
                // A real driver resolves it the only correct way — read the
                // version back and check whether OUR body landed; un-landed
                // (or unreadable: the chain may not have reached v) retries
                // the same version. Without this the writer thread dies,
                // its commits are lost, and the head assert misreports an
                // injected-fault pile-up as a broken chain.
                val landed =
                  try log.actionsAt(v).collectFirst { case ci: CommitInfo => ci }
                    .exists(_.operationParameters.get("writer").contains(w.toString))
                  catch { case _: Exception => false }
                if (landed) { committed += 1; guess = v + 1 }
            }
          }
        })
      }
      // any OTHER uncaught failure must be NAMED, never laundered into the
      // lost-commits assertion below
      writers.foreach(_.setUncaughtExceptionHandler((_, e) => { died.add(e); () }))
      writers.foreach(_.start())
      try joinAllOrFail(writers, 120000)
      finally { stop.set(true); chaos.join(10000) }
      assert(died.isEmpty, s"writer thread died: ${died.peek()}")
      val vs = log.versions()
      assert(vs == (0L to vs.last), s"non-contiguous chain: $vs")
      assert(vs.last >= 4L * n, s"writers lost commits: head ${vs.last}")
      (1L to vs.last).foreach { v =>
        val cis = log.actionsAt(v).collect { case ci: CommitInfo => ci }
        assert(cis.size == 1, s"version $v has ${cis.size} commit bodies")
      }
      val wins = (1L to vs.last).flatMap(v => log.actionsAt(v)
        .collectFirst { case ci: CommitInfo => ci.operationParameters("writer") })
      (1 to 4).foreach(w =>
        assert(wins.count(_ == w.toString) == n, s"writer $w win count off"))
    }

    it("scheme registry: a registered conditional-put client claims its scheme from Hadoop") {
      val client = new LocalObjectStoreClient
      LogStore.registerObjectStoreScheme("fauxobj", client)
      try {
        val s = LogStore.forPath("fauxobj://bucket/t/_graft_log")
        assert(s.isInstanceOf[ObjectStoreLogStore])
        assert(s.asInstanceOf[ObjectStoreLogStore].client eq client)
      } finally LogStore.unregisterObjectStoreScheme("fauxobj")
      assert(LogStore.forPath("fauxobj://bucket/t/_graft_log") eq LogStore.Hadoop)
    }
  }

  describe("LogStore.forPath routing") {
    it("longest registered prefix wins; unregistered paths get POSIX") {
      val a = new InMemoryLogStore
      val b = new InMemoryLogStore
      LogStore.register("/tmp/ls-route", a)
      LogStore.register("/tmp/ls-route/inner", b)
      try {
        assert(LogStore.forPath("/tmp/ls-route/t1") eq a)
        assert(LogStore.forPath("/tmp/ls-route/inner/t2") eq b)
        // prefix match is path-segment-wise, not string-wise
        assert(LogStore.forPath("/tmp/ls-routez") eq LogStore.Posix)
      } finally {
        LogStore.unregister("/tmp/ls-route")
        LogStore.unregister("/tmp/ls-route/inner")
      }
    }
  }
}
