package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import org.scalatest.funspec.AnyFunSpec

import graft.tables._

/** Cross-process optimistic-concurrency proof: two REAL JVMs (not threads —
  * separate processes, separate page caches and file handles) race commits
  * into one table through `graft.tools.OccRace`. The claim protocol must
  * give every version exactly one winner and leave no torn or unparseable
  * log file.
  */
class OccRaceSpec extends AnyFunSpec {

  /** The same two-JVM commit race against a chosen [[LogStore]]: the parent
    * registers the store for the table dir; the children are pointed at it
    * through the boot system property [[LogStore.forPath]] honors.
    */
  private def raceAgainst(storeName: Option[String],
      parquetCkpt: Boolean = false): Unit = {
    val dir = Files.createTempDirectory("occ-race").resolve("t").toString
    Files.createDirectories(Paths.get(dir))
    storeName.foreach(_ => LogStore.register(dir, LogStore.ConditionalPut))
    try {
    val log = new GraftLog(dir)
    storeName.foreach(_ => assert(log.store eq LogStore.ConditionalPut))
    val props =
      if (parquetCkpt) Map(GraftLog.CheckpointFormatProperty -> "parquet")
      else Map.empty[String, String]
    val proto: Seq[Action] =
      if (parquetCkpt)
        Seq(Protocol(1, 1, Seq("parquetCheckpoint"), Seq("parquetCheckpoint")))
      else Nil
    log.commit(0L, Seq[Action](
      Metadata("""{"type":"struct","fields":[]}""", Nil, props)) ++ proto :+
      CommitInfo(System.currentTimeMillis(), "CREATE TABLE"))

    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val n = 30
    val storeProps = storeName.toSeq
      .map(_ => s"-Dgraft.logstore.conditionalPut.prefixes=$dir")
    def spawn(id: String): Process =
      new ProcessBuilder((Seq(javaBin) ++ storeProps ++
        Seq("-cp", cp, "graft.tools.OccRace", dir, id, n.toString)): _*)
        .inheritIO().start()
    val a = spawn("A")
    val b = spawn("B")
    assert(a.waitFor(120, TimeUnit.SECONDS), "writer A did not finish")
    assert(b.waitFor(120, TimeUnit.SECONDS), "writer B did not finish")
    assert(a.exitValue() == 0 && b.exitValue() == 0,
      s"writer exit codes: A=${a.exitValue()} B=${b.exitValue()}")

    // contiguous version chain: no skipped or double-claimed version numbers
    assert(log.versions() == (0L to 2L * n), s"non-contiguous log: ${log.versions()}")
    // every raced version parses cleanly and carries EXACTLY ONE commitInfo
    // (a torn/merged write would produce zero or two)
    val winners = (1L to 2L * n).map { v =>
      val cis = log.actionsAt(v).collect { case ci: CommitInfo => ci }
      assert(cis.size == 1, s"version $v has ${cis.size} commitInfo actions")
      assert(cis.head.operation == "OCCRACE")
      cis.head.operationParameters("writer")
    }
    // both writers landed all their commits — none lost or double-counted
    assert(winners.count(_ == "A") == n && winners.count(_ == "B") == n,
      s"winner split: ${winners.groupBy(identity).view.mapValues(_.size).toMap}")
    // each writer's own sequence numbers appear exactly once, in order per
    // writer (a writer only advances seq after a confirmed win)
    Seq("A", "B").foreach { w =>
      val seqs = (1L to 2L * n).flatMap { v =>
        val ci = log.actionsAt(v).collectFirst { case c: CommitInfo => c }.get
        if (ci.operationParameters("writer") == w) Some(ci.operationParameters("seq").toInt)
        else None
      }
      assert(seqs == (0 until n), s"writer $w seq order broken: $seqs")
    }
    if (parquetCkpt) {
      // auto-checkpoints fired MID-RACE from both JVMs (every 10th
      // version) in the parquet layout: head JSON carries no adds, the
      // dir sidecar exists (first-writer-wins publication — concurrent
      // checkpointers never expose a missing-file-actions window), and
      // the fold through the newest checkpoint replays the full race
      val ckpts = log.checkpointVersions()
      assert(ckpts.nonEmpty, "no auto-checkpoint fired during the race")
      ckpts.foreach { cv =>
        assert(graft.tables.Fs.isDirectory(log.checkpointParquetDir(cv)),
          s"checkpoint $cv has no parquet dir sidecar")
        val head = graft.tables.Fs.readLines(log.checkpointFile(cv))
        assert(!head.exists(_.startsWith("{\"add\"")),
          s"checkpoint $cv head JSON must carry no adds")
      }
      assert(log.snapshot().version == 2L * n)
    }
    } finally storeName.foreach(_ => LogStore.unregister(dir))
  }

  it("two JVMs racing commits: one winner per version, contiguous log, no torn files") {
    raceAgainst(None)
  }

  it("the same two-JVM race holds on the conditional-put store (object-store claim shape)") {
    raceAgainst(Some("conditional-put"))
  }

  it("conditional-put + parquet checkpoints: racing writers auto-checkpoint safely") {
    raceAgainst(Some("conditional-put"), parquetCkpt = true)
  }
}
