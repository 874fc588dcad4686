package graft.tools

import java.nio.file.{Files, Paths}

import graft.tables.{CommitConflictException, CommitInfo, GraftLog}

/** Cross-process OCC race driver (test-harness main, no Spark): commits `n`
  * marker versions to the table at `path`, retrying on lost races. Used by
  * `OccRaceSpec` to prove the version-claim protocol (`GraftLog.commit`'s
  * hard-link claim, `GraftLog.scala:169-200`) across REAL process
  * boundaries — the in-JVM races (OccGate specs) cannot exercise two
  * independent filesystems views / page caches the way two JVMs do.
  *
  * Protocol: announce readiness with a `_race_ready_<id>` marker, wait
  * (bounded) for a second racer so the commit loops actually overlap, then
  * race: read latest, try latest+1, on [[CommitConflictException]] re-read
  * and retry. Exits 0 after `n` wins.
  */
object OccRace {
  def main(args: Array[String]): Unit = {
    val Array(path, writerId, nStr) = args
    val n = nStr.toInt
    val log = new GraftLog(path)

    // start barrier: don't begin committing until a second racer is present
    // (bounded wait — a solo run still terminates)
    Files.createFile(Paths.get(path, s"_race_ready_$writerId"))
    val deadline = System.currentTimeMillis() + 10000
    def otherPresent(): Boolean = {
      val s = Files.list(Paths.get(path))
      try {
        val it = s.iterator()
        var found = false
        while (it.hasNext && !found) {
          val name = it.next().getFileName.toString
          found = name.startsWith("_race_ready_") && name != s"_race_ready_$writerId"
        }
        found
      } finally s.close()
    }
    while (!otherPresent() && System.currentTimeMillis() < deadline)
      Thread.sleep(5)

    var committed = 0
    while (committed < n) {
      val v = log.latestVersion() + 1
      try {
        log.commit(v, Seq(CommitInfo(System.currentTimeMillis(), "OCCRACE",
          operationParameters = Map("writer" -> writerId, "seq" -> committed.toString))))
        committed += 1
      } catch { case _: CommitConflictException => () }
    }
  }
}
