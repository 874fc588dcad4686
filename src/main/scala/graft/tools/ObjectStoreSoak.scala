package graft.tools

import java.nio.file.{Files, Paths}

import graft.tables.{CommitConflictException, CommitInfo, GraftLog,
  LocalObjectStoreClient, ObjectStoreLogStore}

/** Cross-process soak driver for the conditional-put object store
  * (test-harness main, no Spark): commits `n` marker versions through its
  * OWN [[ObjectStoreLogStore]]+[[LocalObjectStoreClient]] over a shared
  * directory while ARMING A RANDOM FAULT before every claim — throttles,
  * ambiguous puts (landed and lost), ambiguous/throttled GETs. Two of
  * these JVMs against one table exercise the retry + read-back-recovery
  * composition under sustained contention, not just the per-primitive
  * fault batteries: every claim races a real competitor AND a fault at
  * once. Used by `LogStoreSpec`'s soak case.
  *
  * Exits 0 after `n` wins; any unrecovered store error escapes as a
  * nonzero exit the parent asserts on.
  */
object ObjectStoreSoak {
  def main(args: Array[String]): Unit = {
    val Array(path, writerId, nStr, seedStr) = args
    val n = nStr.toInt
    val client = new LocalObjectStoreClient
    // generous attempt budget: a soak arms faults relentlessly, and an
    // exhausted retry here would be the TEST harness giving up, not the
    // protocol failing
    val store = new ObjectStoreLogStore(client, maxAttempts = 10, backoffMillis = 1L)
    val log = new GraftLog(path, store)
    val rnd = new scala.util.Random(seedStr.toLong)

    // start barrier (same shape as OccRace): overlap the commit loops
    Files.createFile(Paths.get(path, s"_soak_ready_$writerId"))
    val deadline = System.currentTimeMillis() + 10000
    def otherPresent(): Boolean = {
      val s = Files.list(Paths.get(path))
      try {
        val it = s.iterator()
        var found = false
        while (it.hasNext && !found) {
          val name = it.next().getFileName.toString
          found = name.startsWith("_soak_ready_") && name != s"_soak_ready_$writerId"
        }
        found
      } finally s.close()
    }
    while (!otherPresent() && System.currentTimeMillis() < deadline)
      Thread.sleep(5)

    var committed = 0
    while (committed < n) {
      // arm one randomized fault against our own client before the claim
      rnd.nextInt(6) match {
        case 0 => client.throttleNextPuts(1 + rnd.nextInt(2))
        case 1 => client.ambiguousNextPut(land = true)
        case 2 => client.ambiguousNextPut(land = false)
        case 3 => client.ambiguousNextGets(1 + rnd.nextInt(2))
        case 4 => client.throttleNextGets(1)
        case _ => () // fault-free claim: the common case stays exercised
      }
      val v = log.latestVersion() + 1
      try {
        log.commit(v, Seq(CommitInfo(System.currentTimeMillis(), "SOAK",
          operationParameters = Map("writer" -> writerId, "seq" -> committed.toString))))
        committed += 1
      } catch { case _: CommitConflictException => () }
    }
  }
}
