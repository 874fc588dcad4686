package graft

import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

import org.scalatest.funspec.AnyFunSpec

import graft.tables.GraftTable

/** Cross-process SEMANTIC OCC proof: pairs of real JVMs (separate page
  * caches, separate `GraftLog` views, separate Spark sessions) interleave
  * real operations against one table through `graft.tools.OccSparkRace`'s
  * file gates. The logical conflict rules must hold across the process
  * boundary: file-disjoint concurrent operations BOTH commit (rebase +
  * retry), while operations whose read set the winner invalidated abort.
  */
class OccSparkRaceSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** The forked test JVM's own module flags (--add-opens...) — the child
    * Spark JVMs need exactly the same set build.sbt injects here.
    */
  private val moduleFlags =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
      .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports"))
      .toSeq

  private def race(dir: String, roleA: String, roleB: String,
      conditionalPut: Boolean = false, objectStore: Boolean = false): (Int, Int) = {
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // route the CHILD JVMs' GraftLogs at the conditional-put store via the
    // boot property LogStore.forPath honors (the parent registers it
    // programmatically before building the table)
    val storeProps =
      if (objectStore) Seq(s"-Dgraft.logstore.objectstore.prefixes=$dir")
      else if (conditionalPut) Seq(s"-Dgraft.logstore.conditionalPut.prefixes=$dir")
      else Nil
    def spawn(role: String): Process =
      new ProcessBuilder(
        (Seq(javaBin) ++ moduleFlags ++ storeProps ++ Seq("-Xmx2g", "-cp", cp,
          "graft.tools.OccSparkRace", dir, role)): _*)
        .inheritIO().start()
    val a = spawn(roleA)
    val b = spawn(roleB)
    assert(a.waitFor(240, TimeUnit.SECONDS), s"$roleA did not finish")
    assert(b.waitFor(240, TimeUnit.SECONDS), s"$roleB did not finish")
    (a.exitValue(), b.exitValue())
  }

  it("two JVMs: partition-disjoint merges BOTH commit (loser rebases)") {
    val dir = tmpTableDir("occ2_disjoint")
    GraftTable.create(spark, dir,
      Seq((1, "a", "US"), (2, "b", "US"), (1, "c", "DE"), (2, "d", "DE"), (9, "e", "FR"))
        .toDF("id", "name", "country"),
      partitionColumns = Seq("country"))

    val (blocked, winner) = race(dir, "merge-blocked:US", "merge-winner:DE")
    assert(winner == 0, "DE merge (winner) failed")
    assert(blocked == 0, "US merge should have rebased and committed, but aborted")

    val t = GraftTable.forPath(spark, dir)
    assert(t.version == 2L, s"expected exactly two merge commits, at ${t.version}")
    val rows = t.toDF.select("id", "name", "country").as[(Int, String, String)]
      .collect().toSet
    assert(rows == Set(
      (1, "merged-US", "US"), (2, "b", "US"),
      (1, "c", "DE"), (2, "winner-DE", "DE"),
      (9, "e", "FR")), s"merged state wrong: $rows")
  }

  it("two JVMs: blind append + concurrent OPTIMIZE BOTH commit") {
    val dir = tmpTableDir("occ2_optimize")
    val t0 = GraftTable.create(spark, dir,
      Seq((1, "a", "US"), (2, "b", "DE")).toDF("id", "name", "country"))
    t0.append(Seq((3, "c", "FR")).toDF("id", "name", "country")) // second file

    val (blocked, winner) = race(dir, "append-blocked", "optimize-winner")
    assert(winner == 0, "OPTIMIZE (winner) failed")
    assert(blocked == 0, "append should have retried past OPTIMIZE, but failed")

    val t = GraftTable.forPath(spark, dir)
    assert(t.version == 3L, s"expected append + optimize commits, at ${t.version}")
    val rows = t.toDF.select("id", "name").as[(Int, String)].collect().toSet
    assert(rows == Set((1, "a"), (2, "b"), (3, "c"),
      (100, "appended"), (101, "appended")), s"post-race state wrong: $rows")
    // the compaction actually took effect: the two original files merged into
    // one, plus whatever the append added
    val compacted = t.log.actionsAt(2L)
    assert(compacted.collectFirst {
      case ci: graft.tables.CommitInfo => ci.operation }.contains("OPTIMIZE"))
  }

  it("two JVMs: merges into the SAME partition still abort the loser") {
    val dir = tmpTableDir("occ2_overlap")
    // ONE file per partition (repartition(1)), so both merges' candidate
    // sets contain the same US file and the read footprints truly overlap —
    // with per-key files, the dynamic key-range pruning would legitimately
    // make them file-disjoint and both would (correctly) commit
    GraftTable.create(spark, dir,
      Seq((1, "a", "US"), (2, "b", "US"), (9, "e", "FR")).toDF("id", "name", "country")
        .repartition(1),
      partitionColumns = Seq("country"))

    val (blocked, winner) = race(dir, "merge-abort:US", "merge-winner:US")
    assert(winner == 0, "US merge (winner) failed")
    assert(blocked == 0,
      "blocked US merge must abort with ConcurrentModificationException (exit 0 from merge-abort role)")

    val t = GraftTable.forPath(spark, dir)
    assert(t.version == 1L, s"only the winner may commit, at ${t.version}")
    val rows = t.toDF.select("id", "name", "country").as[(Int, String, String)]
      .collect().toSet
    // winner updated id=2; the aborted merge left NO partial effects
    assert(rows == Set((1, "a", "US"), (2, "winner-US", "US"), (9, "e", "FR")),
      s"aborted merge leaked effects: $rows")
  }

  it("two JVMs: concurrent identity appends — the loser's stale id range aborts") {
    val dir = tmpTableDir("occ2_identity")
    GraftTable.create(spark, dir,
      Seq((0, "base")).toDF("n", "payload"),
      properties = Map(GraftTable.IdentityPropertyPrefix + "id" -> "1,1"))

    val (blocked, winner) = race(dir, "identity-blocked-abort", "identity-winner")
    assert(winner == 0, "identity winner append failed")
    assert(blocked == 0,
      "blocked identity append must abort (its reserved range collides with the winner's)")

    val t = GraftTable.forPath(spark, dir)
    val ids = t.toDF.select("id").as[Long].collect().sorted
    // base (1) + winner's three (2,3,4); the aborted append leaked nothing
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L), s"identity ids wrong: ${ids.toSeq}")
  }

  it("conditional-put store, two JVMs: disjoint merges BOTH commit; overlapping aborts") {
    import graft.tables.LogStore
    // the SAME semantic race pair as above, but every commit in parent and
    // child JVMs goes through the object-store-shaped conditional-put store
    // — proving the OCC rules use nothing beyond that contract
    val dirA = tmpTableDir("occ2_cput_disjoint")
    LogStore.register(dirA, LogStore.ConditionalPut)
    try {
      GraftTable.create(spark, dirA,
        Seq((1, "a", "US"), (2, "b", "US"), (1, "c", "DE"), (2, "d", "DE"))
          .toDF("id", "name", "country"),
        partitionColumns = Seq("country"))
      val (blocked, winner) = race(dirA, "merge-blocked:US", "merge-winner:DE",
        conditionalPut = true)
      assert(winner == 0 && blocked == 0,
        s"disjoint merges must both commit on conditional-put (blocked=$blocked winner=$winner)")
      val t = GraftTable.forPath(spark, dirA)
      assert(t.version == 2L)
      val rows = t.toDF.select("id", "name", "country").as[(Int, String, String)]
        .collect().toSet
      assert(rows == Set(
        (1, "merged-US", "US"), (2, "b", "US"),
        (1, "c", "DE"), (2, "winner-DE", "DE")), s"merged state wrong: $rows")
    } finally LogStore.unregister(dirA)

    val dirB = tmpTableDir("occ2_cput_overlap")
    LogStore.register(dirB, LogStore.ConditionalPut)
    try {
      GraftTable.create(spark, dirB,
        Seq((1, "a", "US"), (2, "b", "US")).toDF("id", "name", "country")
          .repartition(1),
        partitionColumns = Seq("country"))
      val (blocked, winner) = race(dirB, "merge-abort:US", "merge-winner:US",
        conditionalPut = true)
      assert(winner == 0 && blocked == 0,
        s"overlapping merge must abort the loser on conditional-put (blocked=$blocked winner=$winner)")
      assert(GraftTable.forPath(spark, dirB).version == 1L)
    } finally LogStore.unregister(dirB)
  }

  it("object store, two JVMs: disjoint merges BOTH commit; overlapping aborts") {
    import graft.tables.LogStore
    // the semantic race pair again, but every commit in parent and child
    // JVMs goes through the conditional-put OBJECT-STORE API store — each
    // JVM constructs its OWN client over the shared directory, so the
    // arbitration is genuinely cross-process (crossProcessAtomic=true is
    // the claim this race proves)
    val dirA = tmpTableDir("occ2_obj_disjoint")
    LogStore.register(dirA, LogStore.LocalObjectStore)
    try {
      GraftTable.create(spark, dirA,
        Seq((1, "a", "US"), (2, "b", "US"), (1, "c", "DE"), (2, "d", "DE"))
          .toDF("id", "name", "country"),
        partitionColumns = Seq("country"))
      val (blocked, winner) = race(dirA, "merge-blocked:US", "merge-winner:DE",
        objectStore = true)
      assert(winner == 0 && blocked == 0,
        s"disjoint merges must both commit on the object store (blocked=$blocked winner=$winner)")
      val t = GraftTable.forPath(spark, dirA)
      assert(t.version == 2L)
      val rows = t.toDF.select("id", "name", "country").as[(Int, String, String)]
        .collect().toSet
      assert(rows == Set(
        (1, "merged-US", "US"), (2, "b", "US"),
        (1, "c", "DE"), (2, "winner-DE", "DE")), s"merged state wrong: $rows")
    } finally LogStore.unregister(dirA)

    val dirB = tmpTableDir("occ2_obj_overlap")
    LogStore.register(dirB, LogStore.LocalObjectStore)
    try {
      GraftTable.create(spark, dirB,
        Seq((1, "a", "US"), (2, "b", "US")).toDF("id", "name", "country")
          .repartition(1),
        partitionColumns = Seq("country"))
      val (blocked, winner) = race(dirB, "merge-abort:US", "merge-winner:US",
        objectStore = true)
      assert(winner == 0 && blocked == 0,
        s"overlapping merge must abort the loser on the object store (blocked=$blocked winner=$winner)")
      assert(GraftTable.forPath(spark, dirB).version == 1L)
    } finally LogStore.unregister(dirB)
  }

  it("two JVMs: identity append + OPTIMIZE (no mark change) BOTH commit") {
    val dir = tmpTableDir("occ2_identity_ok")
    val t0 = GraftTable.create(spark, dir,
      Seq((0, "base-a")).toDF("n", "payload"),
      properties = Map(GraftTable.IdentityPropertyPrefix + "id" -> "1,1"))
    t0.append(Seq((1, "base-b")).toDF("n", "payload")) // second file to compact

    val (blocked, winner) = race(dir, "identity-blocked-ok", "optimize-winner")
    assert(winner == 0, "OPTIMIZE (winner) failed")
    assert(blocked == 0,
      "identity append should rebase past a layout-only OPTIMIZE, but failed")

    val t = GraftTable.forPath(spark, dir)
    val ids = t.toDF.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 4L), s"identity ids wrong after rebase: ${ids.toSeq}")
  }
}
