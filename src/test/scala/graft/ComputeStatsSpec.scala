package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables._

/** ANALYZE (TableOps.computeStats): backfills footer stats for bare
  * foreign AddFiles in a metadata-only commit; idempotent; backfilled
  * files participate in min/max skipping.
  */
class ComputeStatsSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** Table of ids 0..9 plus a foreign-committed file of ids 100..109
    * whose AddFile carries no stats.
    */
  private def tableWithForeignFile(): GraftTable = {
    val dir = tmpTableDir("cstats")
    val t = GraftTable.create(spark,
      dir, (0L until 10L).toDF("id").coalesce(1))
    val stage = java.nio.file.Files.createTempDirectory("cstats_stage").toString
    (100L until 110L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val destName = "foreign-" + part.getName
    java.nio.file.Files.copy(part.toPath, java.nio.file.Paths.get(dir, destName))
    t.log.commit(t.snapshot.version + 1, Seq(
      AddFile(path = destName, size = part.length()),
      CommitInfo(timestamp = System.currentTimeMillis(), operation = "WRITE")))
    GraftTable.forPath(spark, dir)
  }

  it("backfills exactly the stat-less files, in a metadata-only commit") {
    val t = tableWithForeignFile()
    val vBefore = t.snapshot.version
    assert(t.snapshot.files.count(f => GraftLog.parseStats(f.stats).isEmpty) == 1)
    assert(TableOps.computeStats(t) == 1)
    val snap = t.snapshot
    assert(snap.version == vBefore + 1)
    assert(snap.files.forall(f => GraftLog.parseStats(f.stats).isDefined))
    // data files untouched: the foreign file's rows still read back
    assert(t.toDF.count() == 20)
    val foreign = snap.files.find(_.path.startsWith("foreign-")).get
    val st = GraftLog.parseStats(foreign.stats).get
    assert(st.numRecords == 10)
    assert(st.minValues("id") == "100" && st.maxValues("id") == "109")
  }

  it("is idempotent — a second call commits nothing") {
    val t = tableWithForeignFile()
    assert(TableOps.computeStats(t) == 1)
    val v = t.snapshot.version
    assert(TableOps.computeStats(t) == 0)
    assert(t.snapshot.version == v)
  }

  it("lets backfilled files participate in min/max skipping") {
    val t = tableWithForeignFile()
    def matching(cond: String): Int = {
      val cls = FileSkipping.classify(spark, t.toDF, cond)
      FileSkipping.filesMatching(t.snapshot, cls.all,
        Some(BloomIndex.ProbeContext(spark, t.path))).size
    }
    // before: the stat-less foreign file can never be pruned
    assert(matching("id >= 1000") == 1)
    TableOps.computeStats(t)
    assert(matching("id >= 1000") == 0)
    assert(matching("id >= 100") == 1) // only the foreign file
    assert(matching("id <= 9") == 1) // only the graft-written file
  }
}
