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

  it("honors graft.dataSkippingStatsColumns when backfilling") {
    val t = tableWithForeignFile()
    t.setProperties(Map(ParquetStats.StatsColumnsProperty -> "id"))
    // the foreign file has columns (id); selecting 'id' keeps it indexed —
    // now point the property at a column that EXISTS but is not 'id'
    assert(TableOps.computeStats(GraftTable.forPath(spark, t.path)) == 1)
    val foreign = t.snapshot.files.find(_.path.startsWith("foreign-")).get
    val st = GraftLog.parseStats(foreign.stats).get
    assert(st.minValues("id") == "100")
    // a property naming a nonexistent column fails AT SET TIME, loudly —
    // not at the next write, where the typo would read as vanished stats
    val t2 = tableWithForeignFile()
    val e = intercept[IllegalArgumentException] {
      t2.setProperties(Map(ParquetStats.StatsColumnsProperty -> "nope"))
    }
    assert(e.getMessage.contains("does not resolve"), e.getMessage)
  }

  it("foreign string stats are loose bounds: skipping uses them, answers never do") {
    // a foreign writer with parquet.statistics.truncate.length stores
    // string min/max that are only BOUNDS (8-byte prefix / its bumped
    // successor) — no footer marker says so. The write option reaches
    // parquet-mr through newHadoopConfWithOptions, no global conf touched.
    val dir = tmpTableDir("cstats-trunc")
    val trueMax = "zzzzzzzzzz_true_max"
    Seq(trueMax, "aaaaaaaaaa_true_min").toDF("s").coalesce(1)
      .write.option("parquet.statistics.truncate.length", "8")
      .mode("overwrite").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    val st = GraftLog.parseStats(t.snapshot.files.head.stats).get
    assert(!st.tightBounds) // CONVERT stamps foreign stats non-tight
    // the footer max really is a truncated bound, not a value
    assert(st.maxValues("s") != trueMax, s"expected truncated max, got ${st.maxValues("s")}")
    assert(st.maxValues("s").length <= 8)
    // metadata-only max must BAIL to a scan (answering from the bound
    // would return 'zzzzzzzz{' instead of the real max)...
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val agg = spark.read.format("graft").load(dir).agg(max(col("s")).as("mx"))
    assert(agg.queryExecution.optimizedPlan.collectFirst {
      case l: LocalRelation => l }.isEmpty,
      s"string max over non-tight stats must not fold:\n${agg.queryExecution.optimizedPlan}")
    assert(agg.first().getString(0) == trueMax)
    // ...while COUNT (footer row counts are always exact) still folds
    val cnt = spark.read.format("graft").load(dir).agg(count(lit(1)).as("c"))
    assert(cnt.queryExecution.optimizedPlan.collectFirst {
      case l: LocalRelation => l }.nonEmpty)
    // and skipping with the loose bounds stays CORRECT: the file holding
    // the true max survives an equality on it (the band only widened)
    val cls = FileSkipping.classify(spark, t.toDF, s"s = '$trueMax'")
    assert(FileSkipping.filesMatching(t.snapshot, cls.all, None).size == 1)
  }

  it("re-stamps pre-tightBounds-field stats conservatively non-tight") {
    // a log written before the tightBounds field existed reads back TIGHT
    // by default, even when the stats were CONVERT-harvested from foreign
    // (possibly truncated) footers — the log can't tell after the fact, so
    // COMPUTE STATS re-harvests every absent-field file and stamps it
    // non-tight explicitly
    val dir = tmpTableDir("cstats-legacy")
    val t = GraftTable.create(spark, dir, (0L until 10L).toDF("id").coalesce(1))
    val f = t.snapshot.files.head
    assert(GraftLog.statsTightBoundsExplicit(f.stats)) // current build: explicit
    val legacy = f.stats.replace(",\"tightBounds\":true", "")
      .replace("\"tightBounds\":true,", "")
    assert(!GraftLog.statsTightBoundsExplicit(legacy), legacy)
    assert(GraftLog.parseStats(legacy).get.tightBounds) // legacy default
    t.log.commit(t.snapshot.version + 1,
      Seq(f.copy(stats = legacy),
        CommitInfo(System.currentTimeMillis(), "WRITE")))
    val t2 = GraftTable.forPath(spark, dir)
    assert(TableOps.computeStats(t2) == 1)
    val after = GraftLog.parseStats(t2.snapshot.files.head.stats).get
    assert(GraftLog.statsTightBoundsExplicit(t2.snapshot.files.head.stats))
    assert(!after.tightBounds) // conservative: decline metadata-only answers
    assert(after.numRecords == 10) // re-harvest kept real footer stats
    assert(TableOps.computeStats(GraftTable.forPath(spark, dir)) == 0)
  }

  it("the re-stamp carries bloom references — the index survives, the GC spares it") {
    // bloom sidecars predate the tightBounds field: a pre-field bloom table
    // is exactly what the re-stamp selects, and the parquet footer knows
    // nothing of the bloom — dropping the reference would blind the probe
    // AND let the sidecar-orphan GC collect the index permanently
    val dir = tmpTableDir("cstats-bloom")
    val t = GraftTable.create(spark, dir,
      (0L until 256L).map(i => (i, s"v$i")).toDF("id", "name").coalesce(1),
      properties = Map(graft.tables.BloomIndex.ColumnsProperty -> "id"))
    val f = t.snapshot.files.head
    val sidecar = GraftLog.parseStats(f.stats).get.bloomSidecar
    assert(sidecar.isDefined, "fixture needs a bloom sidecar")
    val legacy = f.stats.replace(",\"tightBounds\":true", "")
      .replace("\"tightBounds\":true,", "")
    t.log.commit(t.snapshot.version + 1,
      Seq(f.copy(stats = legacy),
        CommitInfo(System.currentTimeMillis(), "WRITE")))
    val t2 = GraftTable.forPath(spark, dir)
    assert(TableOps.computeStats(t2) == 1)
    val after = GraftLog.parseStats(
      GraftTable.forPath(spark, dir).snapshot.files.head.stats).get
    assert(!after.tightBounds)
    assert(after.bloomSidecar == sidecar,
      s"bloom sidecar reference lost: ${after.bloomSidecar} vs $sidecar")
    assert(after.bloom == GraftLog.parseStats(f.stats).get.bloom)
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
