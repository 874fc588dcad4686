package graft

import org.scalatest.funspec.AnyFunSpec

import graft.tables._

class FileSkippingSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  /** 24 rows split into 6 files of 4 consecutive ids each. */
  private def rangedTable(prefix: String): GraftTable = {
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4")
    try {
      GraftTable.create(spark, tmpTableDir(prefix),
        (1 to 24).map(i => (i, s"n$i", i * 1.5)).toDF("id", "name", "amount")
          .orderBy("id").coalesce(1))
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }

  private def survivors(t: GraftTable, cond: String): Int = {
    val cls = FileSkipping.classify(spark, t.toDF, cond)
    FileSkipping.filesMatching(t.snapshot, cls.all).size
  }

  it("skips files outside the predicate's min/max range") {
    val t = rangedTable("fs-range")
    assert(t.snapshot.numFiles == 6)
    assert(survivors(t, "id = 5") == 1)
    assert(survivors(t, "id >= 10 AND id <= 12") == 1)
    assert(survivors(t, "id > 20") == 1)
    assert(survivors(t, "id <= 4") == 1)
    assert(survivors(t, "id >= 5 AND id <= 13") == 3)
  }

  it("contradictory ranges select zero files") {
    val t = rangedTable("fs-contra")
    assert(survivors(t, "id <= 10 AND id >= 12") == 0)
    assert(survivors(t, "id = 3 AND id = 17") == 0)
  }

  it("string and double stats prune too") {
    val t = rangedTable("fs-types")
    assert(survivors(t, "amount > 30.0") == 1)  // only ids 21..24 (31.5..36); 17..20 maxes at exactly 30.0
    assert(survivors(t, "amount >= 30.0") == 2) // inclusive bound re-admits the 17..20 file
    assert(survivors(t, "name = 'zzz'") <= 6)  // strings: conservative but valid
  }

  it("unknown predicates and unresolved columns never prune") {
    val t = rangedTable("fs-unknown")
    assert(survivors(t, "id % 2 = 0") == 6)      // arithmetic: not prunable
    val cls = FileSkipping.classify(spark, t.toDF, "bogus = 1 AND id <= 4")
    assert(cls.unresolvedColumns == Seq("bogus"))
    // the resolved conjunct still prunes
    assert(FileSkipping.filesMatching(t.snapshot, cls.all).size == 1)
  }

  it("partition-value pruning works without row-group stats") {
    val df = Seq((1, "US"), (2, "DE"), (3, "FR")).toDF("id", "country")
    val t = GraftTable.create(spark, tmpTableDir("fs-part"), df, partitionColumns = Seq("country"))
    assert(survivors(t, "country = 'US'") == 1)
    assert(survivors(t, "country IN ('US', 'DE')") == 2)
    assert(survivors(t, "country = 'JP'") == 0)
  }

  it("IN, IsNull and IsNotNull are handled") {
    val t = rangedTable("fs-in")
    assert(survivors(t, "id IN (2, 3)") == 1)
    assert(survivors(t, "id IN (2, 23)") == 2)
    assert(survivors(t, "id IS NULL") == 0)     // nullCount = 0 everywhere
    assert(survivors(t, "id IS NOT NULL") == 6)
  }

  it("OPTIMIZE ZORDER clusters both dimensions for skipping at once") {
    // two INDEPENDENT dimensions (y is a bit-reversal permutation of x, so
    // sorting by either leaves the other scattered), written scattered:
    // every file's min/max spans ~the whole range on both — nothing skips
    def rev(x: Int): Int = Integer.reverse(x) >>> (32 - 12) // 12-bit reversal
    val rows = (0 until 4096).map(i => (i, rev(i)))
    val t = GraftTable.create(spark, tmpTableDir("zorder"),
      rows.toDF("x", "y").repartition(8))
    assert(survivors(t, "x >= 0 AND x <= 255") == 8, "expected no skipping before zorder")
    assert(survivors(t, "y >= 0 AND y <= 255") == 8)

    val v = graft.operators.TableOps.zorder(t, Seq("x", "y"), numFiles = Some(8))
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.version == v)
    assert(t2.snapshot.files.size == 8)
    // the rewrite is layout-only: same rows, OPTIMIZE commit
    assert(t2.toDF.collect().map(r => (r.getInt(0), r.getInt(1))).toSet == rows.toSet)
    assert(t2.history().head._2.operation == "OPTIMIZE")
    // a narrow range on EITHER dimension now skips files. Exact counts from
    // the bit interleave (x bit i at z position 2i, y at 2i+1; 8 files ≈ the
    // top 3 z bits = y7 x7 y6): x ≤ 255 fixes x7=0 → 4 of 8 z-regions (+1
    // boundary straddle); y ≤ 255 fixes y7=y6=0 → 2 of 8 (+1). Without
    // clustering BOTH ranges scanned all 8.
    val xScan = survivors(t2, "x >= 0 AND x <= 255")
    val yScan = survivors(t2, "y >= 0 AND y <= 255")
    assert(xScan <= 5, s"x-range scanned $xScan of 8 files after zorder")
    assert(yScan <= 3, s"y-range scanned $yScan of 8 files after zorder")

    // unsupported column type fails loudly
    val ts = GraftTable.create(spark, tmpTableDir("zorder_str"),
      Seq((1, "a")).toDF("id", "name"))
    intercept[IllegalArgumentException] {
      graft.operators.TableOps.zorder(ts, Seq("name"))
    }
  }

  it("zorder on a hive-partitioned table keeps partition dirs and bounded file counts") {
    // range key leads with the partition column, so each output task holds
    // contiguous partition values — the writer's per-value split must not
    // shatter the clustering into (numFiles x partitions) tiny files
    def rev(x: Int): Int = Integer.reverse(x) >>> (32 - 10)
    val rows = (0 until 1024).map(i => (i, rev(i), i % 4))
    val t = GraftTable.create(spark, tmpTableDir("zorder_part"),
      rows.toDF("x", "y", "p").repartition(6), partitionColumns = Seq("p"))
    graft.operators.TableOps.zorder(t, Seq("x", "y"), numFiles = Some(8))
    val t2 = GraftTable.forPath(spark, t.path)
    assert(t2.toDF.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      == rows.toSet)
    // each file still lives in exactly one partition dir, and the total file
    // count stays near numFiles (+ at most one straddle per task boundary)
    val files = t2.snapshot.files
    assert(files.forall(_.partitionValues.contains("p")))
    assert(files.size <= 8 + 4, s"partitioned zorder shattered into ${files.size} files")
  }
}
