package graft

import org.scalatest.funspec.AnyFunSpec

import graft.tables.{AddCDCFile, GraftTable, RemoveFile}

/** `partitionOverwriteMode=dynamic` (Delta's writer option + Spark's session
  * conf): `mode("overwrite")` replaces ONLY the partitions the incoming data
  * lands in. Removes are whole files of the touched partitions, so with CDF
  * on the change content is synthesized at read time like any overwrite.
  */
class DynamicOverwriteSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def mkPartitioned(prefix: String, cdf: Boolean = false): (String, GraftTable) = {
    val dir = tmpTableDir(prefix)
    val props = if (cdf) Map("graft.enableChangeDataFeed" -> "true")
                else Map.empty[String, String]
    val t = GraftTable.create(spark, dir,
      (0 until 12).map(i => (i, i % 3, s"n$i")).toDF("id", "k", "name"),
      partitionColumns = Seq("k"), properties = props)
    (dir, t)
  }

  it("replaces only the partitions present in the incoming data") {
    val (dir, t) = mkPartitioned("dyn-basic")
    val filesBefore = t.snapshot.files
    Seq((100, 0, "x"), (102, 2, "z")).toDF("id", "k", "name")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    val after = GraftTable.forPath(spark, dir)
    val got = after.toDF.select("id", "k").as[(Int, Int)].collect().toSet
    // k=0 and k=2 replaced wholesale; k=1 untouched
    val want = Set((100, 0), (102, 2)) ++
      (0 until 12).filter(_ % 3 == 1).map(i => (i, 1)).toSet
    assert(got == want, s"got $got")
    // the commit removed EXACTLY the touched partitions' files
    val removed = after.log.actionsAt(after.version)
      .collect { case r: RemoveFile => r.path }.toSet
    val wantRemoved = filesBefore
      .filter(f => Set("0", "2").contains(f.partitionValues("k"))).map(_.path).toSet
    assert(removed == wantRemoved)
    // history preserved
    assert(after.toDFAt(after.version - 1).count() == 12)
  }

  it("the session conf form applies when the option is absent; static stays full") {
    val (dir, _) = mkPartitioned("dyn-conf")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((200, 1, "y")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite").save(dir)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val mid = GraftTable.forPath(spark, dir)
    assert(mid.toDF.count() == 9) // k=1 replaced by one row; k=0,2 keep 4 each
    // explicit static option overrides a dynamic session conf: full overwrite
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((300, 0, "w")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "static").save(dir)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
  }

  it("a dynamic SESSION CONF yields to replaceWhere; the explicit option refuses") {
    // the conf is a global default users set for plain file-source tables —
    // Delta lets replaceWhere take precedence over it; only an OPTION-level
    // dynamic request is a contradiction worth refusing
    val (dir, _) = mkPartitioned("dyn-rw")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((500, 1, "rw")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("replaceWhere", "k = 1").save(dir)
      val after = GraftTable.forPath(spark, dir)
      assert(after.toDF.where("k = 1").count() == 1)
      assert(after.toDF.count() == 9) // k=0,2 untouched (4 rows each)
      val e = intercept[IllegalArgumentException] {
        Seq((501, 1, "x")).toDF("id", "k", "name")
          .write.format("graft").mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .option("replaceWhere", "k = 1").save(dir)
      }
      assert(e.getMessage.contains("replaceWhere cannot combine"), e.getMessage)
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  it("two dynamic overwrites sharing one job's task file names stay readable as CDF") {
    // ONE write job reuses its task file name (part-00000-<jobUUID>) in
    // EVERY partition dir; two later dynamic overwrites each remove one of
    // those dirs — the grouped delete-side stamp cannot key both commits
    // by the shared base name and must fall back to per-commit frames
    val dir = tmpTableDir("dyn-basename")
    GraftTable.create(spark, dir,
      (0 until 12).map(i => (i, i % 3, s"n$i")).toDF("id", "k", "name")
        .repartition(1), // one task -> same base name in k=0,1,2
      partitionColumns = Seq("k"),
      properties = Map(graft.tables.GraftLog.CdfProperty -> "true"))
    def replaceK(k: Int, id: Int): Unit =
      Seq((id, k, "r")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(dir)
    replaceK(0, 100) // v1
    replaceK(2, 102) // v2
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, 1, 2).readCDF
    val byTypeV = cdf.groupBy("_change_type", "_commit_version").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byTypeV(("delete", 1L)) == 4L, s"got $byTypeV") // k=0's old rows
    assert(byTypeV(("insert", 1L)) == 1L, s"got $byTypeV")
    assert(byTypeV(("delete", 2L)) == 4L, s"got $byTypeV") // k=2's old rows
    assert(byTypeV(("insert", 2L)) == 1L, s"got $byTypeV")
  }

  it("an unpartitioned table degrades to a full overwrite; refusals are loud") {
    val dir = tmpTableDir("dyn-unpart")
    GraftTable.create(spark, dir, Seq((1, "a"), (2, "b")).toDF("id", "name"))
    Seq((9, "z")).toDF("id", "name")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    // replaceWhere + dynamic fight over what gets replaced — refuse
    val (dir2, _) = mkPartitioned("dyn-rw")
    val e = intercept[IllegalArgumentException] {
      Seq((1, 0, "a")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("replaceWhere", "k = 0").save(dir2)
    }
    assert(e.getMessage.contains("replaceWhere"), e.getMessage)
    val badValue = intercept[IllegalArgumentException] {
      Seq((1, 0, "a")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "sideways").save(dir2)
    }
    assert(badValue.getMessage.contains("static"), badValue.getMessage)
    val wrongMode = intercept[IllegalArgumentException] {
      Seq((1, 0, "a")).toDF("id", "k", "name")
        .write.format("graft").mode("append")
        .option("partitionOverwriteMode", "dynamic").save(dir2)
    }
    assert(wrongMode.getMessage.contains("overwrite"), wrongMode.getMessage)
  }

  it("with CDF on: no change files written; delete+insert synthesized for touched partitions only") {
    val (dir, t) = mkPartitioned("dyn-cdf", cdf = true)
    Seq((100, 0, "x")).toDF("id", "k", "name")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    val after = GraftTable.forPath(spark, dir)
    assert(after.log.actionsAt(after.version)
      .collect { case c: AddCDCFile => c }.isEmpty)
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, after.version, after.version).readCDF
    // deletes: ONLY partition k=0's four prior rows; inserts: the one new row
    assert(cdf.where("_change_type = 'delete'").count() == 4)
    assert(cdf.where("_change_type = 'delete' AND k != 0").count() == 0)
    assert(cdf.where("_change_type = 'insert'").count() == 1)
    assert(cdf.where(s"_commit_version = ${after.version}").count() == 5)
    val _ = t
  }

  it("a change-feed stream sees the dynamic overwrite as touched-partition changes") {
    val (dir, _) = mkPartitioned("dyn-stream", cdf = true)
    val sink = "dyn_sink_" + System.nanoTime()
    val query = spark.readStream.format("graft").load(dir)
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.table(sink).count() == 12) // snapshot batch
      Seq((100, 2, "x")).toDF("id", "k", "name")
        .write.format("graft").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").save(dir)
      query.processAllAvailable()
      val changes = spark.table(sink).where("_commit_version = 1")
        .selectExpr("id", "k", "_change_type").as[(Int, Int, String)].collect().toSet
    // partition k=2 had ids 2,5,8,11
      assert(changes == Set((2, 2, "delete"), (5, 2, "delete"), (8, 2, "delete"),
        (11, 2, "delete"), (100, 2, "insert")), s"got $changes")
    } finally query.stop()
  }

  it("SQL INSERT OVERWRITE: dynamic conf replaces touched partitions; PARTITION spec replaces its region") {
    val _ = SparkSessionTestWrapper.catalogWarehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.dyn")
    spark.sql("DROP TABLE IF EXISTS graft_cat.dyn.t")
    spark.sql("CREATE TABLE graft_cat.dyn.t (id BIGINT, k INT) USING graft PARTITIONED BY (k)")
    spark.sql("INSERT INTO graft_cat.dyn.t SELECT id, CAST(id % 3 AS INT) FROM range(12)")
    // static PARTITION(k=1): only that region is replaced (routes through
    // the replaceWhere engine via the V2 overwrite-by-filter fallback)
    spark.sql("INSERT OVERWRITE graft_cat.dyn.t PARTITION (k = 1) " +
      "SELECT id FROM range(100, 102)")
    val afterStatic = spark.table("graft_cat.dyn.t").select("id", "k")
      .as[(Long, Int)].collect().toSet
    val untouched02 = (0 until 12).filter(i => i % 3 != 1).map(i => (i.toLong, i % 3)).toSet
    assert(afterStatic == untouched02 ++ Set((100L, 1), (101L, 1)), s"got $afterStatic")
    // dynamic session conf: INSERT OVERWRITE (no PARTITION spec) replaces
    // only the partitions the query's rows land in — rewritten to the
    // commit-log dynamic overwrite (OverwritePartitionsDynamic has no
    // V1-write fallback exec)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql("INSERT OVERWRITE graft_cat.dyn.t SELECT id, CAST(2 AS INT) " +
        "FROM range(200, 201)")
    } finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    val afterDyn = spark.table("graft_cat.dyn.t").select("id", "k")
      .as[(Long, Int)].collect().toSet
    val keep01 = afterStatic.filter(_._2 != 2)
    assert(afterDyn == keep01 + ((200L, 2)), s"got $afterDyn")
    // without the conf, INSERT OVERWRITE stays a full overwrite
    spark.sql("INSERT OVERWRITE graft_cat.dyn.t SELECT 300, CAST(0 AS INT)")
    assert(spark.table("graft_cat.dyn.t").count() == 1)
  }

  it("a NULL partition value replaces exactly the null partition") {
    val dir = tmpTableDir("dyn-null")
    val t = GraftTable.create(spark, dir,
      Seq((1, Some(0), "a"), (2, Some(0), "b"), (3, None, "c"), (4, None, "d"))
        .toDF("id", "k", "name"),
      partitionColumns = Seq("k"))
    // incoming data lands ONLY in the null partition
    Seq((9, Option.empty[Int], "z")).toDF("id", "k", "name")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    val got = GraftTable.forPath(spark, dir).toDF
      .select("id", "name").as[(Int, String)].collect().toSet
    // k=0 untouched; the two null-k rows replaced by one
    assert(got == Set((1, "a"), (2, "b"), (9, "z")), s"got $got")
    val _ = t
  }

  it("empty incoming data touches no partitions; schema may evolve by the append rule") {
    val (dir, _) = mkPartitioned("dyn-empty")
    spark.emptyDataset[(Int, Int, String)].toDF("id", "k", "name")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    assert(GraftTable.forPath(spark, dir).toDF.count() == 12) // nothing replaced
    // a new column evolves the schema; non-replaced partitions read it as NULL
    Seq((100, 0, "x", 9.5)).toDF("id", "k", "name", "score")
      .write.format("graft").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").save(dir)
    val after = GraftTable.forPath(spark, dir).toDF
    assert(after.schema.fieldNames.contains("score"))
    assert(after.where("k = 0").count() == 1)
    assert(after.where("k = 1 AND score IS NULL").count() == 4)
  }
}
