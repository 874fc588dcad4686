package graft

import java.nio.file.Paths

import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables.GraftTable

/** `CREATE OR REPLACE TABLE ... USING graft [AS SELECT]` — the atomic
  * replace (Delta's REPLACE): ONE commit swaps contents + schema +
  * partitioning + properties, history stays time-travelable, CDF carries
  * the full delete/insert row set. Routed through
  * [[graft.catalog.GraftCatalog]]'s `StagingTableCatalog` implementation
  * (so Spark plans the atomic exec, not drop+create) onto
  * [[graft.operators.TableOps.replaceTable]].
  */
class ReplaceTableSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val warehouse: String = SparkSessionTestWrapper.catalogWarehouse

  it("RTAS atomically swaps contents, schema, partitioning and properties") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    spark.sql("CREATE TABLE graft_cat.rt.a " +
      "TBLPROPERTIES('graft.constraint.pos'='id >= 0') AS " +
      "SELECT id, id % 3 AS k FROM range(30)")
    val before = GraftTable.forName(spark, "graft_cat.rt.a").version

    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.a USING graft " +
      "PARTITIONED BY (bucket) TBLPROPERTIES('who'='replaced') AS " +
      "SELECT id * 10 AS v, id % 2 AS bucket FROM range(7)")

    val t = GraftTable.forName(spark, "graft_cat.rt.a")
    // ONE commit on top of the prior history
    assert(t.version == before + 1)
    assert(t.toDF.count() == 7)
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("v", "bucket"))
    assert(t.snapshot.metadata.partitionColumns == Seq("bucket"))
    // properties are REPLACED, not merged: the CHECK constraint is gone,
    // the new property present
    assert(t.snapshot.metadata.properties.get("who").contains("replaced"))
    assert(!t.snapshot.metadata.properties.keys.exists(_.startsWith("graft.constraint.")))
    // prior states stay time-travelable with their own schema
    assert(t.toDFAt(before).count() == 30)
    assert(t.toDFAt(before).schema.fieldNames.toSeq == Seq("id", "k"))
    // a row violating the DROPPED constraint now writes fine
    spark.sql("INSERT INTO graft_cat.rt.a SELECT -5 AS v, 0 AS bucket")
    assert(spark.table("graft_cat.rt.a").count() == 8)
  }

  it("data-less REPLACE TABLE empties to the declared schema; missing target refuses") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    spark.sql("CREATE TABLE graft_cat.rt.b AS SELECT id FROM range(9)")
    spark.sql("REPLACE TABLE graft_cat.rt.b (x INT, y STRING) USING graft")
    val t = GraftTable.forName(spark, "graft_cat.rt.b")
    assert(t.toDF.count() == 0)
    assert(t.snapshot.schema.fieldNames.toSeq == Seq("x", "y"))
    // REPLACE (no OR CREATE) of a missing table fails loudly, creates nothing
    intercept[Throwable] {
      spark.sql("REPLACE TABLE graft_cat.rt.missing (a INT) USING graft")
    }
    assert(!GraftTable.exists(Paths.get(warehouse, "rt", "missing").toString))
    // CREATE OR REPLACE of a missing table CREATES
    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.fresh USING graft AS SELECT id FROM range(4)")
    assert(spark.table("graft_cat.rt.fresh").count() == 4)
  }

  it("a CDF-enabled replace carries every prior row as delete, every new row as insert") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    spark.sql("CREATE TABLE graft_cat.rt.c " +
      "TBLPROPERTIES('graft.enableChangeDataFeed'='true') AS " +
      "SELECT id, concat('n', id) AS name FROM range(6)")
    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.c " +
      "TBLPROPERTIES('graft.enableChangeDataFeed'='true') AS " +
      "SELECT id + 100 AS id, concat('m', id) AS name FROM range(4)")
    val t = GraftTable.forName(spark, "graft_cat.rt.c")
    // the replace commit writes NO _change_data — the delete+insert rows
    // below are synthesized at read time from its remove/add actions
    // (written change rows would be O(old + new) write amplification)
    assert(t.log.actionsAt(t.version)
      .collect { case c: graft.tables.AddCDCFile => c }.isEmpty)
    val cdf = graft.log.ChangeDataFeedHelper(spark, t.path, t.version, t.version).readCDF
    val byType = cdf.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map("delete" -> 6L, "insert" -> 4L))
    // the delete rows are the OLD contents, the insert rows the NEW
    assert(cdf.where("_change_type = 'delete' AND id < 100").count() == 6)
    assert(cdf.where("_change_type = 'insert' AND id >= 100").count() == 4)
    // every row carries the replace commit's version stamp
    assert(cdf.where(s"_commit_version = ${t.version}").count() == 10)
    // CDF OFF in the replaced state: no change rows are written OR read
    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.c AS SELECT id FROM range(3)")
    val t2 = GraftTable.forName(spark, "graft_cat.rt.c")
    assert(t2.log.actionsAt(t2.version)
      .collect { case c: graft.tables.AddCDCFile => c }.isEmpty)
    intercept[IllegalArgumentException] { // "no change data between versions"
      graft.log.ChangeDataFeedHelper(spark, t2.path, t2.version, t2.version).readCDF
    }
  }

  it("CDF of a vacuumed replace fails loudly; above-horizon reads still work") {
    val dir = tmpTableDir("rt-cdf-vac")
    val t = GraftTable.create(spark, dir,
      (1 to 8).map(i => (i, s"n$i")).toDF("id", "name"),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val vReplace = TableOps.replaceTable(t,
      Some(Seq((100, "x"), (101, "y")).toDF("id", "name")),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    // pre-vacuum: the synthesized read works
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, vReplace, vReplace).readCDF
    assert(cdf.where("_change_type = 'delete'").count() == 8)
    assert(cdf.where("_change_type = 'insert'").count() == 2)
    t.append(Seq((102, "z")).toDF("id", "name")) // vReplace + 1
    TableOps.vacuum(t, vReplace)
    // the replaced files are gone — the delete side is not reconstructible;
    // the read refuses loudly instead of answering wrong
    val e = intercept[IllegalStateException] {
      graft.log.ChangeDataFeedHelper(spark, dir, vReplace, vReplace + 1).readCDF.count()
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // above the horizon the feed still reads
    val above = graft.log.ChangeDataFeedHelper(
      spark, dir, vReplace + 1, vReplace + 1).readCDF
    assert(above.where("_change_type = 'insert'").count() == 1)
  }

  it("REPLACE refuses to re-point an external table's LOCATION; same-location replace works") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    val loc = tmpTableDir("rt-ext-loc")
    spark.sql(s"CREATE TABLE graft_cat.rt.ext (id BIGINT) USING graft LOCATION '$loc'")
    spark.sql("INSERT INTO graft_cat.rt.ext SELECT id FROM range(5)")
    // replacing at the SAME declared location is fine and lands at LOCATION
    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.ext USING graft " +
      s"LOCATION '$loc' AS SELECT id * 2 AS d FROM range(3)")
    assert(GraftTable.forPath(spark, loc).toDF.count() == 3)
    assert(spark.table("graft_cat.rt.ext").schema.fieldNames.toSeq == Seq("d"))
    // re-pointing is refused loudly (old data would be silently stranded)
    val other = tmpTableDir("rt-ext-other")
    val e = intercept[Throwable] {
      spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.ext USING graft " +
        s"LOCATION '$other' AS SELECT 1 AS z")
    }
    assert(e.getMessage.contains("cannot re-point"), e.getMessage)
  }

  it("vacuum after replace collects the replaced files; restore-back then refuses loudly") {
    val dir = tmpTableDir("rt-vac")
    val t = GraftTable.create(spark, dir,
      (1 to 12).map(i => (i, s"n$i")).toDF("id", "name").repartition(3))
    val filesBefore = t.snapshot.files.map(_.path)
    assert(filesBefore.size >= 2)
    TableOps.replaceTable(t, Some(Seq((1L, "x")).toDF("k", "v")))
    // the replaced files are tombstoned, physically present until vacuum
    filesBefore.foreach(p => assert(graft.tables.Fs.exists(
      GraftTable.resolveDataPath(dir, p)), s"pre-vacuum file missing: $p"))
    val collected = TableOps.vacuum(t, t.version)
    assert(collected >= filesBefore.size)
    filesBefore.foreach(p => assert(!graft.tables.Fs.exists(
      GraftTable.resolveDataPath(dir, p)), s"vacuum left: $p"))
    // the current state is whole; the pre-replace state is GONE and a
    // restore to it must refuse loudly (the exact shape depends on whether
    // vacuum also truncated the log), never resurrect dangling entries
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    val e = intercept[Exception] { TableOps.restore(t, 0L) }
    assert(Option(e.getMessage).exists(_.nonEmpty), s"silent refusal: $e")
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1) // state untouched
  }

  it("staged intent survives to execution: a raced stageCreate/stageReplace fails loudly") {
    import org.apache.spark.sql.connector.catalog.{Identifier, StagingTableCatalog}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    val cat = spark.sessionState.catalogManager.catalog("graft_cat")
      .asInstanceOf[StagingTableCatalog]
    val schema = StructType(Seq(StructField("id", LongType)))
    val noTransforms = Array.empty[org.apache.spark.sql.connector.expressions.Transform]
    val noProps = new java.util.HashMap[String, String]()

    // staged CREATE, target created concurrently between stage and execute:
    // must fail TableAlreadyExists — NOT silently replace the winner
    val raceC = Identifier.of(Array("rt"), "race_c")
    val stagedC = cat.stageCreate(raceC, schema, noTransforms, noProps)
    spark.sql("CREATE TABLE graft_cat.rt.race_c AS SELECT id FROM range(5)")
    intercept[org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException] {
      stagedC.commitStagedChanges()
    }
    assert(spark.table("graft_cat.rt.race_c").count() == 5) // winner intact

    // staged REPLACE, target dropped concurrently: must fail NoSuchTable —
    // NOT silently create
    spark.sql("CREATE TABLE graft_cat.rt.race_r AS SELECT id FROM range(3)")
    val raceR = Identifier.of(Array("rt"), "race_r")
    val stagedR = cat.stageReplace(raceR, schema, noTransforms, noProps)
    spark.sql("DROP TABLE graft_cat.rt.race_r")
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      stagedR.commitStagedChanges()
    }
    assert(!spark.catalog.tableExists("graft_cat.rt.race_r"))

    // only CREATE OR REPLACE decides from execution-time state: the same
    // race resolves to a create, by design
    spark.sql("CREATE TABLE graft_cat.rt.race_or AS SELECT id FROM range(3)")
    val raceOr = Identifier.of(Array("rt"), "race_or")
    val stagedOr = cat.stageCreateOrReplace(raceOr, schema, noTransforms, noProps)
    spark.sql("DROP TABLE graft_cat.rt.race_or")
    stagedOr.commitStagedChanges()
    assert(spark.table("graft_cat.rt.race_or").count() == 0)
  }

  it("CDF of a replace over a DV-masked table synthesizes only the LIVE rows as deletes") {
    val dir = tmpTableDir("rt-dv-cdf")
    val t = GraftTable.create(spark, dir,
      (1 to 10).map(i => (i, s"n$i")).toDF("id", "name"),
      properties = Map(
        graft.tables.DeletionVectors.Property -> "true",
        "graft.enableChangeDataFeed" -> "true"))
    TableOps.delete(t, Some("id <= 3")) // DV merge-on-read: 3 rows masked
    val vReplace = TableOps.replaceTable(t, Some(Seq((100, "x")).toDF("id", "name")),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, vReplace, vReplace).readCDF
    // the delete side reads the removed files THROUGH their deletion
    // vectors: only the 7 live rows were replaced — the 3 DV-masked rows
    // must not resurrect as change rows
    assert(cdf.where("_change_type = 'delete'").count() == 7)
    assert(cdf.where("_change_type = 'delete' AND id <= 3").count() == 0)
    assert(cdf.where("_change_type = 'insert'").count() == 1)
  }

  it("SaveMode.Overwrite with CDF on synthesizes delete+insert at read time") {
    val dir = tmpTableDir("rt-ovw-cdf")
    val t = GraftTable.create(spark, dir,
      (1 to 6).map(i => (i, s"n$i")).toDF("id", "name"),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    Seq((50, "a"), (51, "b")).toDF("id", "name")
      .write.format("graft").mode("overwrite").save(dir)
    val t2 = GraftTable.forPath(spark, dir)
    // the overwrite commit (op WRITE, remove-all + add) writes no change
    // files; the reader synthesizes the full change content — previously
    // such a commit silently contributed NOTHING to the feed
    assert(t2.log.actionsAt(t2.version)
      .collect { case c: graft.tables.AddCDCFile => c }.isEmpty)
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, t2.version, t2.version).readCDF
    assert(cdf.where("_change_type = 'delete'").count() == 6)
    assert(cdf.where("_change_type = 'insert'").count() == 2)
    assert(cdf.where("_change_type = 'insert' AND id >= 50").count() == 2)
  }

  it("a range of MANY overwrites reads as grouped scans with exact per-version stamps") {
    val dir = tmpTableDir("rt-many-ovw")
    // complete-output-mode shape: every batch is a full overwrite; with CDF
    // on, the reader must synthesize each commit's delete+insert content —
    // grouped by metadata regime into a bounded number of scans, with the
    // version stamps still exact per commit
    val t = GraftTable.create(spark, dir,
      (1 to 4).map(i => (i, 0)).toDF("id", "batch"),
      properties = Map("graft.enableChangeDataFeed" -> "true"))
    val n = 12
    (1 to n).foreach { b =>
      t.overwrite((1 to (4 + b)).map(i => (i, b)).toDF("id", "batch"),
        operationParameters = Map("mode" -> "Overwrite"))
    }
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, 1L, n.toLong).readCDF
    // per overwrite version b: deletes = previous contents (4 + b - 1 rows,
    // all tagged batch b-1), inserts = new contents (4 + b rows, batch b)
    import org.apache.spark.sql.functions.{col => c}
    (1 to n).foreach { b =>
      val dels = cdf.where(s"_commit_version = $b AND _change_type = 'delete'")
      val inss = cdf.where(s"_commit_version = $b AND _change_type = 'insert'")
      assert(dels.count() == 4 + b - 1, s"v$b deletes")
      assert(dels.where(s"batch != ${b - 1}").count() == 0, s"v$b delete stamps")
      assert(inss.count() == 4 + b, s"v$b inserts")
      assert(inss.where(s"batch != $b").count() == 0, s"v$b insert stamps")
    }
    assert(cdf.where(c("_commit_timestamp").isNull).count() == 0)
    // the whole range resolves to a BOUNDED number of scans (one delete-side
    // and one insert-side group — every commit shares one metadata regime),
    // not one union branch per commit: count parquet scan nodes in the plan
    val scans = cdf.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size
    assert(scans >= 1 && scans <= 6,
      s"expected grouped scans (one per side per metadata regime), got $scans relations")
  }

  it("REPLACE clears column mapping left by nested renames; physical names don't leak") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.rt")
    spark.sql("CREATE TABLE graft_cat.rt.cm AS " +
      "SELECT id, named_struct('a', id * 2, 'b', concat('x', id)) AS s FROM range(5)")
    spark.sql("ALTER TABLE graft_cat.rt.cm RENAME COLUMN s.a TO doubled")
    spark.sql("ALTER TABLE graft_cat.rt.cm RENAME COLUMN id TO key")
    val mapped = GraftTable.forName(spark, "graft_cat.rt.cm")
    val vMapped = mapped.version
    assert(mapped.toDF.schema.fieldNames.toSeq == Seq("key", "s"))
    // REPLACE with a schema that REUSES the renamed-away names: the new
    // regime must read its own files under its own (fresh) mapping, never
    // resolve 'id'/'a' through the pre-replace physical names
    spark.sql("CREATE OR REPLACE TABLE graft_cat.rt.cm AS " +
      "SELECT id + 1000 AS id, named_struct('a', id) AS s FROM range(3)")
    val t = GraftTable.forName(spark, "graft_cat.rt.cm")
    assert(t.toDF.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(t.toDF.select("id").as[Long].collect().sorted.toSeq == Seq(1000L, 1001L, 1002L))
    assert(t.toDF.selectExpr("s.a").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // the pre-replace lineage still time-travels under ITS mapping
    assert(t.toDFAt(vMapped).schema.fieldNames.toSeq == Seq("key", "s"))
    assert(t.toDFAt(vMapped).selectExpr("s.doubled").as[Long].collect().sorted.toSeq ==
      Seq(0L, 2L, 4L, 6L, 8L))
    // and the new lineage keeps evolving independently
    spark.sql("ALTER TABLE graft_cat.rt.cm RENAME COLUMN s.a TO fresh")
    assert(spark.table("graft_cat.rt.cm").selectExpr("s.fresh").count() == 3)
  }

  it("REPLACE of a DV-carrying table: sidecars become vacuum-collectable orphans") {
    val dir = tmpTableDir("rt-dv")
    val t = GraftTable.create(spark, dir,
      (1 to 10).map(i => (i, s"n$i")).toDF("id", "name"),
      properties = Map(graft.tables.DeletionVectors.Property -> "true"))
    TableOps.delete(t, Some("id <= 3")) // merge-on-read: writes a DV sidecar
    val snap = GraftTable.forPath(spark, dir).snapshot
    assert(snap.files.exists(_.dv.exists(_.cardinality > 0)), "expected a DV carrier")
    val dvDirs = new java.io.File(dir, "_dv")
    assert(dvDirs.exists && dvDirs.listFiles().nonEmpty)
    val vReplace = TableOps.replaceTable(t, Some(Seq((100, "x")).toDF("id", "name")))
    // the replaced state is whole (DV rows stayed deleted through the swap)
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    assert(GraftTable.forPath(spark, dir).toDFAt(vReplace - 1).count() == 7)
    // vacuum to the replace horizon collects the old data files AND the
    // now-orphaned DV sidecars — once past the in-flight age guard, which
    // protects a concurrent DELETE's freshly written sidecar; backdate the
    // dirs to simulate an old orphan
    val backdate = System.currentTimeMillis() - 2 * TableOps.BloomSidecarMinAgeMillis
    dvDirs.listFiles().foreach(_.setLastModified(backdate))
    TableOps.vacuum(t, vReplace)
    assert(GraftTable.forPath(spark, dir).toDF.count() == 1)
    val sidecarsLeft = Option(dvDirs.listFiles()).map(_.toSeq).getOrElse(Nil)
      .flatMap(d => Option(d.listFiles()).map(_.toSeq).getOrElse(Nil))
    assert(sidecarsLeft.isEmpty, s"vacuum left DV sidecars: $sidecarsLeft")
  }

  it("path-API replaceTable: one commit, OCC read footprint over the whole table") {
    val dir = tmpTableDir("rt-path")
    val t = GraftTable.create(spark, dir, (1 to 10).map(i => (i, s"n$i")).toDF("id", "name"))
    val v = TableOps.replaceTable(t, Some(Seq((1L, 2.5)).toDF("k", "w")),
      properties = Map("who" -> "path"))
    assert(v == t.version && v == 1L)
    val after = GraftTable.forPath(spark, dir)
    assert(after.toDF.as[(Long, Double)].collect().toSeq == Seq((1L, 2.5)))
    assert(after.snapshot.metadata.properties.get("who").contains("path"))
    assert(after.toDFAt(0).count() == 10)
  }
}
