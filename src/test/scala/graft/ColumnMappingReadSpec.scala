package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables.{ColumnMapping, GraftTable}

/** Column mapping at the READ boundary — the other half of RENAME/DROP
  * COLUMN: data files keep their immutable PHYSICAL column names, so every
  * reader (native scan, partition values, stats skipping, bloom probes,
  * CDF) must translate. Found in round 13: the native scan read renamed
  * columns as NULL (physical `v` in the files, logical `w` requested) —
  * these specs pin the whole family.
  */
class ColumnMappingReadSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  it("renamed column reads its old files' data (native scan)") {
    val dir = tmpTableDir("cmr-scan")
    val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.renameColumn("v", "w")
    val t2 = GraftTable.forPath(spark, dir)
    // old data surfaces under the NEW logical name
    assert(t2.toDF.select("id", "w").as[(Long, String)].collect().toMap
      == Map(1L -> "a", 2L -> "b"))
    // appends after the rename land under the same physical name
    t2.append(Seq((3L, "c")).toDF("id", "w"))
    val read = GraftTable.forPath(spark, dir).toDF
    assert(read.where("w = 'c'").count() == 1)
    assert(read.where("w IS NULL").count() == 0)
    // filters on the renamed column still answer correctly (pushdown on a
    // mapped column is dropped, never mistranslated)
    assert(read.where(col("w") === "a").select("id").as[Long].head() == 1L)
  }

  it("renamed PARTITION column keeps its values and prunes correctly") {
    val dir = tmpTableDir("cmr-part")
    val t = GraftTable.create(spark, dir,
      spark.range(20).select(col("id"), (col("id") % 4).cast("string").as("p")),
      partitionColumns = Seq("p"))
    t.renameColumn("p", "bucket")
    val read = GraftTable.forPath(spark, dir).toDF
    // partition VALUES come from the log's physical keys
    assert(read.where("bucket = '2'").count() == 5)
    assert(read.where("bucket IS NULL").count() == 0)
    // pruning still fires: a one-partition predicate scans fewer files
    val t2 = GraftTable.forPath(spark, dir)
    val cls = graft.tables.FileSkipping.classify(spark, t2.toDF, "bucket = '2'")
    val kept = graft.tables.FileSkipping.filesMatching(t2.snapshot, cls.all, None)
    assert(kept.nonEmpty && kept.size < t2.snapshot.files.size)
    assert(kept.forall(_.partitionValues.get("p").contains("2")))
  }

  it("a re-added logical name never reads the renamed-away column's stats") {
    val dir = tmpTableDir("cmr-readd")
    // v holds LOW values; rename it away, re-add a fresh v with HIGH values
    val t = GraftTable.create(spark, dir,
      spark.range(10).select(col("id"), (col("id") % 5).as("v")))
    t.renameColumn("v", "w")
    val t2 = GraftTable.forPath(spark, dir)
    t2.addColumns(org.apache.spark.sql.types.StructType.fromDDL("v BIGINT"))
    val t3 = GraftTable.forPath(spark, dir)
    t3.append(spark.range(10, 14).select(col("id"), (col("id") % 5).as("w"),
      (col("id") + 1000L).as("v")))
    // the new v's physical name is freshly minted — never the retired "v"
    val newV = t3.snapshot.schema.fields.find(_.name == "v").get
    assert(ColumnMapping.physicalName(newV) != "v")
    // a predicate on the NEW v must not prune by the OLD column's stats
    // (old files' stats key "v" belongs to w): values >= 1000 exist ONLY in
    // the new file, and the query must find them all
    val read = GraftTable.forPath(spark, dir).toDF
    assert(read.where("v >= 1000").count() == 4)
    assert(read.where("v IS NOT NULL").count() == 4)
    // and w still answers from the old bytes
    assert(read.where("w = 3").count() == 3) // ids 3, 8, 13
  }

  it("metadata-only min/max keeps firing after a rename (physical stats keys)") {
    val dir = tmpTableDir("cmr-agg")
    val t = GraftTable.create(spark, dir,
      spark.range(100).select(col("id"), (col("id") * 2).as("v")))
    t.renameColumn("v", "w")
    val df = spark.read.format("graft").load(dir)
    val agg = df.agg(min("w"), max("w"), count(lit(1)))
    // the answer must be correct...
    val row = agg.head()
    assert(row.getLong(0) == 0L && row.getLong(1) == 198L && row.getLong(2) == 100L)
    // ...and metadata-only: the aggregate collapses to a LocalRelation
    assert(agg.queryExecution.optimizedPlan
      .collectFirst { case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l }
      .nonEmpty,
      s"min/max after rename should answer from stats, got:\n${agg.queryExecution.optimizedPlan}")
  }

  it("optimizeWrite re-bins a renamed table's staging without nulling the column") {
    val dir = tmpTableDir("cmr-ow")
    val t = GraftTable.create(spark, dir, Seq((0L, "seed")).toDF("id", "v"),
      properties = Map(graft.tables.TableWriter.OptimizeWriteProperty -> "true"))
    t.renameColumn("v", "w")
    // a many-shard append forces the optimizeWrite re-bin, which re-reads
    // the staged files — they carry the PHYSICAL column name
    GraftTable.forPath(spark, dir)
      .append(spark.range(1, 65).select(col("id"),
        concat(lit("x"), col("id")).as("w")).repartition(16))
    val read = GraftTable.forPath(spark, dir).toDF
    assert(read.count() == 65)
    assert(read.where("w IS NULL").count() == 0,
      "optimizeWrite must re-read staging in the physical layout")
    assert(read.where("w = 'x7'").count() == 1)
  }

  it("CDF survives a rename: change files are physical, reads are logical") {
    val dir = tmpTableDir("cmr-cdf")
    val t = GraftTable.create(spark, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      properties = Map(graft.tables.GraftLog.CdfProperty -> "true"))
    TableOps.update(t, Some("id = 1"), Map("v" -> "'a2'")) // CDC pre/post, old name
    GraftTable.forPath(spark, dir).renameColumn("v", "w")
    TableOps.delete(GraftTable.forPath(spark, dir), Some("id = 2")) // CDC, new name
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, 0L, 3L).readCDF
      .select("id", "w", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    // pre-rename change rows surface under the CURRENT logical name
    assert(cdf.contains((1L, "a", "update_preimage", 1L)))
    assert(cdf.contains((1L, "a2", "update_postimage", 1L)))
    assert(cdf.contains((2L, "b", "delete", 3L)))

    // a rename landing at the END of the range (after the last change
    // file) must still relabel — both frames translate to the RANGE-END
    // schema, never splitting one column across stale and new names
    GraftTable.forPath(spark, dir).renameColumn("w", "u") // v4, metadata-only
    val cdf2 = graft.log.ChangeDataFeedHelper(spark, dir, 0L, 4L).readCDF
    assert(cdf2.columns.contains("u") && !cdf2.columns.contains("w"),
      s"range-end rename must own the output name, got ${cdf2.columns.toSeq}")
    assert(cdf2.where("u = 'a2' AND _change_type = 'update_postimage'").count() == 1)
  }

  it("NESTED struct-field rename: old files read under the new name, writes round-trip") {
    val dir = tmpTableDir("cmr-nested")
    val base = spark.range(3).select(col("id"),
      struct(concat(lit("n"), col("id")).as("a"), (col("id") * 10).as("q")).as("s"))
    val t = GraftTable.create(spark, dir, base)
    t.renameColumn("s.a", "label")
    val t2 = GraftTable.forPath(spark, dir)
    // old files' nested bytes surface under the NEW logical name
    assert(t2.toDF.select(col("id"), col("s.label")).as[(Long, String)]
      .collect().toMap == Map(0L -> "n0", 1L -> "n1", 2L -> "n2"))
    assert(t2.toDF.where("s.label IS NULL").count() == 0)
    // appends speak the new logical name; files land on the stable physical
    t2.append(spark.range(3, 5).select(col("id"),
      struct(concat(lit("n"), col("id")).as("label"), (col("id") * 10).as("q")).as("s")))
    val read = GraftTable.forPath(spark, dir).toDF
    assert(read.count() == 5)
    assert(read.where("s.label IS NULL").count() == 0)
    // filters on the renamed nested field answer correctly (nested
    // pushdown on a mapped path is dropped, never mistranslated)
    assert(read.where(col("s.label") === "n3").select("id").as[Long].head() == 3L)
    // the untouched sibling keeps reading
    assert(read.select(sum(col("s.q"))).as[Long].head() == 100L)
    // metadata-only: the rename commit added no files
    assert(GraftTable.forPath(spark, dir).log.actionsAt(1L)
      .collect { case a: graft.tables.AddFile => a }.isEmpty)
  }

  it("NESTED drop retires the field; a re-added name reads NULL, never old bytes") {
    val dir = tmpTableDir("cmr-nested-drop")
    val t = GraftTable.create(spark, dir, spark.range(4).select(col("id"),
      struct((col("id") * 7).as("a"), col("id").cast("string").as("q")).as("s")))
    t.dropColumns(Seq("s.a"))
    val afterDrop = GraftTable.forPath(spark, dir)
    assert(afterDrop.snapshot.schema("s").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq == Seq("q"))
    assert(afterDrop.toDF.select(col("s.q")).as[String].collect().sorted.toSeq
      == Seq("0", "1", "2", "3"))
    // re-add the same logical name: fresh physical — old files' s.a bytes
    // must NOT resurface
    afterDrop.addNestedColumn(Seq("s"), org.apache.spark.sql.types.StructField(
      "a", org.apache.spark.sql.types.LongType))
    val readded = GraftTable.forPath(spark, dir)
    assert(readded.toDF.where("s.a IS NOT NULL").count() == 0,
      "re-added nested field must read NULL on old files, not the retired bytes")
    // and it is writable under the fresh physical
    readded.append(spark.range(4, 6).select(col("id"),
      struct(col("id").cast("string").as("q"), (col("id") + 100L).as("a")).as("s")))
    val read = GraftTable.forPath(spark, dir).toDF
    assert(read.where("s.a IS NOT NULL").count() == 2)
    assert(read.where("s.a = 104").count() == 1)
    // dropping the LAST nested field refuses loudly
    val e = intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmpTableDir("cmr-nested-last"),
        spark.range(2).select(col("id"), struct(col("id").as("only")).as("s")))
        .dropColumns(Seq("s.only"))
    }
    assert(e.getMessage.contains("last field"))
  }

  it("DDL descends ARRAYS and MAPS: element/key/value paths rename, drop, re-add and widen") {
    val dir = tmpTableDir("cmr-container")
    GraftTable.create(spark, dir, spark.sql(
      "SELECT id, array(named_struct('a', CAST(id AS INT), 'b', concat('x', id))) AS arr, " +
        "map(concat('k', id), named_struct('x', CAST(id AS INT))) AS m, " +
        "array(CAST(id AS INT)) AS nums FROM range(3)"))
    // rename a struct field under an ARRAY: metadata-only, old files read
    // under the new name (physical name pinned inside the element struct)
    GraftTable.forPath(spark, dir).renameColumn("arr.element.a", "a2")
    val afterRename = GraftTable.forPath(spark, dir).toDF
    assert(afterRename.selectExpr("arr[0].a2").collect().map(_.getInt(0)).toSet == Set(0, 1, 2))
    // writes round-trip through the mapping (new logical name in, physical on disk)
    GraftTable.forPath(spark, dir).append(spark.sql(
      "SELECT 100L AS id, array(named_struct('a2', CAST(100 AS INT), 'b', 'y')) AS arr, " +
        "map('k100', named_struct('x', CAST(100 AS INT))) AS m, array(CAST(7 AS INT)) AS nums"))
    assert(GraftTable.forPath(spark, dir).toDF.where("arr[0].a2 = 100").count() == 1)
    assert(GraftTable.forPath(spark, dir).toDF.selectExpr("sum(arr[0].a2)")
      .head.getLong(0) == 103L) // 0+1+2 from pre-rename files + 100
    // rename a struct field under a MAP VALUE
    GraftTable.forPath(spark, dir).renameColumn("m.value.x", "x2")
    assert(GraftTable.forPath(spark, dir).toDF
      .selectExpr("m['k1'].x2").where("m['k1'].x2 = 1").count() == 1)
    // DROP a field under an array, then RE-ADD the same logical name:
    // fresh physical name — old bytes must never resurface
    GraftTable.forPath(spark, dir).dropColumns(Seq("arr.element.b"))
    assert(!GraftTable.forPath(spark, dir).toDF.schema("arr").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains("b"))
    GraftTable.forPath(spark, dir).addNestedColumn(Seq("arr", "element"),
      org.apache.spark.sql.types.StructField("b", org.apache.spark.sql.types.StringType))
    val readded = GraftTable.forPath(spark, dir).toDF
    assert(readded.selectExpr("arr[0].b").collect().forall(_.isNullAt(0)))
    // WIDEN a struct field under an array and a bare ARRAY ELEMENT type:
    // the same per-leaf vectorized-reader upcast as top-level widens
    GraftTable.forPath(spark, dir).widenColumnType("arr.element.a2",
      org.apache.spark.sql.types.LongType)
    GraftTable.forPath(spark, dir).widenColumnType("nums.element",
      org.apache.spark.sql.types.LongType)
    val widened = GraftTable.forPath(spark, dir).toDF
    assert(widened.schema("nums").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.LongType)
    assert(widened.selectExpr("sum(arr[0].a2)").head.getLong(0) == 103L)
    assert(widened.selectExpr("sum(nums[0])").head.getLong(0) == 10L) // 0+1+2+7
    GraftTable.forPath(spark, dir).append(spark.sql(
      "SELECT 101L AS id, array(named_struct('a2', 6000000000L, 'b', 'z')) AS arr, " +
        "map('k101', named_struct('x2', CAST(1 AS INT))) AS m, array(7000000000L) AS nums"))
    assert(GraftTable.forPath(spark, dir).toDF.where("arr[0].a2 > 5000000000").count() == 1)
    // container POSITIONS have no named identity: rename/drop refuse loudly
    val e1 = intercept[IllegalArgumentException](
      GraftTable.forPath(spark, dir).renameColumn("arr.element", "e2"))
    assert(e1.getMessage.contains("no named identity"))
    val e2 = intercept[IllegalArgumentException](
      GraftTable.forPath(spark, dir).dropColumns(Seq("m.value")))
    assert(e2.getMessage.contains("drop the container column"))
    val e3 = intercept[IllegalArgumentException](
      GraftTable.forPath(spark, dir).renameColumn("m.key", "k2"))
    assert(e3.getMessage.contains("no named identity"))
  }

  it("renames touching generated/identity feature columns are refused loudly") {
    // the graft.generated.<col> / graft.identity.<col> property KEYS carry
    // the column name — a rename would silently orphan them (the column
    // stops being generated/identity), so it must refuse like constraints do
    val dir = tmpTableDir("cmr-gen")
    val t = GraftTable.create(spark, dir,
      spark.range(3).select(col("id"), (col("id") * 2).as("double_id")),
      properties = Map(GraftTable.GeneratedPropertyPrefix + "double_id" -> "id * 2"))
    val e1 = intercept[IllegalArgumentException](t.renameColumn("double_id", "d2"))
    assert(e1.getMessage.contains("generated column"))
    // a column REFERENCED by the generation expression is protected too
    val e2 = intercept[IllegalArgumentException](
      GraftTable.forPath(spark, dir).renameColumn("id", "id2"))
    assert(e2.getMessage.contains("generated column"))
    val dir2 = tmpTableDir("cmr-ident")
    val t2 = GraftTable.create(spark, dir2, Seq((1L, "x")).toDF("n", "p"),
      properties = Map(GraftTable.IdentityPropertyPrefix + "rowid" -> "1,1"))
    val e3 = intercept[IllegalArgumentException](t2.renameColumn("rowid", "rid"))
    assert(e3.getMessage.contains("identity column"))
    // and an unrelated column still renames fine on both tables
    GraftTable.forPath(spark, dir2).renameColumn("p", "payload")
    assert(GraftTable.forPath(spark, dir2).toDF.columns.contains("payload"))
  }

  it("NESTED rename: CDF, stats skipping and top-level metadata-only aggs stay correct") {
    val dir = tmpTableDir("cmr-nested-cdf")
    val t = GraftTable.create(spark, dir, spark.range(2).select(col("id"),
      struct(concat(lit("v"), col("id")).as("a")).as("s")),
      properties = Map(graft.tables.GraftLog.CdfProperty -> "true"))
    TableOps.update(t, Some("id = 0"), Map("s" -> "named_struct('a', 'v0x')"))
    GraftTable.forPath(spark, dir).renameColumn("s.a", "b")
    TableOps.delete(GraftTable.forPath(spark, dir), Some("id = 1"))
    val cdf = graft.log.ChangeDataFeedHelper(spark, dir, 0L, 3L).readCDF
      .select(col("id"), col("s.b"), col("_change_type"))
      .as[(Long, String, String)].collect().toSet
    // pre-rename change files surface under the CURRENT nested logical name
    assert(cdf.contains((0L, "v0", "update_preimage")))
    assert(cdf.contains((0L, "v0x", "update_postimage")))
    assert(cdf.contains((1L, "v1", "delete")))
    // top-level stats keys are untouched by a nested rename: the
    // metadata-only count/min/max path keeps answering
    val agg = GraftTable.forPath(spark, dir).toDF
      .agg(min("id"), max("id"), count(lit(1))).collect().head
    assert(agg.getLong(2) == 1L && agg.getLong(0) == 0L)
  }
}
