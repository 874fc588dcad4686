package graft

import org.scalatest.funspec.AnyFunSpec

import graft.log.OperationMetricHelper
import graft.operators.{GraftMerge, TableOps}
import graft.tables.GraftTable

class OperationMetricHelperSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  it("reports per-version deleted/inserted/updated/source_rows counts") {
    val dir = tmpTableDir("oph")
    // v0: WRITE 4 rows
    val t = GraftTable.create(spark, dir,
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("id", "name").repartition(1))
    // v1: MERGE upsert — update 2, insert 1
    GraftMerge(t, "old")
      .merge(Seq((1, "A"), (2, "B"), (9, "i")).toDF("id", "name"), "old.id = new.id", Some("new"))
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    // v2: DELETE 1 row
    TableOps.delete(t, Some("id = 3"))
    // v3: UPDATE 1 row
    TableOps.update(t, Some("id = 4"), Map("name" -> "'D'"))

    val helper = OperationMetricHelper(spark, dir)
    val metrics = helper.getCountMetrics().toList
    assert(metrics == List(
      (3L, 0L, 0L, 1L, 0L),   // UPDATE
      (2L, 1L, 0L, 0L, 0L),   // DELETE
      (1L, 0L, 1L, 2L, 3L),   // MERGE: del=0 ins=1 upd=2 src=3
      (0L, 0L, 4L, 0L, 4L)    // WRITE
    ))
    val df = helper.getCountMetricsAsDF()
    assert(df.columns.toSeq == Seq("version", "deleted", "inserted", "updated", "source_rows"))
    assert(df.count() == 4)
  }

  it("filters history by partition condition and re-derives WRITE counts") {
    val dir = tmpTableDir("oph-part")
    val df = Seq((1, "USA", "x"), (2, "USA", "y"), (3, "IND", "z")).toDF("id", "country", "name")
    val t = GraftTable.create(spark, dir, df, partitionColumns = Seq("country"))
    // partition-scoped delete records the predicate
    TableOps.delete(t, Some("country = 'USA' AND id = 1"))
    val helper = OperationMetricHelper(spark, dir)
    val byPart = helper.getCountMetrics(Some("country = 'USA'")).toList
    // v1 DELETE matches the partition condition; v0 WRITE restricted to USA files = 2 rows
    assert(byPart == List((1L, 1L, 0L, 0L, 0L), (0L, 0L, 2L, 0L, 2L)))
    // non-matching partition: DELETE filtered out, WRITE restricted to IND = 1 row
    val ind = helper.getCountMetrics(Some("country = 'IND'")).toList
    assert(ind == List((0L, 0L, 1L, 0L, 1L)))
  }

  it("getWriteMetricByPartition matches percent-encoded partition dirs exactly") {
    // 'A/B' lands on disk as `seg=A%2FB` — the matcher must percent-decode
    // path segments; and segment EQUALITY must stop `seg=A` from matching
    // the `seg=AB` or `seg=A%2FB` directories (the old substring contains did)
    val dir = tmpTableDir("oph-enc")
    val df = Seq((1, "A/B"), (2, "A/B"), (3, "A"), (4, "AB")).toDF("id", "seg")
    GraftTable.create(spark, dir, df, partitionColumns = Seq("seg"))
    val helper = OperationMetricHelper(spark, dir)
    assert(helper.getWriteMetricByPartition("seg = 'A/B'", 0L) == 2L)
    assert(helper.getWriteMetricByPartition("seg = 'A'", 0L) == 1L)
    assert(helper.getWriteMetricByPartition("seg = 'AB'", 0L) == 1L)
  }

  it("splitConditionTo parses plain, attribute-id and qualified forms") {
    val h = OperationMetricHelper(spark, "/nonexistent")
    assert(h.splitConditionTo("country = 'USA' and gender = Female") ==
      Map("country" -> "USA", "gender" -> "Female"))
    assert(h.splitConditionTo("country#590 = USA") == Map("country" -> "USA"))
    assert(h.splitConditionTo("tbl.country = 'IND'") == Map("country" -> "IND"))
  }

  it("version range bounds restrict the history") {
    val dir = tmpTableDir("oph-range")
    val t = GraftTable.create(spark, dir, Seq((1, "a")).toDF("id", "name"))
    t.append(Seq((2, "b")).toDF("id", "name"))
    t.append(Seq((3, "c")).toDF("id", "name"))
    val helper = OperationMetricHelper(spark, dir, startingVersion = 1, endingVersion = Some(2))
    assert(helper.getCountMetrics().map(_._1) == Seq(2L, 1L))
  }
}
