package graft

import org.scalatest.funspec.AnyFunSpec

import graft.operators.TableOps
import graft.tables.GraftTable

/** `table_changes` / `table_changes_by_path` — the CDF SQL surface (Delta
  * 3.x's TVFs): version and timestamp bounds, default end, catalog and path
  * addressing, and the literal-argument refusals.
  */
class TableChangesSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val warehouse: String = SparkSessionTestWrapper.catalogWarehouse

  private def mkTable(): String = {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.tc")
    spark.sql("DROP TABLE IF EXISTS graft_cat.tc.t")
    spark.sql("CREATE TABLE graft_cat.tc.t " +
      "TBLPROPERTIES('graft.enableChangeDataFeed'='true') AS " +
      "SELECT id, concat('n', id) AS name FROM range(6)")       // CTAS (2 commits)
    spark.sql("INSERT INTO graft_cat.tc.t SELECT 100, 'x'")
    spark.sql("UPDATE graft_cat.tc.t SET name = 'X' WHERE id = 100")
    spark.sql("DELETE FROM graft_cat.tc.t WHERE id = 0")
    // versions relative to the head: vDel = latest, vUpd = -1, vIns = -2
    GraftTable.forName(spark, "graft_cat.tc.t").path
  }

  private def head(path: String): Long = GraftTable.forPath(spark, path).version

  it("table_changes reads the feed by version bounds; missing end = latest") {
    val path = mkTable()
    val vDel = head(path); val vIns = vDel - 2
    val full = spark.sql(
      s"SELECT * FROM table_changes('graft_cat.tc.t', $vIns, $vDel)")
    assert(full.columns.toSet ==
      Set("id", "name", "_change_type", "_commit_version", "_commit_timestamp"))
    val byType = full.groupBy("_change_type").count().as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L))
    // matches the helper it rides on
    val helper = graft.log.ChangeDataFeedHelper(spark, path, vIns, vDel).readCDF
    assert(full.count() == helper.count())
    // 2-arg form: end defaults to the latest version
    assert(spark.sql(
      s"SELECT * FROM table_changes('graft_cat.tc.t', $vIns)").count() == 4)
    // a TVF composes like any relation: filter + aggregate over it
    assert(spark.sql(s"SELECT count(*) FROM table_changes('graft_cat.tc.t', ${vDel - 1}, $vDel) " +
      "WHERE _change_type = 'delete'").as[Long].collect()(0) == 1L)
  }

  it("table_changes_by_path addresses the table by location; timestamp bounds resolve") {
    val path = mkTable()
    val vDel = head(path); val vIns = vDel - 2; val vUpd = vDel - 1
    assert(spark.sql(
      s"SELECT * FROM table_changes_by_path('$path', $vIns, $vDel)").count() == 4)
    // timestamp bounds: start = the update's commit instant resolves
    // AT-OR-AFTER to that version; a TIMESTAMP literal works like a string
    val t = GraftTable.forPath(spark, path)
    val tsU = t.log.actionsAt(vUpd)
      .collectFirst { case c: graft.tables.CommitInfo => c.timestamp }.get
    val fromTs = spark.sql(
      s"SELECT * FROM table_changes_by_path('$path', timestamp_millis(${tsU}L), $vDel)")
    assert(fromTs.select("_commit_version").distinct().as[Long].collect().sorted.toSeq
      == Seq(vUpd, vDel))
  }

  it("refuses non-literal, NULL, and mistyped bounds loudly") {
    mkTable()
    val nonLit = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_cat.tc.t', (SELECT 1))").collect()
    }
    assert(nonLit.getMessage.contains("literal") ||
      nonLit.getMessage.toLowerCase.contains("subquery"), nonLit.getMessage)
    val nul = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_cat.tc.t', CAST(NULL AS INT))").collect()
    }
    assert(nul.getMessage.contains("NULL"), nul.getMessage)
    val typed = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_cat.tc.t', array(1))").collect()
    }
    assert(typed.getMessage.contains("version number or a timestamp"), typed.getMessage)
    val arity = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('graft_cat.tc.t')").collect()
    }
    assert(arity.getMessage.contains("argument"), arity.getMessage)
  }
}
