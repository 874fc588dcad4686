package graft

import org.scalatest.funspec.AnyFunSpec

import graft.tables.GraftTable

/** PER-ROW correlated scalar subqueries in `UPDATE ... SET` assignments —
  * beyond Delta (which refuses them): the assignment rides the ExprCond
  * seam, rebinds its outer references onto the rewrite frame, Spark's own
  * decorrelation plans the left-outer join + aggregate, and the subquery's
  * graft sources are snapshot-pinned so the data write and the CDC
  * post-image see one state.
  */
class CorrelatedAssignSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val warehouse: String = SparkSessionTestWrapper.catalogWarehouse

  it("UPDATE SET x = (correlated scalar) computes per-row values; no-match rows get NULL") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ca")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ca.t")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ca.s")
    // t: 10 rows, k = id % 3 (k=2 has no match in s); s: per-k values
    spark.sql("CREATE TABLE graft_cat.ca.t AS " +
      "SELECT id, id % 3 AS k, CAST(0.0 AS DOUBLE) AS v FROM range(10)")
    spark.sql("CREATE TABLE graft_cat.ca.s AS " +
      "SELECT * FROM VALUES (0, 100.0), (0, 200.0), (1, 50.0) AS s(k, y)")
    spark.sql(
      """UPDATE graft_cat.ca.t
        |SET v = (SELECT max(y) FROM graft_cat.ca.s s WHERE s.k = t.k) + id
        |WHERE k < 2 OR k = 2""".stripMargin)
    val got = spark.table("graft_cat.ca.t").as[(Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    val want = (0L until 10L).map { id =>
      val k = id % 3
      val mx = k match { case 0 => Some(200.0); case 1 => Some(50.0); case _ => None }
      (id, k, mx.map(_ + id)) // scalar subquery with no match -> NULL -> v NULL
    }
    assert(got == want, s"got $got")
  }

  it("correlated SET mixes with plain assignments and a correlated condition; CDF post-image agrees") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ca")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ca.c")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ca.dim")
    spark.sql("CREATE TABLE graft_cat.ca.c " +
      "TBLPROPERTIES('graft.enableChangeDataFeed'='true') AS " +
      "SELECT id, id % 4 AS g, CAST(id AS DOUBLE) AS v, 'x' AS tag FROM range(12)")
    spark.sql("CREATE TABLE graft_cat.ca.dim AS " +
      "SELECT * FROM VALUES (0, 7.0), (1, 11.0), (2, 13.0), (3, 17.0) AS d(g, w)")
    spark.sql(
      """UPDATE graft_cat.ca.c
        |SET v = v * (SELECT w FROM graft_cat.ca.dim d WHERE d.g = c.g),
        |    tag = 'scaled'
        |WHERE EXISTS (SELECT 1 FROM graft_cat.ca.dim d WHERE d.g = c.g AND d.w > 10)""".stripMargin)
    val weights = Map(0L -> 7.0, 1L -> 11.0, 2L -> 13.0, 3L -> 17.0)
    val got = spark.table("graft_cat.ca.c").as[(Long, Long, Double, String)]
      .collect().sortBy(_._1).toSeq
    val want = (0L until 12L).map { id =>
      val g = id % 4
      if (weights(g) > 10) (id, g, id * weights(g), "scaled")
      else (id, g, id.toDouble, "x")
    }
    assert(got == want, s"got $got")
    // the CDC post-image rows carry the SAME computed values (the second
    // evaluation of the correlated subquery, over pinned sources)
    val t = GraftTable.forName(spark, "graft_cat.ca.c")
    val post = graft.log.ChangeDataFeedHelper(spark, t.path, t.version, t.version)
      .readCDF.where("_change_type = 'update_postimage'")
      .selectExpr("id", "v").as[(Long, Double)].collect().toMap
    assert(post.size == 9) // g in {1,2,3}: 9 of 12 rows
    post.foreach { case (id, v) => assert(v == id * weights(id % 4), s"id=$id v=$v") }
  }

  it("set-valued subqueries in SET stay refused loudly") {
    val _ = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.ca")
    spark.sql("DROP TABLE IF EXISTS graft_cat.ca.r")
    spark.sql("CREATE TABLE graft_cat.ca.r AS SELECT id, id AS v FROM range(3)")
    val e = intercept[Exception] {
      spark.sql("UPDATE graft_cat.ca.r SET v = id IN (SELECT id FROM graft_cat.ca.r)")
    }
    assert(e.getMessage.contains("SCALAR") || e.getMessage.contains("subquer"),
      e.getMessage)
  }
}
