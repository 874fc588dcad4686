package graft

import java.sql.Timestamp

import org.scalatest.funspec.AnyFunSpec

import graft.operators.Type2Scd
import graft.tables.GraftTable

/** Mirrors the reference's flagship SCD2 scenario
  * (Type2ScdSpec.scala:25-67 in mrpowers-io/jodie).
  */
class Type2ScdSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  it("upserts: closes out changed current rows and inserts new versions") {
    val base = Seq(
      (1, "A", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp]),
      (2, "B", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp]),
      (4, "D", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp])
    ).toDF("pkey", "attr", "is_current", "effective_time", "end_time")
    val t = GraftTable.create(spark, tmpTableDir("scd2"), base.repartition(1))

    val updates = Seq(
      (2, "Z", ts("2020-01-01 00:00:00")), // changed attr -> close out + new version
      (3, "C", ts("2020-09-15 00:00:00")), // new pkey -> plain insert
      (4, "D", ts("2020-01-01 00:00:00"))  // unchanged attr -> no-op
    ).toDF("pkey", "attr", "effective_time")

    Type2Scd.upsert(t, updates, "pkey", Seq("attr"))

    val expected = Seq(
      (1, "A", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp]),
      (2, "B", false, ts("2019-01-01 00:00:00"), Some(ts("2020-01-01 00:00:00"))),
      (2, "Z", true, ts("2020-01-01 00:00:00"), None: Option[Timestamp]),
      (3, "C", true, ts("2020-09-15 00:00:00"), None: Option[Timestamp]),
      (4, "D", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp])
    ).toDF("pkey", "attr", "is_current", "effective_time", "end_time")
    assertSmallDataFrameEquality(t.toDF, expected)
  }

  it("rejects a base table with missing bookkeeping columns") {
    val bad = Seq((1, "A")).toDF("pkey", "attr")
    val t = GraftTable.create(spark, tmpTableDir("scd2bad"), bad)
    assertThrows[GraftValidationError] {
      Type2Scd.upsert(t, bad, "pkey", Seq("attr"))
    }
  }

  it("rejects updates with wrong column set") {
    val base = Seq((1, "A", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp]))
      .toDF("pkey", "attr", "is_current", "effective_time", "end_time")
    val t = GraftTable.create(spark, tmpTableDir("scd2bad2"), base)
    assertThrows[GraftValidationError] {
      Type2Scd.upsert(t, Seq((1, "A")).toDF("pkey", "attr"), "pkey", Seq("attr"))
    }
  }

  it("genericUpsert honors custom bookkeeping column names") {
    val base = Seq(
      (1, "A", true, ts("2019-01-01 00:00:00"), None: Option[Timestamp])
    ).toDF("pkey", "attr", "cur", "eff", "end")
    val t = GraftTable.create(spark, tmpTableDir("scd2gen"), base.repartition(1))
    val updates = Seq((1, "B", ts("2020-01-01 00:00:00"))).toDF("pkey", "attr", "eff")
    Type2Scd.genericUpsert(t, updates, "pkey", Seq("attr"), "cur", "eff", "end")
    val expected = Seq(
      (1, "A", false, ts("2019-01-01 00:00:00"), Some(ts("2020-01-01 00:00:00"))),
      (1, "B", true, ts("2020-01-01 00:00:00"), None: Option[Timestamp])
    ).toDF("pkey", "attr", "cur", "eff", "end")
    assertSmallDataFrameEquality(t.toDF, expected)
  }
}
