package graft

import java.sql.Timestamp

import org.scalatest.funspec.AnyFunSpec

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  it("attaches the latest right row at or before each left time, per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 200.0),
      (3L, ts("2024-01-01 10:00:01"), 300.0) // no quote yet
    ).toDF("sym", "ts", "price")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.0),
      (1L, ts("2024-01-01 10:00:10"), 100.5),
      (2L, ts("2024-01-01 10:00:10"), 199.5) // tie: inclusive match
    ).toDF("sym", "qts", "quote")

    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "ts", "qts", Seq("quote"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.get(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:00:05.0", 99.0),
      (1L, "2024-01-01 10:00:20.0", 100.5),
      (2L, "2024-01-01 10:00:10.0", 199.5), // equal timestamps match (<=)
      (3L, "2024-01-01 10:00:01.0", null)   // left-join: no match -> null
    ))
  }

  it("NULL join keys never match (SQL ASOF equi-join semantics)") {
    val trades = Seq(
      (Some(1L), ts("2024-01-01 10:00:05"), 100.0),
      (None: Option[Long], ts("2024-01-01 10:00:05"), 300.0) // null key
    ).toDF("sym", "ts", "price")
    val quotes = Seq(
      (Some(1L), ts("2024-01-01 10:00:00"), 99.0),
      (None: Option[Long], ts("2024-01-01 10:00:00"), 777.0) // null key: never a match
    ).toDF("sym", "qts", "quote")
    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "ts", "qts", Seq("quote"))
      .collect().map(r => (Option(r.get(0)), r.get(3))).toSet
    assert(out == Set(
      (Some(1L), 99.0),
      (None, null) // null-key left row keeps null payload
    ))
  }

  it("rejects clashing payload column names") {
    val l = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "ts", "v")
    val r = Seq((1L, ts("2024-01-01 00:00:00"), 2.0)).toDF("k", "rts", "v")
    assertThrows[IllegalArgumentException] {
      AsOfJoin.asofJoin(l, r, Seq("k"), "ts", "rts", Seq("v"))
    }
  }
}
