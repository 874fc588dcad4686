package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec

import graft.operators.GraftMerge
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Event
import graft.tables.{GraftLog, GraftTable}

class StreamingSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  it("windowedEventStats aggregates a stream with watermarked windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val query = StreamingOps.windowedEventStats(events, watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode("update").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:20:00"), "click", 2.0),
        (ts("2024-01-01 10:30:00"), "view", 5.0),
        (ts("2024-01-01 11:10:00"), "click", 3.0))
      query.processAllAvailable()
      val out = spark.table("win_stats").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3), r.getDouble(4)))
      assert(out.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(out.contains(("2024-01-01 10:00:00.0", "view", 1L, 5.0)))
      assert(out.contains(("2024-01-01 11:00:00.0", "click", 1L, 3.0)))
    } finally query.stop()
  }

  it("intervalJoinStream: stream result equals the batch join; late rows evict") {
    implicit val sqlCtx = spark.sqlContext
    val clicksB = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L),
      (2L, ts("2024-01-01 12:00:00"), 7L),
      (3L, ts("2024-01-01 10:05:00"), 8L)).toDF("event_id", "ts", "user_id")
    val buysB = Seq(
      (100L, ts("2024-01-01 10:30:00"), 7L),  // joins click 1 (30 min after)
      (101L, ts("2024-01-01 12:59:00"), 7L),  // joins click 2
      (102L, ts("2024-01-01 18:00:00"), 8L))  // outside the 1h window
      .toDF("event_id", "ts", "user_id")
    // batch form first: same operator, same plan shape, oracle-checkable
    val batch = StreamingOps.intervalJoinStream(clicksB, buysB, "user_id",
      upperSeconds = 3600L)
      .select("event_id", "event_id_r").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((1L, 100L), (2L, 101L)))

    // streaming replay with a SHORT watermark: by the time the late click
    // arrives (batch 3, event-time 10:01), the watermark has passed it —
    // its state was never buffered, so it attributes nothing
    val inC = MemoryStream[(Long, Timestamp, Long)]
    val inP = MemoryStream[(Long, Timestamp, Long)]
    def f(in: MemoryStream[(Long, Timestamp, Long)]) =
      in.toDF().toDF("event_id", "ts", "user_id")
    val name = "ijoin_spec"
    val query = StreamingOps.intervalJoinStream(f(inC), f(inP), "user_id",
      watermarkDelay = "10 minutes", upperSeconds = 3600L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      inC.addData((1L, ts("2024-01-01 10:00:00"), 7L), (3L, ts("2024-01-01 10:05:00"), 8L))
      inP.addData((100L, ts("2024-01-01 10:30:00"), 7L))
      query.processAllAvailable()
      inC.addData((2L, ts("2024-01-01 12:00:00"), 7L))
      inP.addData((101L, ts("2024-01-01 12:59:00"), 7L))
      query.processAllAvailable()
      // a click far BEHIND the watermark: must not resurrect state
      inC.addData((99L, ts("2024-01-01 10:01:00"), 7L))
      inP.addData((102L, ts("2024-01-01 18:00:00"), 8L))
      query.processAllAvailable()
      inP.addData((103L, ts("2024-01-01 10:31:00"), 7L)) // late purchase, dropped
      query.processAllAvailable()
      val out = spark.table(name).select("event_id", "event_id_r")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((1L, 100L), (2L, 101L)), s"got $out")
    } finally query.stop()
  }

  it("fingerprintDedupStream drops cross-batch reposts, keeps first arrivals") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val name = "dedup_stream_spec"
    val query = StreamingOps.fingerprintDedupStream(docs)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData((1L, "Hello, World!"), (2L, "fresh content one"))
      query.processAllAvailable()
      // batch 2: exact repost of 1 and a NORMALIZED repost (case/punct differ)
      input.addData((3L, "Hello, World!"), (4L, "hello world"), (5L, "fresh content two"))
      query.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(out.keySet == Set(1L, 2L, 5L), s"survivors were ${out.keySet}")
    } finally query.stop()
  }

  it("dedupStreamWithinWatermark evicts state past the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val df = input.toDF().toDF("ts", "k")
    val name = "dedup_wm_spec"
    val query = StreamingOps.dedupStreamWithinWatermark(df, Seq("k"), "ts", "10 minutes")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L))
      query.processAllAvailable()
      // within horizon: duplicate dropped
      input.addData((ts("2024-01-01 10:05:00"), 1L))
      query.processAllAvailable()
      // advance watermark far past the key, then the key recurs: re-emits
      input.addData((ts("2024-01-01 12:00:00"), 2L))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 12:01:00"), 1L))
      query.processAllAvailable()
      val ks = spark.table(name).collect().map(_.getLong(1))
      assert(ks.count(_ == 1L) == 2, s"expected re-emit after eviction, got ${ks.toSeq}")
      assert(ks.count(_ == 2L) == 1)
    } finally query.stop()
  }

  it("sessionize (stateful) matches sessionizeBatch on the same data") {
    val rows = Seq(
      Event(1L, ts("2024-01-01 10:00:00"), "a", 1.0),
      Event(1L, ts("2024-01-01 10:00:30"), "b", 2.0),
      Event(1L, ts("2024-01-01 11:00:00"), "c", 3.0), // new session (gap > 10 min)
      Event(2L, ts("2024-01-01 10:00:00"), "d", 4.0))
    val gapMs = 10 * 60 * 1000L

    // batch-mode reference
    val batch = StreamingOps.sessionizeBatch(rows.toDF(), gapMs).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(3), r.getDouble(4))).toSet
    assert(batch == Set(
      (1L, "2024-01-01 10:00:00.0", 2, 3.0),
      (1L, "2024-01-01 11:00:00.0", 1, 3.0),
      (2L, "2024-01-01 10:00:00.0", 1, 4.0)))

    // streaming with state: emit closed sessions; the final open sessions
    // stay in state (timeout-based flush needs wall-clock time)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingOps.sessionize(input.toDS(), gapMs,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val closed = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(3)))
      // user 1's first session closed by the 11:00 event arriving in-batch
      assert(closed.contains((1L, "2024-01-01 10:00:00.0", 2)))
    } finally query.stop()
  }

  it("readChangeStream consumes committed change files incrementally") {
    val dir = tmpTableDir("stream-cdf")
    val t = GraftTable.create(spark, dir,
      Seq((1, "a"), (2, "b")).toDF("id", "name").repartition(1),
      properties = Map(GraftLog.CdfProperty -> "true"))
    GraftMerge(t, "old").merge(Seq((1, "A!")).toDF("id", "name"), "old.id = new.id", Some("new"))
      .whenMatchedUpdateAll().execute()

    val stream = StreamingOps.readChangeStream(spark, dir)
    assert(stream.isStreaming)
    val query = stream.writeStream.format("memory").queryName("cdf_stream")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val first = spark.table("cdf_stream").collect()
      assert(first.length == 2) // pre + post image
      // a second merge's change files arrive as a later micro-batch
      GraftMerge(t, "old").merge(Seq((2, "B!")).toDF("id", "name"), "old.id = new.id", Some("new"))
        .whenMatchedUpdateAll().execute()
      query.processAllAvailable()
      assert(spark.table("cdf_stream").count() == 4)
    } finally query.stop()
  }
}
