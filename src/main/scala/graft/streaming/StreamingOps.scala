package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.tables.{GraftLog, GraftTable}

/** Structured Streaming surface for the events stream and change-data feeds.
  * The reference is batch-only (SURVEY §2.6: CDF is incremental batch); these
  * operators extend the engine to true streams the Spark-native way:
  * `readStream` → transforms → watermark + windowed aggs →
  * `mapGroupsWithState` for custom session state.
  *
  * Every transform takes a DataFrame so it runs identically on a batch frame
  * (testable, backfillable) and a streaming frame (same plan, incremental
  * execution) — the Spark pattern for exactly-once reprocessing parity.
  */
object StreamingOps {

  /** Tumbling-window per-event-type counts/sums with a watermark for state
    * eviction. At scale: partial aggregation per micro-batch, state keyed by
    * (window, event_type) — bounded by watermark horizon.
    */
  def windowedEventStats(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("events"), col("total_value"))

  /** Watermarked per-window value quantiles via the mergeable KLL-style
    * summary ([[graft.functions.QuantileSketchAgg]]): the sketch buffer IS
    * the streaming state — O(k log(n/k)) per open (window, type) group,
    * serialized into the state store between micro-batches — so windowed
    * p50/p90 come out of ONE streaming aggregation with no per-window sort
    * and no raw-value retention. The batch analogue of the same plan is
    * exact while group sizes stay under `k` (the oracle regime).
    */
  def windowedValueQuantiles(
      events: DataFrame,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes",
      windowLength: String = "1 hour",
      k: Int = 8192): DataFrame = {
    import graft.functions.GraftFunctions.{quantileSketch, sketchQuantile}
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength), col("event_type"))
      .agg(quantileSketch(col("value"), k).as("__sk"),
        count(lit(1)).as("events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"),
        sketchQuantile(col("__sk"), 0.5).as("p50"),
        sketchQuantile(col("__sk"), 0.9).as("p90"),
        col("events"))
  }

  case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, lastSeen: Long, events: Int, totalValue: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      events: Int, total_value: Double)

  /** Gap-based sessionization with custom state: a session closes after
    * `gapMs` of inactivity (processing-time timeout when streaming; pass
    * `GroupStateTimeout.NoTimeout` for in-batch-gap-only closing, e.g. in
    * tests — processing-time timeouts keep scheduling micro-batches).
    * State per user is O(1); emitted rows are closed sessions.
    */
  def sessionize(events: Dataset[Event], gapMs: Long,
      timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout()): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.lastSeen),
              s.events, s.totalValue))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastSeen <= gapMs =>
                  cur = Some(s.copy(lastSeen = t, events = s.events + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastSeen), s.events, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: one survivor per `keys` value across ALL
    * micro-batches — Spark's stateful `dropDuplicates`, which keeps one
    * state entry per distinct key forever. Right for bounded key spaces
    * (ids, fingerprints of a capped corpus); for unbounded streams prefer
    * [[dedupStreamWithinWatermark]], whose state is evicted at the
    * watermark horizon.
    */
  def dedupStream(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Watermark-bounded streaming dedup: duplicates arriving within the
    * watermark delay of the first occurrence are dropped; state for keys
    * older than the horizon is evicted, so memory is O(keys per horizon),
    * not O(all keys ever) — the only dedup that survives an unbounded
    * 100 TB/day ingest stream. (A key recurring AFTER eviction re-emits:
    * pair with a periodic batch [[graft.pipeline.Dedup.minhashDedupAgainst]]
    * pass against the accumulated corpus for full-history exactness.)
    */
  def dedupStreamWithinWatermark(df: DataFrame, keys: Seq[String],
      tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)

  /** Content-fingerprint streaming dedup for document ingest: drops every
    * doc whose NORMALIZED text (case/punctuation-insensitive —
    * [[graft.pipeline.TextAnalysis.fingerprint]]) already flowed through
    * the stream, emitting the first arrival with its fingerprint attached.
    * Composes with the batch near-dup operators downstream: this gate
    * removes exact/boilerplate reposts in-flight at O(1) state per distinct
    * doc; MinHash clustering then handles near-duplicates at rest.
    */
  def fingerprintDedupStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    dedupStream(
      docs.withColumn("fingerprint",
        graft.pipeline.TextAnalysis.fingerprint(col(textCol))),
      Seq("fingerprint"))

  /** Batch-mode sessionization over the same gap semantics (for backfill and
    * the correctness oracle): pure window functions, no state store.
    *
    * `tsCol` is normally a TimestampType column; pass `tsMillis` to supply
    * the epoch-ms expression yourself when `tsCol` is numeric (e.g. a raw
    * epoch-µs BIGINT: `Some(expr("ts_us div 1000"))`) — gap comparison then
    * runs on engine-version-proof integer arithmetic, and session_start/end
    * come back in the column's own unit.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long,
      tsCol: String = "ts", userCol: String = "user_id",
      orderCols: Seq[String] = Nil,
      tsMillis: Option[Column] = None): DataFrame = {
    val order = if (orderCols.nonEmpty) orderCols else Seq(tsCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(order.map(col): _*)
    events
      .withColumn("__ms", tsMillis.getOrElse(unix_millis(col(tsCol))))
      .withColumn("__prev", lag(col("__ms"), 1).over(w))
      .withColumn("__new_session",
        when(col("__prev").isNull || (col("__ms") - col("__prev")) > gapMs, 1)
          .otherwise(0))
      .withColumn("__session_id", sum(col("__new_session")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .drop("__ms", "__prev", "__new_session")
      .groupBy(col(userCol), col("__session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).cast("int").as("events"),
        sum(col("value")).as("total_value"))
      .drop("__session_id")
  }

  /** Streaming read of a GraftTable's change-data directory: each committed
    * change file becomes a micro-batch input (file-source semantics — files
    * are immutable once committed, so this is exactly-once).
    */
  def readChangeStream(spark: SparkSession, tablePath: String): DataFrame = {
    val table = GraftTable.forPath(spark, tablePath)
    val schema = table.snapshot.schema.add("_change_type", "string")
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "16")
      .parquet(s"$tablePath/${GraftLog.CdcDirName}")
  }

  /** Streaming APPLY CHANGES: pipe a change-row stream (CDC upserts +
    * deletes with a sequencing column) into a downstream table, one
    * [[graft.operators.ApplyChanges]] merge commit per micro-batch.
    *
    * Cross-batch ordering: when the target stores `sequenceCol`, the
    * per-row `source.seq >= target.seq` guard makes late batches harmless
    * and batch REPLAYS (foreachBatch re-runs the last batch after a
    * restart) value-idempotent — a replay rewrites identical values, so
    * the table state is the same fold regardless of retry count. Pair
    * with [[readChangeStream]] on an upstream table for table-to-table
    * CDC propagation.
    *
    * Returns a started [[org.apache.spark.sql.streaming.StreamingQuery]].
    */
  def applyChangesStream(
      changes: DataFrame,
      tablePath: String,
      keyCols: Seq[String],
      sequenceCol: String,
      deleteWhen: Option[String] = None,
      queryName: Option[String] = None,
      checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    var w = changes.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          graft.operators.ApplyChanges.applyChanges(
            GraftTable.forPath(batch.sparkSession, tablePath),
            batch, keyCols, sequenceCol, deleteWhen)
        ()
      }
    queryName.foreach(n => w = w.queryName(n))
    checkpointLocation.foreach(p => w = w.option("checkpointLocation", p))
    w.start()
  }

  /** Table-to-table CDC propagation: stream the graft source table's
    * change feed (initial snapshot as inserts, then per-commit upserts +
    * deletes — the `format("graft")` stream source's contract) into a
    * downstream table, keyed by `keyCols` and sequenced by
    * `_commit_version`. Update PREIMAGE rows are old values, not changes —
    * they're filtered before the apply. The downstream table converges to
    * the upstream's live state; with a checkpoint location the propagation
    * resumes exactly where it left off across restarts.
    */
  def propagateChanges(
      spark: SparkSession,
      sourcePath: String,
      targetPath: String,
      keyCols: Seq[String],
      queryName: Option[String] = None,
      checkpointLocation: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val changes = spark.readStream.format("graft").load(sourcePath)
      .filter(col("_change_type") =!= "update_preimage")
    applyChangesStream(changes, targetPath, keyCols, "_commit_version",
      Some("_change_type = 'delete'"), queryName, checkpointLocation)
  }

  /** Watermarked stream-stream INNER join on `keyCol` with an event-time
    * interval constraint: a right row joins a left row when
    * `right.ts ∈ [left.ts + lowerSeconds, left.ts + upperSeconds]`
    * (click→purchase attribution, impression→conversion, request→response
    * pairing). Right columns come back suffixed `_r`; the key and
    * timestamps keep both sides.
    *
    * Scale: the time-range conjunct is written DIRECTLY on the two
    * watermarked event-time columns, which is what lets Spark derive a
    * state-eviction bound — each side buffers only (watermark delay +
    * interval) worth of rows, the required shape for an unbounded
    * 100 TB/day stream. A key-only condition would run but buffer both
    * streams forever. Works identically on batch frames (same plan,
    * backfill + oracle checks).
    */
  def intervalJoinStream(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes",
      lowerSeconds: Long = 0L,
      upperSeconds: Long = 3600L): DataFrame = {
    require(upperSeconds >= lowerSeconds,
      s"upperSeconds=$upperSeconds must be >= lowerSeconds=$lowerSeconds")
    val isStreaming = left.isStreaming || right.isStreaming
    def wm(df: DataFrame) = if (isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    val l = wm(left).alias("__l")
    val r = wm(right).alias("__r")
    val joined = l.join(r,
      expr(s"__l.$keyCol = __r.$keyCol") &&
        expr(s"__r.$tsCol >= __l.$tsCol + INTERVAL $lowerSeconds SECONDS") &&
        expr(s"__r.$tsCol <= __l.$tsCol + INTERVAL $upperSeconds SECONDS"))
    val lCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rCols = right.columns.map(c => col(s"__r.$c").as(s"${c}_r"))
    joined.select(lCols ++ rCols: _*)
  }
}
