package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.tables.{GraftLog, GraftTable, SetTransaction, TableWriter}

/** Exactly-once Structured Streaming sink into a GraftTable.
  *
  * Spark's `foreachBatch` gives at-least-once epochs: after a failure the
  * last micro-batch is REPLAYED with the same `batchId`. Exactly-once
  * therefore needs an idempotence watermark transacted WITH the data — the
  * same protocol Delta's streaming sink uses (a `txn` action per epoch; the
  * reference library sits on top of Delta and inherits it). Each epoch here
  * commits `SetTransaction(appId, batchId)` atomically with its AddFiles;
  * a replayed epoch finds `snapshot.transactions(appId) >= batchId` and
  * skips. The check and the append race-protect each other: TableWriter
  * aborts (never blind-retries) a commit whose appId watermark was advanced
  * by a concurrent winner, so even a zombie executor re-running a committed
  * epoch cannot double-append.
  *
  * Scale: the watermark is O(1) metadata per writer; data files flow through
  * the normal distributed append path (no coalesce, no driver collect).
  */
object GraftSink {

  /** The per-epoch writer — exposed so tests (and recovery tooling) can
    * invoke an epoch replay directly. Appends `batch` with the
    * `SetTransaction(appId, batchId)` watermark unless that epoch already
    * committed; returns the committed version, or None for a skipped replay.
    */
  def writeEpoch(tablePath: String, appId: String)(
      batch: DataFrame, batchId: Long): Option[Long] = {
    val spark = batch.sparkSession
    val snap =
      if (GraftTable.exists(tablePath)) Some(new GraftLog(tablePath).snapshot())
      else None
    if (snap.exists(_.transactions.get(appId).exists(_ >= batchId))) None
    else Some(TableWriter.write(
      spark, tablePath, batch, TableWriter.Append,
      operation = "STREAMING UPDATE",
      operationParameters = Map("queryId" -> appId, "epochId" -> batchId.toString),
      extraActions = Seq(SetTransaction(appId, batchId)),
      // validates every commit that lands between the watermark read above
      // and this commit: a winner advancing OUR appId in that window is a
      // zombie instance of the same stream — abort instead of double-append
      readVersion = snap.map(_.version)))
  }

  /** `df.writeStream` wired to the exactly-once epoch writer. `appId`
    * identifies the logical stream across restarts — reuse the same id with
    * the same checkpoint location; distinct streams writing one table need
    * distinct ids.
    */
  def writeStreamTo(df: DataFrame, tablePath: String, appId: String): DataStreamWriter[Row] =
    df.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      writeEpoch(tablePath, appId)(batch, batchId); ()
    }
}
