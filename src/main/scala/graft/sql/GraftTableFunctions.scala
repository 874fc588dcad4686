package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** SQL table-valued functions over the change data feed — Delta 3.x's
  * public CDF SQL surface (reference consumers read CDF through
  * `ChangeDataFeedHelper`; Delta users read it as
  * `SELECT * FROM table_changes('t', 1 [, 5])`):
  *
  * {{{
  *   SELECT * FROM table_changes('graft_cat.ns.t', 1, 5)
  *   SELECT * FROM table_changes_by_path('/data/t', '2026-01-01 00:00:00')
  * }}}
  *
  * Bounds follow the reader-option contract
  * ([[graft.sources.GraftDataSource]]'s `readChangeFeed`): an integer is a
  * version; a string or timestamp literal resolves through MONOTONIZED
  * commit timestamps — the start to the EARLIEST commit at-or-after it,
  * the end to the LATEST at-or-before; a missing end means the latest
  * version. The plan is the batched
  * [[graft.log.ChangeDataFeedHelper.readCDF]] (recorded change files +
  * synthesized append/overwrite rows), so every CDF mechanism — including
  * round 16's read-time overwrite synthesis — is reachable from plain SQL.
  */
object GraftTableFunctions {

  /** The `injectTableFunction` descriptions for the session extension. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      (FunctionIdentifier("table_changes"),
        new ExpressionInfo(getClass.getName, "table_changes"),
        (args: Seq[Expression]) => build("table_changes", args, byPath = false)),
      (FunctionIdentifier("table_changes_by_path"),
        new ExpressionInfo(getClass.getName, "table_changes_by_path"),
        (args: Seq[Expression]) => build("table_changes_by_path", args, byPath = true)))

  private def build(fn: String, args: Seq[Expression], byPath: Boolean): LogicalPlan = {
    def bad(msg: String): Nothing = throw new IllegalArgumentException(s"$fn: $msg")
    if (args.size < 2 || args.size > 3)
      bad(s"takes (table, start[, end]), got ${args.size} argument(s)")
    val spark = SparkSession.active
    def evalLit(e: Expression, what: String): Any = {
      if (!e.foldable) bad(s"$what must be a literal, got ${e.sql}")
      val v = e.eval()
      if (v == null) bad(s"$what must not be NULL")
      v
    }
    val ident = evalLit(args(0), "the table argument").toString
    val path =
      if (byPath) ident
      else graft.tables.GraftTable.forName(spark, ident).path
    val log = new graft.tables.GraftLog(path)
    val tz = spark.sessionState.conf.sessionLocalTimeZone
    def bound(e: Expression, what: String, start: Boolean): Long = {
      def fromMillis(millis: Long): Long =
        if (start)
          log.versionAtOrAfter(millis)
            .getOrElse(bad(s"$what is after the latest commit of $path"))
        else
          log.versionAtOrBefore(millis)
            .getOrElse(bad(s"$what is before the earliest commit of $path"))
      val v = evalLit(e, what)
      e.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          v.asInstanceOf[Number].longValue()
        case StringType =>
          fromMillis(graft.sources.GraftDataSource
            .parseTimestampMillis(v.toString.trim, tz))
        case _: TimestampType => fromMillis(v.asInstanceOf[Long] / 1000L)
        case other =>
          bad(s"$what must be a version number or a timestamp, got ${other.sql}")
      }
    }
    val startV = bound(args(1), "the start bound", start = true)
    val endV = args.lift(2).map(bound(_, "the end bound", start = false))
      .getOrElse(log.latestVersion())
    graft.log.ChangeDataFeedHelper(spark, path, startV, endV)
      .readCDF.queryExecution.analyzed
  }
}
