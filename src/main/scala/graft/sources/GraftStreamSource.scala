package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.tables.{AddCDCFile, AddFile, GraftLog, GraftTable, RemoveFile}

/** Streaming SOURCE over a GraftTable: `spark.readStream.format("graft")
  * .load(path)` — the change-data analogue of Delta's streaming source.
  *
  * Offsets are committed table VERSIONS (a `LongOffset` per commit), so the
  * offset log lines up 1:1 with the table's own history: exactly-once replay
  * is inherited from the commit log's immutability — a micro-batch for
  * versions (start, end] always reproduces the same rows, and checkpoint
  * recovery resumes from a version boundary.
  *
  * Batch contents (schema = table schema + `_change_type` + `_commit_version`):
  *  - the INITIAL batch (no `startingVersion` option) is the full snapshot at
  *    the first observed version, as `insert` rows — Delta's default
  *    "current snapshot, then changes" contract;
  *  - with `option("startingVersion", v)` the initial batch replays changes
  *    from version v (inclusive) instead, with no snapshot;
  *  - each subsequent batch is the per-commit change set: CDC files when the
  *    commit wrote them, the commit's added files as `insert` rows for plain
  *    appends, and a LOUD error for a row-removing commit without CDC (the
  *    stream cannot represent it — enable CDF).
  *
  * Scale: a batch reads only the files of its own versions (no table scan
  * after the initial snapshot); the snapshot batch itself plans as the
  * native pinned-file-index parquet scan.
  *
  * Admission control: `option("maxVersionsPerTrigger", n)` (default 100)
  * bounds how many commits one micro-batch may span, and
  * `option("maxBytesPerTrigger", b)` additionally stops offering versions
  * once the batch's admitted data/change file bytes (from commit-log
  * metadata — no filesystem probing) exceed `b`; at least one version is
  * always admitted so the stream cannot stall on a single large commit.
  * Together they are the analogue of Delta's `maxFilesPerTrigger` /
  * `maxBytesPerTrigger`: a stream recovering from downtime drains its
  * backlog in bounded micro-batches instead of one unbounded union (both
  * the analyzer cost and the batch's work are linear in the versions it
  * spans, so the bound is what keeps a 10k-commit gap processable).
  * Exactly-once is unaffected: offsets are still plain versions and a
  * bounded range replays deterministically. The INITIAL snapshot batch is
  * exempt — it is one pinned-version table scan (a single distributed
  * parquet read), not a per-version union. Note the bounds also pace
  * `Trigger.Once`/`AvailableNow` runs: such a run advances at most one
  * batch's worth per invocation.
  */
class GraftStreamSource(
    sqlContext: SQLContext,
    tablePath: String,
    startingVersion: Option[Long],
    maxVersionsPerTrigger: Long = GraftStreamSource.DefaultMaxVersionsPerTrigger,
    maxBytesPerTrigger: Option[Long] = None)
  extends Source {

  require(maxVersionsPerTrigger > 0,
    s"maxVersionsPerTrigger must be positive, got $maxVersionsPerTrigger")
  require(maxBytesPerTrigger.forall(_ > 0),
    s"maxBytesPerTrigger must be positive, got ${maxBytesPerTrigger.get}")

  private val spark = sqlContext.sparkSession
  private val log = new GraftLog(tablePath)
  private def table = GraftTable.forPath(spark, tablePath)

  override val schema: StructType = GraftStreamSource.schemaOf(spark, tablePath)

  /** Highest version this source has already offered (or seen committed via
    * `getBatch` during checkpoint recovery) — the base the per-trigger
    * version budget counts from. `None` until the first offer: the first
    * batch is either the snapshot (one pinned scan, exempt from the bound)
    * or a `startingVersion` replay (bounded from `startingVersion - 1`).
    */
  @volatile private var lastOffered: Option[Long] = None

  override def getOffset: Option[Offset] = {
    if (!log.tableExists) None
    else {
      val head = log.latestVersion()
      val offered = lastOffered match {
        case Some(base) => admitThrough(base, head)
        case None => startingVersion match {
          // first replay batch: budget counts from just before startingVersion
          case Some(sv) => admitThrough(sv - 1, head)
          // snapshot batch: pinned at the current head — one table scan
          case None => head
        }
      }
      lastOffered = Some(lastOffered.fold(offered)(math.max(_, offered)))
      Some(LongOffset(offered))
    }
  }

  /** Highest version to offer after `base`, honoring both trigger budgets:
    * at most `maxVersionsPerTrigger` versions, and (when set) stop once
    * admitted data + change-file bytes exceed `maxBytesPerTrigger` — sizes
    * come from the commit log's AddFile/AddCDCFile metadata, no filesystem
    * probing (change files logged before sizes were recorded count as 0, so
    * delete-heavy backlogs of such logs fall back to the version bound).
    * The FIRST pending version is always admitted, so one oversized commit
    * can never stall the stream.
    */
  private def admitThrough(base: Long, head: Long): Long = {
    val versionCapped = math.min(head, base + maxVersionsPerTrigger)
    maxBytesPerTrigger match {
      case None => versionCapped
      case Some(budget) =>
        var admitted = base
        var bytes = 0L
        val pending = log.versions().filter(v => v > base && v <= versionCapped)
        pending.foreach { v =>
          if (admitted == base || bytes < budget) {
            bytes += log.actionsAt(v).collect {
              case a: AddFile => a.size
              case c: AddCDCFile => c.size
            }.sum
            admitted = v
          }
        }
        if (admitted == base) versionCapped else admitted
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = versionOf(end)
    // checkpoint recovery replays the last uncommitted batch through
    // getBatch BEFORE the next getOffset — record its end so the version
    // budget resumes from the recovered position, not from scratch
    lastOffered = Some(lastOffered.fold(endV)(math.max(_, endV)))
    val out = start match {
      case None =>
        startingVersion match {
          case Some(sv) => changesFor(log.versions().filter(v => v >= sv && v <= endV))
          case None     => snapshotAsInserts(endV)
        }
      case Some(s) =>
        val startV = versionOf(s)
        changesFor(log.versions().filter(v => v > startV && v <= endV))
    }
    val aligned = out.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    org.apache.spark.sql.graft.SparkBridge.streamingDataFrame(
      spark, aligned.queryExecution.toRdd, schema)
  }

  /** Align a per-version frame to the stream schema: a version before a
    * schema-evolving append lacks the later columns — they become typed
    * nulls, exactly what the batch mergeSchema read of those files yields.
    * A column NOT in the stream schema means the table evolved mid-stream
    * (the schema was pinned at source creation) — silently selecting it away
    * would drop data, so fail the query loudly instead; a restart picks up
    * the widened schema (Delta's streaming source fails the same way).
    */
  private def widen(df: DataFrame): DataFrame = {
    val known = schema.fieldNames.toSet
    val extra = df.columns.filterNot(known.contains)
    if (extra.nonEmpty)
      throw new IllegalStateException(
        s"schema of $tablePath changed mid-stream (new columns: ${extra.mkString(", ")}); " +
          "restart the streaming query to pick up the evolved schema")
    val present = df.columns.toSet
    val full = schema.fields.foldLeft(df) { (acc, f) =>
      if (present.contains(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }
    full.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** LongOffset on a live run; a json-serialized offset after checkpoint
    * recovery — both carry the version as their json.
    */
  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case other =>
      try other.json.trim.toLong
      catch {
        case e: NumberFormatException => throw new IllegalStateException(
          s"unreadable graft stream offset '${other.json}' (expected a table " +
            "version number) — the checkpoint offset log may be corrupt or " +
            "written by an incompatible source", e)
      }
  }

  private def snapshotAsInserts(v: Long): DataFrame =
    // through widen(): the table may have gained columns between source
    // creation (schema pinned) and the first trigger — the snapshot path
    // must fail as loudly as the per-version change path does, not silently
    // project the new column away
    widen(table.toDFAt(v)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(v)))

  private def changesFor(versions: Seq[Long]): DataFrame = {
    val frames = versions.flatMap { v =>
      val actions = log.actionsAt(v)
      val cdc = actions.collect { case c: AddCDCFile => c.path }
      val adds = actions.collect { case a: AddFile => a }
      val removes = actions.collect { case r: RemoveFile => r }
      val op = actions.collectFirst { case c: graft.tables.CommitInfo => c.operation }
      if (op.contains("OPTIMIZE")) {
        // layout-only rewrite (compaction / Z-order): rows are unchanged, so
        // the commit contributes nothing to the change stream — the same
        // skip the batch CDF reader applies (Delta: dataChange=false files)
        None
      } else if (cdc.nonEmpty) {
        val paths = cdc.map(p => new java.io.File(tablePath, p).toString)
        Some(widen(spark.read
          .schema(table.snapshotAt(v).schema.add("_change_type", StringType))
          .parquet(paths: _*)
          .withColumn("_commit_version", lit(v))))
      } else if (removes.nonEmpty) {
        // rewriting commit without change files: the stream cannot represent
        // the removed rows — failing loudly beats silently emitting wrong
        // changes (Delta raises the same way for CDF gaps)
        throw new IllegalStateException(
          s"version $v of $tablePath removed files but wrote no change data; " +
            "enable CDF (graft.enableChangeDataFeed) for streamed tables")
      } else if (adds.nonEmpty) {
        // blind append: the added files ARE the change set
        val snap = table.snapshotAt(v)
        Some(widen(table.dfForFiles(snap, adds)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(v))))
      } else None // metadata-only commit
    }
    // batch-shaped here; getBatch re-tags the final frame as streaming
    frames.reduceOption(_ unionByName _).getOrElse(
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

object GraftStreamSource {

  /** Default bound on commits per micro-batch (see class doc). */
  val DefaultMaxVersionsPerTrigger: Long = 100L

  def schemaOf(spark: org.apache.spark.sql.SparkSession, tablePath: String): StructType =
    GraftTable.forPath(spark, tablePath).snapshot.schema
      .add("_change_type", StringType)
      .add("_commit_version", LongType)
}
