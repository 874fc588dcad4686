package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot replay and file pruning with the log parsed by EXECUTORS, for
  * tables whose live file set is too large to JSON-parse on the driver.
  *
  * [[GraftLog.snapshot]] folds the whole log (checkpoint + deltas) on the
  * driver — the right call at commit cadence, where the log is
  * metadata-sized relative to the data. But a 100 TB table is ~10^6 live
  * files: its checkpoint alone is a GB of JSON, and a driver that parses a
  * GB per plan is the bottleneck of every query. Here the same fold runs as
  * a Spark job instead:
  *
  *  - the checkpoint parses in parallel tasks (JSON-lines are SPLITTABLE;
  *    a parquet checkpoint dir natively so, and column-prunable) with an
  *    explicit action schema — no inference pass — and its rows NEVER
  *    shuffle: only the post-checkpoint delta actions (O(commits since
  *    checkpoint)) go through the last-action-per-path window, and the
  *    checkpoint inventory is reconciled with one anti-join against the
  *    small touched-path set (broadcast by AQE) — the distributed
  *    equivalent of the driver fold's LinkedHashMap overwrite semantics
  *    at shuffle cost O(delta), not O(live files);
  *  - [[prunedFiles]] then evaluates the SAME per-file skipping predicate
  *    ([[FileSkipping.mightMatch]], shipped to executors with the resolved
  *    conjuncts) before anything is collected — the driver receives only
  *    the files a scan of `condition` actually needs, O(matching), never
  *    O(live files).
  *
  * Driver-side work stays metadata-bounded: listing version file NAMES
  * (O(#versions)), and a prefix-scan of post-checkpoint commit files for
  * metadata updates (no JSON parse of non-metadata lines; the checkpoint's
  * metadata is its first line by [[GraftLog.writeCheckpoint]] construction,
  * read alone).
  */
object DistributedSnapshot {

  private val dvType = StructType(Seq(
    StructField("path", StringType),
    StructField("cardinality", LongType)))

  /** Flat AddFile shape of a parquet checkpoint part — declared on the read
    * so an EMPTY checkpoint dir (live file set empty at a cadence
    * checkpoint, e.g. after a delete-all) folds to an empty frame instead
    * of dying in parquet schema inference.
    */
  private val checkpointPartSchema = StructType(Seq(
    StructField("path", StringType),
    StructField("partitionValues", MapType(StringType, StringType)),
    StructField("size", LongType),
    StructField("stats", StringType),
    StructField("dv", dvType)))

  /** Schema of the add/remove payloads — declared, not inferred, so the
    * read plans in one pass and unknown action keys (metadata, commitInfo,
    * cdc, txn) simply surface as all-null rows to filter. */
  private[tables] val lineSchema = StructType(Seq(
    StructField("add", StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("stats", StringType),
      StructField("dv", dvType)))),
    StructField("remove", StructType(Seq(
      StructField("path", StringType))))))

  /** The live [[AddFile]] set at `version` (default latest) as a DataFrame,
    * log parsed and folded by executors. Columns: path, partitionValues,
    * size, stats, dv — exactly [[AddFile]]'s shape (`.as[AddFile]` works). */
  /** This path deliberately BYPASSES the [[LogStore]] seam: executors read
    * log objects as splittable files through Spark's own readers — any
    * local path or hadoop-FS URI qualifies (the [[graft.tables.Fs]] path
    * strings [[GraftLog.versionFile]] produces address both). Only stores
    * whose objects are not files at all (the in-memory test stores) must
    * use the driver fold instead — fail loudly rather than return an
    * empty/false file set.
    */
  private def requireFilesystemLog(log: GraftLog): Unit =
    require(log.store.filesystemBacked,
      s"DistributedSnapshot requires a file-addressable log store for " +
        s"${log.tablePath}: executors read log objects directly — use " +
        "GraftLog.snapshot (driver fold) on this store")

  def addFilesDF(spark: SparkSession, tablePath: String,
      version: Long = -1L): DataFrame = {
    val log = new GraftLog(tablePath)
    requireFilesystemLog(log)
    val vs = log.versions()
    require(vs.nonEmpty, s"$tablePath is not a GraftTable (empty log)")
    val target = if (version < 0) vs.last else version
    require(vs.contains(target),
      s"version $target does not exist for $tablePath (have ${vs.headOption}..${vs.lastOption})")
    // the same reader-feature gate GraftLog.snapshot applies — this is the
    // designated large-table read path, and unknown features would make the
    // returned file set silently wrong (protocol lines parse to null rows
    // in the executor fold and vanish without this check)
    gatedProtocolAt(log, target)
    val ckpt = log.checkpointVersions().filter(_ <= target).lastOption
    val deltaFiles = vs.filter(v => v <= target && ckpt.forall(v > _))
      .map(v => log.versionFile(v))

    def jsonFrame(sources: Seq[String]) =
      spark.read.schema(lineSchema).json(sources: _*)
        .withColumn("__v",
          regexp_extract(input_file_name(), "(\\d+)(?:\\.checkpoint)?\\.json$", 1)
            .cast("long"))

    // fold the DELTAS alone — newest action per path wins, matching the
    // driver fold's overwrite semantics. Within ONE version a path can
    // carry BOTH a remove and a re-add (the deletion-vector remove+add
    // shape) — the commit line order puts re-adds after removes
    // (TableWriter: `... ++ removes ++ cdc ++ extraActions`), so the add
    // is the in-version winner: tie-break adds first. A net-removal never
    // co-exists with an add of the same path in one commit. The window
    // shuffle covers only O(actions since checkpoint) rows — the
    // 10⁶-file checkpoint inventory must NEVER pass through a shuffle to
    // answer "what is live".
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__path"))
      .orderBy(col("__v").desc, col("add").isNotNull.desc)
    def foldLastWins(df: DataFrame): DataFrame = df
      .filter(col("add").isNotNull || col("remove").isNotNull)
      .withColumn("__path", coalesce(col("add.path"), col("remove.path")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)

    // the checkpoint frame, flat AddFile columns, from exactly ONE source
    // (the driver fold's format disambiguation, content-first): a head
    // carrying adds is the JSON checkpoint — any dir alongside is ignored,
    // reading both would duplicate every file; an add-less parquet-format
    // head requires its dir LOUDLY (a reader racing a checkpoint deletion
    // must fail, not silently fold a tiny subset). The parquet dir is
    // column-prunable, so a projection of (path, size) never deserializes
    // stats bytes. Paths are unique within a checkpoint by construction:
    // no dedup, no shuffle.
    val ckptFlat: Option[DataFrame] = ckpt.map { cv =>
      if (log.checkpointIsParquetFormat(cv)) {
        val pdir = log.checkpointParquetDir(cv)
        if (!Fs.isDirectory(pdir))
          throw new IllegalStateException(
            s"checkpoint $cv of $tablePath is parquet-format but its file-actions " +
              s"dir sidecar (${Fs.fileName(pdir)}) is missing — deleted concurrently; " +
              "retry, or restore/rewrite the checkpoint")
        spark.read.schema(checkpointPartSchema).parquet(pdir).select(
          col("path"),
          // absent map (a part written with no partition entries) must
          // surface as the driver fold's Map.empty, not null
          coalesce(col("partitionValues"),
            map().cast(MapType(StringType, StringType))).as("partitionValues"),
          col("size"),
          col("stats"),
          col("dv"))
      } else
        jsonFrame(Seq(log.checkpointFile(cv)))
          .filter(col("add").isNotNull).select("add.*")
    }

    (ckptFlat, deltaFiles) match {
      case (Some(c), Nil) => c
      case (None, ds) => foldLastWins(jsonFrame(ds))
        .filter(col("add").isNotNull).select("add.*")
      case (Some(c), ds) =>
        // checkpoint rows pass through un-shuffled; any path the deltas
        // touched (re-added, removed, or dv-rewritten) is overridden via
        // an anti-join on the O(delta) touched set (AQE broadcasts it),
        // then the deltas' surviving adds append
        val deltaLast = foldLastWins(jsonFrame(ds))
        val touched = deltaLast.select(col("__path").as("path")).distinct()
        c.join(touched, Seq("path"), "left_anti")
          .unionByName(deltaLast.filter(col("add").isNotNull).select("add.*"))
    }
  }

  /** [[addFilesDF]] collected as typed actions (driver holds O(live files);
    * prefer [[prunedFiles]] when a predicate is in hand). */
  def addFiles(spark: SparkSession, tablePath: String,
      version: Long = -1L): Seq[AddFile] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
    addFilesDF(spark, tablePath, version).as[AddFile].collect().toSeq
  }

  /** Live files that MIGHT satisfy `condition` at `version`, with the
    * min/max + partition + contradiction skipping logic evaluated on
    * EXECUTORS — the driver collects only survivors. Semantics match
    * `FileSkipping.filesMatching(snapshot, classified.all, None)` (bloom
    * probes stay a driver-path feature: sidecar loads are lazy per-file
    * reads that would fan out badly from executor tasks). */
  def prunedFiles(spark: SparkSession, tablePath: String, condition: String,
      version: Long = -1L): Seq[AddFile] = {
    val log = new GraftLog(tablePath)
    requireFilesystemLog(log)
    val vs = log.versions()
    require(vs.nonEmpty, s"$tablePath is not a GraftTable (empty log)")
    val target = if (version < 0) vs.last else version
    val meta: graft.tables.Metadata = metadataAt(log, target)
    val schema = DataType.fromJson(meta.schemaJson).asInstanceOf[StructType]
    val partCols = meta.partitionColumns.toSet

    val emptyDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val classified = FileSkipping.classify(spark, emptyDf, condition)
    require(classified.unresolvedColumns.isEmpty,
      s"condition references unknown columns: ${classified.unresolvedColumns.mkString(", ")}")
    val preds = classified.all
    // provably-empty range intersection: zero files, no job at all (same
    // short-circuit as the driver path's filesMatching)
    if (FileSkipping.contradictory(preds, schema)) return Nil

    implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
    filterByStats(addFilesDF(spark, tablePath, target).as[AddFile],
      preds, schema, partCols).collect().toSeq
  }

  /** Write the checkpoint sidecar for `version` (default latest) with the
    * file actions rendered by EXECUTORS — the distributed complement of
    * [[GraftLog.writeCheckpoint]], whose driver fold + serialization is
    * O(live files) memory and CPU. Here:
    *
    *  - the live file set comes from [[addFilesDF]] (executor log fold);
    *  - each [[AddFile]] renders to its log line via `mapPartitions` over
    *    [[GraftLog.renderAction]] — byte-identical to the driver writer —
    *    and lands as text parts in a scratch dir;
    *  - the driver then assembles `<v>.checkpoint.json` by STREAM-COPYING
    *    part bytes after the metadata + txn head lines (bounded memory, no
    *    parse), and publishes it with an atomic rename.
    *
    * The resulting sidecar is format-identical to the driver writer's, so
    * every existing reader (driver snapshot fold, [[addFilesDF]], vacuum,
    * CDF) works unchanged. */
  def writeCheckpoint(spark: SparkSession, tablePath: String,
      version: Long = -1L): Unit = {
    val log = new GraftLog(tablePath)
    requireFilesystemLog(log)
    val vs = log.versions()
    require(vs.nonEmpty, s"$tablePath is not a GraftTable (empty log)")
    val target = if (version < 0) vs.last else version
    val meta: graft.tables.Metadata = metadataAt(log, target)
    val proto = protocolAt(log, target)
    val txns = transactionsAt(log, target)
    val head = (Seq[Action](meta, proto) ++
      txns.toSeq.sortBy(_._1).map { case (a, v) => SetTransaction(a, v) })
      .map(GraftLog.renderAction).mkString("", "\n", "\n")
    val parquetFmt = meta.properties
      .get(GraftLog.CheckpointFormatProperty).exists(_.equalsIgnoreCase("parquet"))

    implicit val strEnc = org.apache.spark.sql.Encoders.STRING
    implicit val addEnc = org.apache.spark.sql.Encoders.product[AddFile]
    val scratch = Fs.createTempDir(log.logDir, s".ckpt$target")
    val partsDir = Fs.child(scratch, "parts")
    try {
      if (parquetFmt) {
        // parquet format: executors write the columnar parts directly
        // (multi-part by shuffle partitioning — the object-store-friendly
        // shape); the dir publishes with one atomic rename, THEN the O(1)
        // JSON head lands, so the checkpoint is never visible before its
        // file actions are. An existing dir is KEPT — same first-writer-
        // wins rule (and reader-visibility argument) as
        // [[CheckpointParquet.write]]: content at a version is
        // deterministic, and delete-then-replace would expose a
        // missing-file-actions window to concurrent readers
        val pdir = log.checkpointParquetDir(target)
        if (!Fs.exists(pdir)) {
          addFilesDF(spark, tablePath, target).as[AddFile].toDF()
            .write.parquet(partsDir)
          Fs.deleteIfExists(Fs.child(partsDir, "_SUCCESS"))
          try Fs.moveNoReplace(partsDir, pdir)
          catch {
            case _: java.nio.file.FileAlreadyExistsException => ()
          }
        }
        log.store.overwrite(log.checkpointFile(target),
          head.getBytes(StandardCharsets.UTF_8))
      } else {
        addFilesDF(spark, tablePath, target).as[AddFile]
          .mapPartitions(_.map(a => GraftLog.renderAction(a: Action)))
          .write.text(partsDir)

        // assemble head + part bytes in the scratch dir, then publish with
        // one atomic replace through the log store
        val tmp = Fs.child(scratch, s".ckpt$target.json.tmp")
        val out =
          if (Fs.isRemote(tmp))
            Fs.toHadoopPath(tmp).getFileSystem(Fs.hadoopConf)
              .create(Fs.toHadoopPath(tmp), true)
          else Files.newOutputStream(java.nio.file.Paths.get(tmp))
        try {
          out.write(head.getBytes(StandardCharsets.UTF_8))
          Fs.listChildNames(partsDir)
            .filter(_.startsWith("part-")).sorted
            .foreach { n =>
              val part = Fs.child(partsDir, n)
              if (Fs.isRemote(part)) {
                val in = Fs.toHadoopPath(part).getFileSystem(Fs.hadoopConf)
                  .open(Fs.toHadoopPath(part))
                try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, false)
                finally in.close()
              } else
                Files.copy(java.nio.file.Paths.get(part), out)
            }
        } finally out.close()
        Fs.moveReplace(tmp, log.checkpointFile(target))
      }
    } finally {
      if (Fs.exists(scratch)) Fs.deleteRecursively(scratch)
    }
  }

  /** [[prunedFiles]] with the conjuncts ALREADY resolved and the head in
    * hand — the DML planning shape (delete/update/replaceWhere classify
    * against the table's own frame first). Same executor-side skipping,
    * same conservative semantics, driver collects only candidates; bloom
    * probes stay a driver-path feature (per-file sidecar loads fan out
    * badly from tasks — min/max + partition pruning carry the lazy path).
    */
  private[graft] def prunedFilesByExprs(
      spark: SparkSession,
      tablePath: String,
      head: Snapshot,
      preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[AddFile] = {
    if (FileSkipping.contradictory(preds, head.schema)) return Nil
    implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
    filterByStats(addFilesDF(spark, tablePath, head.version).as[AddFile],
      preds, head.schema, head.metadata.partitionColumns.toSet).collect().toSeq
  }

  /** THE executor-side stats-skipping filter — one definition shared by
    * [[prunedFiles]], [[prunedFilesByExprs]] and
    * [[graft.sources.LazyFileIndex.listFiles]], so a semantics change to
    * skipping applies to every Dataset-backed consumer at once. Same
    * conservative `mightMatch` the driver path evaluates; bloom probes
    * stay driver-path-only.
    */
  private[graft] def filterByStats(
      files: Dataset[AddFile],
      preds: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      schema: StructType,
      partCols: Set[String]): Dataset[AddFile] =
    if (preds.isEmpty) files
    else files.filter { (f: AddFile) =>
      val stats = GraftLog.parseStats(f.stats)
      preds.forall(p =>
        FileSkipping.mightMatch(p, f, stats, schema, partCols, None))
    }

  /** The snapshot HEAD at `target` — version, metadata, protocol and txn
    * watermarks with `files = Nil` — via the prefix scans, never folding
    * the file actions. The entry point of the Dataset-backed read path:
    * at 10⁶–10⁷ live files the full driver fold is 0.5–5 GB of heap and
    * O(files) CPU per plan, while everything a PLAN needs besides the
    * file list (schema, partition columns, properties, feature gates) is
    * O(head lines). Applies the same reader-feature gate as the driver
    * fold — a head consumer is still a reader.
    */
  private[graft] def snapshotHead(log: GraftLog, target: Long): Snapshot =
    Snapshot(target, metadataAt(log, target), Nil,
      transactionsAt(log, target), gatedProtocolAt(log, target))

  /** [[protocolAt]] behind THE reader-feature gate every head consumer
    * must pass (a head consumer is still a reader) — one definition, used
    * by [[addFilesDF]] and [[snapshotHead]] so the gate cannot diverge.
    */
  private def gatedProtocolAt(log: GraftLog, target: Long): graft.tables.Protocol = {
    val proto = protocolAt(log, target)
    val unknownReader = proto.readerFeatures.filterNot(GraftLog.SupportedReaderFeatures)
    if (unknownReader.nonEmpty)
      throw new IllegalStateException(
        s"${log.tablePath} requires reader feature(s) ${unknownReader.mkString(", ")} this " +
          "build does not implement; upgrade the library to read this table")
    proto
  }

  /** Conservative MINIMUM bytes one rendered `{"add":...}` log line can
    * occupy — the byte pre-gate divisor for [[exceedsFileLimit]]. Real
    * lines (path + size + stats JSON) run 200–1000 bytes; 64 makes the
    * pre-gate strictly safe: a log under `limit * 64` bytes CANNOT hold
    * `limit` add lines.
    */
  private val MinAddLineBytes = 64L

  /** Whether the live file set at `target` exceeds `limit` files — WITHOUT
    * a snapshot fold. Three tiers, cheapest first:
    *
    *  1. byte pre-gate: if checkpoint + post-checkpoint delta bytes total
    *     under `limit * MinAddLineBytes`, the answer is NO from the dir
    *     listing alone (small tables — the overwhelmingly common case —
    *     pay only O(#versions) stat calls they already paid to list);
    *  2. parquet checkpoint: live count from part FOOTERS (row counts are
    *     footer metadata — O(parts) opens, zero data read);
    *  3. JSON checkpoint / deltas: prefix-count `{"add"` lines with EARLY
    *     EXIT at `limit + 1` — no JSON parse, bounded read.
    *
    * The count is an UPPER bound (delta adds may re-add checkpointed paths
    * or be net-removed) — over-estimating only moves a borderline table
    * onto the Dataset-backed path, which stays correct.
    */
  /** Memo for [[exceedsFileLimit]]: the live file count at a COMMITTED
    * version never changes (a later checkpoint changes the computation's
    * cost, not its answer), so the verdict is a pure function of
    * (table, version, limit). Without this, a mid-size table whose JSON
    * checkpoint exceeds the byte pre-gate but whose count stays under the
    * limit re-reads its whole checkpoint on EVERY plan/DML — hundreds of
    * ms of log IO per statement. Cleared wholesale at a size bound (no
    * LRU bookkeeping; re-deriving a verdict is cheap relative to
    * tracking recency).
    */
  private val limitVerdicts =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), java.lang.Boolean]()

  private[graft] def exceedsFileLimit(log: GraftLog, target: Long, limit: Long): Boolean = {
    if (!log.store.filesystemBacked) return false // lazy path needs executor-readable logs
    val key = (log.tablePath, target, limit)
    val memo = limitVerdicts.get(key) // boxed: null = miss (a bare Boolean would unbox null to false)
    if (memo != null) return memo.booleanValue()
    val verdict = computeExceedsFileLimit(log, target, limit)
    if (limitVerdicts.size > 4096) limitVerdicts.clear()
    limitVerdicts.put(key, java.lang.Boolean.valueOf(verdict))
    verdict
  }

  private def computeExceedsFileLimit(log: GraftLog, target: Long, limit: Long): Boolean = {
    val listing = log.store.list(log.logDir) // ONE listing carries every size
    val sizes = listing.toMap
    val ckpt = listing.collect {
      case (n, _) if n.matches("\\d+\\.checkpoint\\.json") =>
        n.stripSuffix(".checkpoint.json").toLong
    }.filter(_ <= target).sorted.lastOption
    val deltaVs = listing.collect {
      case (n, s) if s > 0L && n.matches("\\d+\\.json") => n.stripSuffix(".json").toLong
    }.filter(v => v <= target && ckpt.forall(v > _)).sorted
    val deltaBytes = deltaVs.map(v => sizes.getOrElse(f"$v%020d.json", 0L)).sum
    // saturating gate: limit * MinAddLineBytes overflows for sentinel
    // limits (Long.MaxValue disables the lazy path), and a negative gate
    // would silently skip the pre-gate and line-scan every read
    val byteGate =
      if (limit > Long.MaxValue / MinAddLineBytes) Long.MaxValue
      else limit * MinAddLineBytes

    var count = 0L
    def countAdds(path: String): Unit =
      if (count <= limit) Fs.scanLines(path) { lines =>
        while (count <= limit && lines.hasNext) {
          if (lines.next().startsWith("{\"add\"")) count += 1
        }
      }
    ckpt match {
      case Some(cv) if log.checkpointIsParquetFormat(cv) =>
        // tier 2: exact live count at the checkpoint from part FOOTERS
        // (O(parts) opens, zero data read; no byte pre-gate here — parquet
        // compresses paths too well for a safe bytes-per-row divisor, and
        // a parquet checkpoint already marks the large-table configuration)
        val pdir = log.checkpointParquetDir(cv)
        if (Fs.isDirectory(pdir)) count += parquetRowCount(pdir)
        else countAdds(log.checkpointFile(cv)) // self-contained fallback head
      case Some(cv) =>
        // tier 1 pre-gate, then tier 3: prefix-count `{"add"` lines with
        // early exit — no JSON parse, bounded read
        val headBytes = sizes.getOrElse(f"$cv%020d.checkpoint.json", 0L)
        if (headBytes + deltaBytes < byteGate) return false
        countAdds(log.checkpointFile(cv))
      case None =>
        if (deltaBytes < byteGate) return false
    }
    if (count > limit) return true
    // remaining deltas cannot push past the limit → done without reading them
    if (count + deltaBytes / MinAddLineBytes <= limit) return false
    deltaVs.foreach(v => countAdds(log.versionFile(v)))
    count > limit
  }

  /** Total row count of a parquet dir from part footers alone. */
  private def parquetRowCount(dir: String): Long =
    Fs.listChildNames(dir).filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .map { n =>
        val p = Fs.toHadoopPath(Fs.child(dir, n))
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, Fs.hadoopConf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum

  /** appId → newest version watermark in effect at `target`: same
    * prefix-scan strategy as [[metadataAt]] (`{"txn"` lines only),
    * last-wins in (checkpoint, version, line) order like the driver fold. */
  private[graft] def transactionsAt(log: GraftLog, target: Long): Map[String, Long] = {
    val txns = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def scan(path: String): Unit =
      Fs.scanLines(path)(_.filter(_.startsWith("{\"txn\"")).foreach { line =>
        val t = GraftLog.parseAction(line).asInstanceOf[SetTransaction]
        txns(t.appId) = t.version
      })
    val ckpt = log.checkpointVersions().filter(_ <= target).lastOption
    ckpt.foreach(cv => scan(log.checkpointFile(cv)))
    log.versions().filter(v => v <= target && ckpt.forall(v > _))
      .foreach(v => scan(log.versionFile(v)))
    txns.toMap
  }

  /** Metadata in effect at `target`, without JSON-parsing any data-file
    * lines: the newest checkpoint's metadata is its FIRST line (read
    * alone); later commit files are prefix-scanned (`{"metadata"`) and only
    * matching lines parse. */
  private[graft] def metadataAt(log: GraftLog, target: Long): graft.tables.Metadata = {
    var meta: graft.tables.Metadata = null
    val ckpt = log.checkpointVersions().filter(_ <= target).lastOption
    ckpt.foreach { cv =>
      Fs.scanLines(log.checkpointFile(cv)) { lines =>
        lines.nextOption().foreach { first =>
          if (first.startsWith("{\"metadata\""))
            meta = GraftLog.parseAction(first).asInstanceOf[graft.tables.Metadata]
        }
      }
    }
    log.versions().filter(v => v <= target && ckpt.forall(v > _)).foreach { v =>
      Fs.scanLines(log.versionFile(v))(_.filter(_.startsWith("{\"metadata\"")).foreach {
        line => meta = GraftLog.parseAction(line).asInstanceOf[graft.tables.Metadata]
      })
    }
    require(meta != null, s"no metadata action found in log of ${log.tablePath}")
    meta
  }

  /** Last protocol action at-or-before `target` (default baseline when the
    * log predates the protocol vocabulary) — same single-field line scan as
    * [[metadataAt]], no full snapshot fold.
    */
  private[graft] def protocolAt(log: GraftLog, target: Long): graft.tables.Protocol = {
    var proto: graft.tables.Protocol = graft.tables.Protocol()
    val ckpt = log.checkpointVersions().filter(_ <= target).lastOption
    ckpt.foreach { cv =>
      Fs.scanLines(log.checkpointFile(cv))(_.filter(_.startsWith("{\"protocol\"")).foreach {
        line => proto = GraftLog.parseAction(line).asInstanceOf[graft.tables.Protocol]
      })
    }
    log.versions().filter(v => v <= target && ckpt.forall(v > _)).foreach { v =>
      Fs.scanLines(log.versionFile(v))(_.filter(_.startsWith("{\"protocol\"")).foreach {
        line => proto = GraftLog.parseAction(line).asInstanceOf[graft.tables.Protocol]
      })
    }
    proto
  }
}
