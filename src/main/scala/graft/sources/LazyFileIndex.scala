package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, BoundReference, Cast, Expression, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.tables.{AddFile, DistributedSnapshot, FileSkipping, GraftLog, GraftTable, Snapshot}

/** Dataset-backed [[FileIndex]] for tables whose LIVE FILE SET is too large
  * to hold on the driver — the read-path complement of
  * [[graft.tables.DistributedSnapshot]].
  *
  * The default index ([[GraftFileIndex]]) walks a driver-resident
  * `Seq[AddFile]` per `listFiles` — the right call below
  * `spark.graft.snapshot.driverFileLimit` (default 100k files), where the
  * walk is microseconds. At 10⁶–10⁷ files (a 100 TB table) that Seq is
  * 0.5–5 GB of driver heap and O(files) driver CPU per QUERY. Here the
  * file inventory stays a Dataset over the checkpoint parquet + log deltas
  * ([[DistributedSnapshot.addFilesDF]] — checkpoint rows never shuffle),
  * and `listFiles` evaluates BOTH prunings on executors:
  *
  *  - partition filters EXACTLY (`Predicate.create` over partition values,
  *    bound by name — Spark removes pushed partition filters from the
  *    post-scan Filter, so exactness is a correctness requirement, same
  *    contract as [[GraftFileIndex.listFiles]]);
  *  - data filters conservatively via per-file stats
  *    ([[FileSkipping.mightMatch]] with the resolved conjuncts shipped in
  *    the task closure — the same semantics as the driver path, minus
  *    bloom probes, which stay a driver-path feature).
  *
  * The driver then collects ONLY the survivors — O(matching files), never
  * O(live files). A point query on a 10⁷-file table plans from a handful
  * of collected entries (Delta's `Snapshot.allFiles`-as-Dataset posture).
  *
  * ALWAYS version-pinned. Two reasons: (a) the deletion-vector invariant —
  * the builder ([[graft.tables.GraftTable.lazyReadDF]]) splits dv-carrying
  * files onto the masked leg at ONE version, and a log-following clean leg
  * could drift to a version whose new DVs it would silently drop; (b) each
  * new query re-resolves the version anyway (the scan rewrite runs per
  * query), so only an explicitly cached DataFrame pins — the same
  * snapshot-at-DataFrame-creation semantics Delta gives. `refresh()` is
  * therefore a no-op, like a pinned [[GraftFileIndex]].
  */
class LazyFileIndex(
    @transient private val spark: SparkSession,
    val tablePath: String,
    override val partitionSchema: StructType,
    val version: Long,
    private[sources] val head: Snapshot)
  extends FileIndex {

  private val sessionTz = spark.sessionState.conf.sessionLocalTimeZone
  private val caseSensitive = spark.sessionState.conf.caseSensitiveAnalysis
  private val tableSchema = head.schema
  private val partCols = head.metadata.partitionColumns.toSet

  override def rootPaths: Seq[Path] = Seq(graft.tables.Fs.toHadoopPath(tablePath))

  override def refresh(): Unit = () // version-pinned by design (see class doc)

  /** One agg job, cached — planning consults sizeInBytes for join-strategy
    * decisions; a table on this index is far past every broadcast
    * threshold anyway, so a cached exact sum is plenty.
    */
  override lazy val sizeInBytes: Long = {
    val r = filesDS().agg(org.apache.spark.sql.functions.sum("size")).first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** O(live files) STRINGS on the driver — only the `df.inputFiles`
    * API pays it, on demand; planning never calls this.
    */
  override def inputFiles: Array[String] =
    filesDS().select("path").as(org.apache.spark.sql.Encoders.STRING)
      .collect()
      .map(p => graft.tables.Fs.toUriString(GraftTable.resolveDataPath(tablePath, p)))

  private def filesDS(): org.apache.spark.sql.Dataset[AddFile] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
    DistributedSnapshot.addFilesDF(spark, tablePath, version).as[AddFile]
  }

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // provably-empty range intersection: zero files, no job at all (the
    // same short-circuit as the driver path's filesMatching)
    if (FileSkipping.contradictory(dataFilters, tableSchema))
      return Nil
    // bind partition filters on the DRIVER (loud on an unmatched attribute,
    // same invariant as GraftFileIndex.partitionPredicate); the executor
    // side only instantiates the predicate
    val boundPart: Option[Expression] =
      if (partitionFilters.isEmpty) None
      else {
        val pSchema = partitionSchema
        val cs = caseSensitive
        def bind(e: Expression): Expression = e.transform {
          case a: AttributeReference =>
            val i = pSchema.fields.indexWhere(f =>
              if (cs) f.name == a.name else f.name.equalsIgnoreCase(a.name))
            if (i < 0) throw new IllegalStateException(
              s"partition filter references non-partition column ${a.name}")
            BoundReference(i, pSchema.fields(i).dataType, nullable = true)
        }
        Some(partitionFilters.map(bind).reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _)))
      }

    val preds = dataFilters
    val schema = tableSchema
    val pCols = partCols
    val pSchema = partitionSchema
    val tz = sessionTz
    implicit val enc = org.apache.spark.sql.Encoders.product[AddFile]
    val survivors: Array[AddFile] = filesDS().mapPartitions { it =>
      val partPred = boundPart.map { e =>
        val p = Predicate.create(e); p.initialize(0); p
      }
      it.filter { f =>
        // dv-carrying files belong to the builder's masked leg (split out
        // at this same pinned version) — never to the plain scan
        !f.dv.exists(_.cardinality > 0) &&
          partPred.forall(_.eval(LazyFileIndex.partitionRow(f, pSchema, tz))) && {
            val stats = GraftLog.parseStats(f.stats)
            preds.forall(p =>
              FileSkipping.mightMatch(p, f, stats, schema, pCols, None))
          }
      }
    }.collect()

    survivors.groupBy(_.partitionValues).iterator.map { case (_, files) =>
      PartitionDirectory(
        LazyFileIndex.partitionRow(files.head, partitionSchema, sessionTz),
        files.map(fileStatus))
    }.toSeq
  }

  private def fileStatus(f: AddFile): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, 0L,
      graft.tables.Fs.toHadoopPath(GraftTable.resolveDataPath(tablePath, f.path)))
}

object LazyFileIndex {

  /** Typed InternalRow of one file's partition values — the same
    * interpretation as [[GraftFileIndex.partitionRow]] (physical-name
    * keys, `__HIVE_DEFAULT_PARTITION__` → null, strings cast as partition
    * inference would), runnable on EXECUTORS.
    */
  private[sources] def partitionRow(
      f: AddFile, partitionSchema: StructType, sessionTz: String): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { field =>
      f.partitionValues.get(graft.tables.ColumnMapping.physicalName(field)) match {
        case None | Some(graft.tables.TableWriter.HiveDefaultPartition) => null
        case Some(raw) =>
          Cast(Literal(raw), field.dataType, Option(sessionTz)).eval(InternalRow.empty)
      }
    })
}
