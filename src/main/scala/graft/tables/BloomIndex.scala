package graft.tables

import java.nio.ByteBuffer

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BLOOM-FILTER indexing for point-lookup file skipping — the gap
  * min/max stats cannot cover: when a high-cardinality key is written
  * UNSORTED, every file's [min,max] spans ~the whole key range and a
  * `key = x` lookup scans the entire table; a per-file bloom answers
  * "definitely not in this file" for most files. Same role as Delta's
  * bloom-filter indexes.
  *
  * Opt-in via table property `graft.bloom.columns = "colA,colB"` (integral
  * and string columns; partition columns are excluded — partition pruning
  * is already exact). Filter size per (file, column) is
  * `graft.bloom.bits` (default 2^16 bits = 8 KB ≈ 1% false positives at
  * ~5k distinct values; false positives only COST (a kept file), never
  * lose rows). Building costs one extra scan of the freshly written files
  * per commit — the classic write-amplification/lookup-speed trade, which
  * is why it is opt-in.
  *
  * Storage: filters live in per-commit parquet SIDECARS
  * (`_bloom/<id>/part-*.parquet`, rows `(file, column, bloom)`), written by
  * the same distributed aggregation that builds them — no driver collect,
  * and the commit log carries only the sidecar id per file, so log and
  * checkpoint size are independent of filter width and indexed column
  * count. Probes load a sidecar's rows for the PROBED column lazily (one
  * small filtered read per (sidecar, column), cached driver-side).
  * Sidecars of fully-rewritten files become garbage after OPTIMIZE +
  * vacuum, like the data files they describe; they are metadata-sized and
  * harmless to retain.
  *
  * Hash contract (must agree between the distributed build and the
  * driver-side probe): values are canonicalized first — integrals as LONG,
  * strings as-is — then xxhash64 (seed 42). The build
  * hashes `xxhash64(cast(col as bigint))` / `xxhash64(col)` columns; the
  * probe evaluates the same `XxHash64` expression over the canonical
  * literal.
  */
object BloomIndex {

  val ColumnsProperty = "graft.bloom.columns"
  val BitsProperty = "graft.bloom.bits"
  val DefaultBits = 1 << 16
  val NumHashes = 6
  val SidecarDirName = "_bloom"

  /** Where probes find a table's sidecar blooms (see [[sidecarBlooms]]). */
  final case class ProbeContext(spark: SparkSession, tablePath: String)

  // integral + string only: the other point-lookup types (date/timestamp)
  // would need an ANSI-safe canonical long cast — not worth the edge cases
  private[tables] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case StringType => true
    case _ => false
  }

  /** The configured, supported, non-partition bloom columns of a table —
    * dotted paths address NESTED struct leaves (their point lookups are as
    * bloom-probeable as top-level ones; rename consistency is guaranteed
    * because renaming an indexed path OR any ancestor of one is refused).
    */
  def columnsOf(props: Map[String, String], schema: StructType,
      partCols: Seq[String]): Seq[String] =
    props.get(ColumnsProperty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      .filter(c => ColumnMapping.structLeafChain(schema, c.split('.').toSeq)
        .exists(ch => supported(ch.last.dataType)) && !partCols.contains(c))

  /** Compute per-file blooms for `adds` (one aggregation pass over the
    * freshly written files), write them to a `_bloom/<id>/` parquet sidecar
    * in the SAME distributed job (agg output → parquet, never through the
    * driver), and stamp each file's stats with the sidecar id. No-op unless
    * bloom columns are configured.
    *
    * A file with no sidecar row for a probed column is simply KEPT by
    * probes: that covers zero-row files (no aggregation group — an empty
    * scan is harmless) and any path-matching edge, with no way to wrongly
    * prune live rows. A file written WITHOUT an indexed column (schema-
    * merging append) gets that column's all-zero bloom from the
    * aggregation's null hashes, which is correct: its rows are all-null
    * there and can never satisfy an equality.
    */
  def attach(
      spark: SparkSession,
      tablePath: String,
      adds: Seq[AddFile],
      schema: StructType,
      partCols: Seq[String],
      props: Map[String, String]): Seq[AddFile] = {
    val configured = columnsOf(props, schema, partCols)
    if (configured.isEmpty || adds.isEmpty) return adds
    val bits = props.get(BitsProperty).map(_.trim.toInt).getOrElse(DefaultBits)
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"$BitsProperty must be a power of two >= 64, got $bits")
    // a schema-merging append may not carry every indexed column: files
    // written without one simply get no bloom for it (probes then keep
    // them — conservative), instead of failing the commit on an
    // unresolvable column
    val paths0 = adds.map(a => Fs.child(tablePath, a.path))
    // one relation for the column check AND the aggregation — constructing
    // it twice would re-list and re-read every fresh file's footer
    val newFiles = spark.read.parquet(paths0: _*)
    // the FILES store PHYSICAL names and the probe side keys lookups by
    // the physical path (FileSkipping.statKey) — resolve each configured
    // LOGICAL path to its physical spelling once, read the data through
    // it, and key the sidecar rows by it (identity for unmapped tables).
    // Resolving the logical name directly against the physical layout
    // would silently build nothing for a re-added column (fresh physical
    // name) — or worse, build from a RETIRED physical name that now
    // belongs to a different logical column, with a hash branch chosen
    // from the wrong type: probes would then wrongly prune live rows.
    def phys(c: String): String =
      ColumnMapping.physicalPath(schema, c.split('.').toSeq).getOrElse(c)
    val cols = configured.filter(c =>
      ColumnMapping.structLeafChain(newFiles.schema, phys(c).split('.').toSeq).isDefined)
    if (cols.isEmpty) return adds

    def hashCol(c: String): org.apache.spark.sql.Column =
      ColumnMapping.fieldChain(schema, c.split('.').toSeq).get.last.dataType match {
        case StringType => xxhash64(col(phys(c)))
        case _          => xxhash64(col(phys(c)).cast(LongType))
      }
    // backticked alias: a dotted nested path must stay a literal NAME here,
    // not re-parse as a field access
    def bloomAgg(c: String): org.apache.spark.sql.Column =
      org.apache.spark.sql.graft.SparkBridge.column(
        BloomBuildAgg(org.apache.spark.sql.graft.SparkBridge.expression(hashCol(c)), bits)
          .toAggregateExpression()).as(s"__bloom_$c")

    val perFile = newFiles
      .withColumn("__file", input_file_name())
      .groupBy(col("__file"))
      .agg(bloomAgg(cols.head), cols.tail.map(bloomAgg): _*)
    // one (file, column, bloom) row per filter; `file` keeps the raw
    // input_file_name URI — probes relativize at load time with the same
    // rule the inline format used
    val sidecarId = java.util.UUID.randomUUID().toString
    val sidecarPath = Fs.child(Fs.child(tablePath, SidecarDirName), sidecarId)
    perFile.select(col("__file").as("file"),
        explode(map(cols.flatMap(c => Seq(lit(phys(c)), col(s"`__bloom_$c`"))): _*)))
      .withColumnRenamed("key", "column")
      .withColumnRenamed("value", "bloom")
      // filters are KB-sized rows; a commit's whole sidecar fits one task
      .coalesce(1)
      .write.mode("error").parquet(sidecarPath)
    adds.map { a =>
      GraftLog.parseStats(a.stats) match {
        case Some(st) =>
          a.copy(stats = GraftLog.renderStats(st.copy(bloomSidecar = Some(sidecarId))))
        // no parseable stats to stamp: leave the file untouched (probes
        // keep it — conservative) rather than fabricate a zero-record
        // tight-stats entry the metadata-only COUNT would believe
        case None => a
      }
    }
  }

  /** Sidecar-load cache: (tablePath, sidecarId, column) → relative data-file
    * path → filter words. Entries are immutable once written (sidecars are
    * never modified), so the only policy needed is a size bound — LRU
    * eviction of single entries (access-ordered LinkedHashMap), NOT
    * clear-all: a workload probing more than [[MaxCachedSidecars]]
    * (sidecar, column) pairs must keep its hot sidecars cached instead of
    * re-reading MB-sized parquet on every probe past the bound. All access
    * goes through its monitor; the guarded section is map bookkeeping only
    * (loads happen outside the lock).
    */
  private val sidecarCache =
    new java.util.LinkedHashMap[(String, String, String), Map[String, Array[Long]]](
      64, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, String), Map[String, Array[Long]]]): Boolean =
        size() > MaxCachedSidecars
    }
  private val MaxCachedSidecars = 256

  /** The blooms of sidecar `id` for `column`, keyed by table-relative data
    * file path — one filtered parquet read on first use, cached after.
    * Unreadable/absent sidecars yield an empty map (probes keep every file).
    */
  def sidecarBlooms(ctx: ProbeContext, id: String, column: String): Map[String, Array[Long]] = {
    val key = (ctx.tablePath, id, column)
    val hit = sidecarCache.synchronized(sidecarCache.get(key))
    if (hit != null) return hit
    try {
      val dir = Fs.child(Fs.child(ctx.tablePath, SidecarDirName), id)
      // a MISSING dir is permanent (the sidecar was collected or never
      // landed) — cache the empty answer, or every query re-pays one
      // failed distributed read per candidate file per equality conjunct
      if (!Fs.isDirectory(dir)) {
        sidecarCache.synchronized(sidecarCache.put(key, Map.empty))
        return Map.empty
      }
      val tableUriPath = Fs.toHadoopPath(ctx.tablePath).toUri.getPath
      // match on the decoded TABLE-RELATIVE path — base names alone
      // collide on partitioned tables (one task writing several partition
      // values reuses part-<task>-<jobUUID> under each dir)
      def relative(fileUri: String): String =
        new java.net.URI(fileUri).getPath.stripPrefix(tableUriPath).stripPrefix("/")
      val loaded = ctx.spark.read.parquet(dir.toString)
        .where(col("column") === column)
        .select(col("file"), col("bloom"))
        .collect()
        .map(r => relative(r.getString(0)) -> r.getSeq[Long](1).toArray)
        .toMap
      // only a SUCCESSFUL load is cached: a transient read failure must stay
      // retryable, not become a process-lifetime empty map that silently
      // disables pruning for this sidecar
      sidecarCache.synchronized(sidecarCache.put(key, loaded))
      loaded
    } catch { case scala.util.control.NonFatal(_) => Map.empty }
  }

  /** Set the k double-hashed bits of `hash` in `words`. */
  def add(words: Array[Long], hash: Long): Unit = {
    val numBits = words.length * 64
    val h2 = (hash >>> 32) | 1L // odd ⇒ cycles through all bit positions
    var i = 0
    while (i < NumHashes) {
      val bit = ((hash + i * h2) & Long.MaxValue) % numBits
      words((bit / 64).toInt) |= 1L << (bit % 64)
      i += 1
    }
  }

  /** Conservative membership: false ⇒ definitely absent. */
  def mightContain(words: Array[Long], hash: Long): Boolean = {
    val numBits = words.length * 64
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((hash + i * h2) & Long.MaxValue) % numBits
      if ((words((bit / 64).toInt) & (1L << (bit % 64))) == 0L) return false
      i += 1
    }
    true
  }

  /** The probe-side hash of a canonical predicate value (see hash contract
    * above); None when the type has no bloom canonicalization.
    */
  def hashOfLiteral(v: Any, dt: DataType): Option[Long] = {
    if (v == null) return None
    val lit: Option[Literal] = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(Literal(v.asInstanceOf[Number].longValue(), LongType))
      case StringType => v match {
        case u: UTF8String => Some(Literal(u, StringType))
        case s: String     => Some(Literal(UTF8String.fromString(s), StringType))
        case _             => None
      }
      case _ => None
    }
    lit.map(l => XxHash64(Seq(l), 42L).eval(InternalRow.empty).asInstanceOf[Long])
  }

  def toBase64(words: Array[Long]): String = {
    val bb = ByteBuffer.allocate(words.length * 8)
    words.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def fromBase64(s: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }
}

/** Distributed bloom construction: folds pre-hashed LONG values into a
  * fixed `numBits`-wide bit array per group (one group per file). Buffers
  * are O(numBits) regardless of group size; merge is a word-wise OR.
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomIndex.add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    Array.fill(storageFormat.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_build"
}
