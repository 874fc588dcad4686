package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

/** Driver-side read/write of the PARQUET checkpoint sidecar — the
  * multi-part `<v>.checkpoint.parquet/` directory holding a snapshot's
  * [[AddFile]] actions in columnar form (Delta's parquet checkpoint is the
  * model). Written when `graft.checkpoint.format=parquet`; the metadata /
  * protocol / txn HEAD stays in the small `<v>.checkpoint.json` (O(1)
  * lines), so every head-scanning reader works unchanged.
  *
  * Why parquet for the file actions: at 10⁶ live files a JSON checkpoint
  * is a single ~250 MB object — one unsplittable single-stream PUT on an
  * object store, and planners that need only (path, partitionValues,
  * stats) must still parse every byte. The parquet dir is multi-part
  * (bounded-size objects, parallel PUT/GET) and column-prunable — a
  * planning read deserializes only the columns it projects.
  *
  * This helper is the DRIVER codec (parquet-hadoop's example Group API —
  * already on every Spark classpath); no SparkSession needed, so the
  * commit-cadence auto-checkpoint can produce parquet too. The DISTRIBUTED
  * writer for 10⁶-file tables is [[DistributedSnapshot.writeCheckpoint]],
  * which renders parts on executors; both produce the same layout and both
  * readers (this one and `spark.read.parquet`) accept either, because the
  * schema below is exactly what Spark writes for a Dataset[AddFile].
  */
object CheckpointParquet {

  /** One part per this many AddFiles from the driver writer — bounds part
    * object size (~100 MB of JSON-ish content) for parallel object-store
    * PUT/GET; the distributed writer parts by its shuffle partitioning.
    */
  val RowsPerPart: Int = 500 * 1000

  /** Parquet schema of one AddFile row — field names and standard MAP
    * layout match Spark's output for `Dataset[AddFile]`, so files written
    * by either writer read back through either reader.
    */
  val Schema: MessageType = MessageTypeParser.parseMessageType(
    """message graft_checkpoint_add {
      |  required binary path (UTF8);
      |  optional group partitionValues (MAP) {
      |    repeated group key_value {
      |      required binary key (UTF8);
      |      optional binary value (UTF8);
      |    }
      |  }
      |  required int64 size;
      |  optional binary stats (UTF8);
      |  optional group dv {
      |    optional binary path (UTF8);
      |    optional int64 cardinality;
      |  }
      |}""".stripMargin)

  /** Write `files` as a multi-part parquet dir at `dir` (atomic: parts land
    * in a temp dir, one rename publishes). An EXISTING dir is KEPT as-is:
    * checkpoint content at a version is a pure function of the log at that
    * version (the vacuum horizon rewrite preserves snapshot equivalence),
    * so whoever published first already wrote this logical state — and a
    * delete-then-replace would open a window where a concurrent reader
    * sees the checkpoint's head JSON with its file actions missing
    * (silently wrong snapshot). A dir is only ever visible COMPLETE: it
    * appears via one atomic move of a fully-written temp dir.
    */
  def write(dir: String, files: Seq[AddFile], rowsPerPart: Int = RowsPerPart): Unit = {
    if (Fs.exists(dir)) return
    val tmp = Fs.createTempDir(Fs.parent(dir), "." + Fs.fileName(dir))
    try {
      val conf = if (Fs.isRemote(dir)) Fs.hadoopConf else new Configuration()
      val factory = new SimpleGroupFactory(Schema)
      files.grouped(rowsPerPart).zipWithIndex.foreach { case (chunk, i) =>
        val w = ExampleParquetWriter
          .builder(Fs.toHadoopPath(Fs.child(tmp, f"part-$i%05d.parquet")))
          .withConf(conf)
          .withType(Schema)
          .build()
        try chunk.foreach(a => w.write(toGroup(factory, a)))
        finally w.close()
      }
      try Fs.moveNoReplace(tmp, dir)
      catch {
        // a concurrent writer published the same logical content first
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
    } finally {
      if (Fs.exists(tmp)) Fs.deleteRecursively(tmp)
    }
  }

  /** Read every AddFile row of a checkpoint parquet dir (driver-side; the
    * splittable executor path is `spark.read.parquet` in
    * [[DistributedSnapshot.addFilesDF]]).
    */
  def read(dir: String): Seq[AddFile] = {
    val parts = Fs.listChildNames(dir)
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
      .sorted
      .map(n => Fs.child(dir, n))
    val conf = if (Fs.isRemote(dir)) Fs.hadoopConf else new Configuration()
    parts.flatMap { p =>
      val reader = ParquetReader
        .builder(new GroupReadSupport(), Fs.toHadoopPath(p))
        .withConf(conf)
        .build()
      try Iterator.continually(reader.read()).takeWhile(_ != null)
        .map(fromGroup).toVector
      finally reader.close()
    }
  }

  private def toGroup(f: SimpleGroupFactory, a: AddFile): Group = {
    val g = f.newGroup()
    g.add("path", a.path)
    if (a.partitionValues.nonEmpty) {
      val pv = g.addGroup("partitionValues")
      a.partitionValues.foreach { case (k, v) =>
        val kv = pv.addGroup("key_value")
        kv.add("key", k)
        if (v != null) { kv.add("value", v); () }
      }
    }
    g.add("size", a.size)
    if (a.stats != null) { g.add("stats", a.stats); () }
    a.dv.foreach { d =>
      val dg = g.addGroup("dv")
      dg.add("path", d.path)
      dg.add("cardinality", d.cardinality)
    }
    g
  }

  private def fromGroup(g: Group): AddFile = {
    def has(name: String): Boolean =
      g.getType.containsField(name) && g.getFieldRepetitionCount(name) > 0
    val pv =
      if (has("partitionValues")) {
        val grp = g.getGroup("partitionValues", 0)
        (0 until grp.getFieldRepetitionCount("key_value")).map { i =>
          val kv = grp.getGroup("key_value", i)
          val v =
            if (kv.getFieldRepetitionCount("value") > 0) kv.getString("value", 0)
            else null
          kv.getString("key", 0) -> v
        }.toMap
      } else Map.empty[String, String]
    val dv =
      if (has("dv")) {
        val dg = g.getGroup("dv", 0)
        Some(DvDescriptor(dg.getString("path", 0), dg.getLong("cardinality", 0)))
      } else None
    AddFile(
      g.getString("path", 0),
      pv,
      if (has("size")) g.getLong("size", 0) else 0L,
      if (has("stats")) g.getString("stats", 0) else "",
      dv)
  }
}
