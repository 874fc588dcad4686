package graft.tools

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A REMOTE-scheme Hadoop filesystem for URI-table validation: `faux://`
  * delegates to the local filesystem but is, from graft's and Spark's point
  * of view, a fully foreign scheme — it exercises every code path a real
  * `hdfs://`/`abfs://` deployment would (HadoopLogStore log IO, hadoop-fs
  * staging moves, URI-addressed scans, executor-side reads) without needing
  * a cluster in the test container. Registered via `spark.hadoop.fs.faux.impl` exactly how a production
  * custom scheme is; used by UriTableSpec and the s42 gate query. Lives in
  * `graft.tools` (like the OCC race drivers) so validation mains that run
  * on the compile classpath can exercise remote-scheme storage too.
  *
  * Statuses are rewrapped with EAGER permissions: RawLocalFileSystem's lazy
  * permission loader does `new java.io.File(path.toUri)`, which rejects any
  * non-`file` scheme — a quirk of borrowing the local FS for a foreign
  * scheme, not something a real remote FS has.
  */
class FauxFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faux"
  override def getUri: URI = URI.create("faux:///")

  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
      "faux", "faux", st.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

/** The `FileContext` binding for the same scheme
  * (`fs.AbstractFileSystem.faux.impl`) — HadoopLogStore's conditional put
  * renames through FileContext, which resolves its own registry.
  */
class FauxAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new FauxFileSystem, conf, "faux", false)
