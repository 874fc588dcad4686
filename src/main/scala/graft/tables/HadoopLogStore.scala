package graft.tables

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** [[LogStore]] over `org.apache.hadoop.fs.FileSystem`/`FileContext` — the
  * shipped backend for HDFS-shaped deployments (HDFS, ViewFS, ABFS mounts
  * exposed through the Hadoop client), and the automatic route for every
  * remote-scheme table path (`LogStore.forPath`). The conditional put maps
  * onto the filesystem's RENAME-WITHOUT-OVERWRITE:
  *
  *  1. write the full content to a dotted temp object in the target dir;
  *  2. `FileContext.rename(tmp, dst)` with the default `Rename.NONE`
  *     semantics — on HDFS this is an ATOMIC no-overwrite rename inside
  *     the NameNode (exactly Delta's HDFSLogStore primitive), so exactly
  *     one concurrent claimant wins and losers get
  *     `FileAlreadyExistsException`.
  *
  * **Atomicity capability** ([[crossProcessAtomic]]): the no-overwrite
  * rename is atomic on HDFS-protocol filesystems, but NOT on the local
  * filesystem (`file:` — Hadoop's LocalFs implements `Rename.NONE` as a
  * check-then-rename, and POSIX `rename(2)` silently replaces) and not on
  * S3A. Within ONE JVM this store closes that window with a process-wide
  * mutex around the claim — single-process usage (tests, local pipelines)
  * is sound on any scheme. ACROSS processes, correctness requires a scheme
  * whose no-overwrite rename is atomic; constructing a store for
  * cross-process use on a non-atomic scheme is the deployment error this
  * flag makes loud. POSIX multi-writer deployments should use
  * [[PosixLogStore]] (hard-link claims — genuinely atomic cross-process);
  * S3/GCS-shaped multi-writer deployments should bind their SDK's
  * conditional put behind [[ObjectStoreClient]] and register it
  * ([[LogStore.registerObjectStoreScheme]]) — [[ObjectStoreLogStore]]'s
  * claim is arbitrated by the service itself, so `crossProcessAtomic`
  * holds where rename-based claims cannot (see its capability table).
  *
  * Addressing: path strings — remote URIs parse natively, local paths
  * qualify through `file:` (see [[Fs.toHadoopPath]]). The configuration
  * defaults to the active Spark session's Hadoop conf ([[Fs.hadoopConf]]),
  * so `spark.hadoop.fs.*` scheme registrations and credentials apply to
  * the log exactly as they do to Spark's data IO.
  *
  * [[filesystemBacked]] is true: log objects are files Spark's own readers
  * can address by these same path strings, which is all
  * [[DistributedSnapshot]]'s executor folds require — on any scheme the
  * cluster's executors can reach (HDFS/ABFS/S3A are cluster-visible by
  * construction).
  */
class HadoopLogStore(confOverride: Option[Configuration] = None) extends LogStore {

  def this(conf: Configuration) = this(Some(conf))

  private def conf: Configuration = confOverride.getOrElse(Fs.hadoopConf)

  private def hPath(p: String): HPath = Fs.toHadoopPath(p)
  private def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  /** Scheme of the paths this store serves (resolved per path; local
    * `java.nio` paths map to `file`).
    */
  private def schemeOf(p: HPath): String =
    Option(p.toUri.getScheme).getOrElse("file")

  /** Whether the no-overwrite rename is atomic ACROSS processes for
    * `scheme` — the property the whole commit protocol rests on when more
    * than one JVM writes the table.
    */
  def crossProcessAtomic(scheme: String): Boolean =
    HadoopLogStore.AtomicRenameSchemes.contains(scheme.toLowerCase)

  override def list(dir: String): Seq[(String, Long)] = {
    val d = hPath(dir)
    try fs(d).listStatus(d).toSeq.map(st => (st.getPath.getName, st.getLen))
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  override def read(path: String): Seq[String] = {
    val p = hPath(path)
    val in = fs(p).open(p)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      new String(bytes, StandardCharsets.UTF_8).linesIterator.toSeq
    } finally in.close()
  }

  override def exists(path: String): Boolean = {
    val p = hPath(path)
    fs(p).exists(p)
  }

  override def putIfAbsent(path: String, body: Array[Byte]): Unit = {
    val dst = hPath(path)
    val f = fs(dst)
    val tmp = new HPath(dst.getParent, s".${dst.getName}.${UUID.randomUUID()}.tmp")
    // the in-process mutex closes LocalFs's check-then-rename window for
    // same-JVM racers; on HDFS the rename below is the atomic arbiter and
    // the mutex only serializes this process's own claims
    HadoopLogStore.claimLock.synchronized {
      if (f.exists(dst))
        throw new java.nio.file.FileAlreadyExistsException(path)
      val out = f.create(tmp, true)
      try out.write(body) finally out.close()
      try {
        try {
          val fc = FileContext.getFileContext(dst.toUri, conf)
          fc.rename(tmp, dst) // default Rename.NONE: no overwrite
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
            // scheme registered only via fs.<scheme>.impl, with no
            // AbstractFileSystem binding for FileContext (the common shape
            // for third-party connectors). Fall back to FileSystem.rename
            // under the exists pre-check above — same-JVM claims stay
            // arbitrated by the mutex; cross-process atomicity on such a
            // scheme is whatever its rename offers (see crossProcessAtomic)
            if (f.exists(dst))
              throw new java.nio.file.FileAlreadyExistsException(path)
            if (!f.rename(tmp, dst)) {
              // a false rename is AMBIGUOUS on these best-effort schemes: a
              // cross-process loser whose exists() pre-check raced (dst
              // created after the check) gets plain false, and surfacing it
              // as an IOException would read as a commit FAILURE instead of
              // a retryable CONFLICT — re-check and classify
              if (f.exists(dst))
                throw new java.nio.file.FileAlreadyExistsException(path)
              throw new java.io.IOException(
                s"rename $tmp -> $dst failed on ${schemeOf(dst)}")
            }
        }
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(path)
      } finally {
        if (f.exists(tmp)) { f.delete(tmp, false); () }
      }
    }
  }

  override def overwrite(path: String, body: Array[Byte]): Unit = {
    val dst = hPath(path)
    val f = fs(dst)
    val tmp = new HPath(dst.getParent, s".${dst.getName}.${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    try {
      try {
        val fc = FileContext.getFileContext(dst.toUri, conf)
        fc.rename(tmp, dst, Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no AbstractFileSystem binding: delete-then-rename. overwrite()
          // is never used on contended paths (seam contract), so the
          // non-atomic window is acceptable on FileSystem-only schemes
          if (f.exists(dst)) { f.delete(dst, false); () }
          if (!f.rename(tmp, dst))
            throw new java.io.IOException(
              s"rename $tmp -> $dst failed on ${schemeOf(dst)}")
      }
    } finally {
      if (f.exists(tmp)) { f.delete(tmp, false); () }
    }
  }

  override def delete(path: String): Boolean = {
    val p = hPath(path)
    fs(p).delete(p, false)
  }

  override def createDirectories(dir: String): Unit = {
    val d = hPath(dir)
    fs(d).mkdirs(d); ()
  }

  override def filesystemBacked: Boolean = true
}

object HadoopLogStore {
  /** Schemes whose `Rename.NONE` is an atomic server-side operation. */
  val AtomicRenameSchemes: Set[String] =
    Set("hdfs", "viewfs", "webhdfs", "abfs", "abfss")

  /** Process-wide claim mutex (see [[HadoopLogStore.putIfAbsent]]). */
  private[tables] val claimLock = new Object
}
