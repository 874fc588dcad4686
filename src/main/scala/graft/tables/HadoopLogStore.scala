package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Path => JPath}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** [[LogStore]] over `org.apache.hadoop.fs.FileSystem`/`FileContext` — the
  * shipped backend for HDFS-shaped deployments (HDFS, ViewFS, ABFS mounts
  * exposed through the Hadoop client), where the conditional put maps onto
  * the filesystem's RENAME-WITHOUT-OVERWRITE:
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
  * [[PosixLogStore]] (hard-link claims — genuinely atomic cross-process).
  *
  * [[filesystemBacked]] is true only for the LOCAL scheme: GraftLog's
  * fast head-scans and [[DistributedSnapshot]]'s executor folds read log
  * objects as `java.nio` files. A remote-scheme deployment keeps the
  * driver fold (the log is metadata-sized) — wiring the executor fold to
  * remote schemes means teaching those paths `hadoop.fs` IO, a named
  * horizon item, not a silent degradation.
  */
class HadoopLogStore(conf: Configuration) extends LogStore {

  private def hPath(p: JPath): HPath = new HPath(p.toUri)
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

  override def list(dir: JPath): Seq[(String, Long)] = {
    val d = hPath(dir)
    try fs(d).listStatus(d).toSeq.map(st => (st.getPath.getName, st.getLen))
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  override def read(path: JPath): Seq[String] = {
    val p = hPath(path)
    val in = fs(p).open(p)
    try {
      val bytes = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
      new String(bytes, StandardCharsets.UTF_8).linesIterator.toSeq
    } finally in.close()
  }

  override def exists(path: JPath): Boolean = {
    val p = hPath(path)
    fs(p).exists(p)
  }

  override def putIfAbsent(path: JPath, body: Array[Byte]): Unit = {
    val dst = hPath(path)
    val f = fs(dst)
    val tmp = new HPath(dst.getParent, s".${dst.getName}.${UUID.randomUUID()}.tmp")
    // the in-process mutex closes LocalFs's check-then-rename window for
    // same-JVM racers; on HDFS the rename below is the atomic arbiter and
    // the mutex only serializes this process's own claims
    HadoopLogStore.claimLock.synchronized {
      if (f.exists(dst))
        throw new java.nio.file.FileAlreadyExistsException(path.toString)
      val out = f.create(tmp, true)
      try out.write(body) finally out.close()
      try {
        val fc = FileContext.getFileContext(dst.toUri, conf)
        fc.rename(tmp, dst) // default Rename.NONE: no overwrite
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
            _: java.nio.file.FileAlreadyExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(path.toString)
      } finally {
        if (f.exists(tmp)) { f.delete(tmp, false); () }
      }
    }
  }

  override def overwrite(path: JPath, body: Array[Byte]): Unit = {
    val dst = hPath(path)
    val f = fs(dst)
    val tmp = new HPath(dst.getParent, s".${dst.getName}.${UUID.randomUUID()}.tmp")
    val out = f.create(tmp, true)
    try out.write(body) finally out.close()
    try {
      val fc = FileContext.getFileContext(dst.toUri, conf)
      fc.rename(tmp, dst, Options.Rename.OVERWRITE)
    } finally {
      if (f.exists(tmp)) { f.delete(tmp, false); () }
    }
  }

  override def delete(path: JPath): Boolean = {
    val p = hPath(path)
    fs(p).delete(p, false)
  }

  override def createDirectories(dir: JPath): Unit = {
    val d = hPath(dir)
    fs(d).mkdirs(d); ()
  }

  /** True: the seam addresses objects by `java.nio` paths, so everything
    * this store serves today IS a local file (head scans and executor
    * folds apply). When the log grows URI addressing (the horizon item
    * above), this becomes scheme-conditional — remote schemes keep the
    * driver fold.
    */
  override def filesystemBacked: Boolean = true
}

object HadoopLogStore {
  /** Schemes whose `Rename.NONE` is an atomic server-side operation. */
  val AtomicRenameSchemes: Set[String] =
    Set("hdfs", "viewfs", "webhdfs", "abfs", "abfss")

  /** Process-wide claim mutex (see [[HadoopLogStore.putIfAbsent]]). */
  private[tables] val claimLock = new Object
}
