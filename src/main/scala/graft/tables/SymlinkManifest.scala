package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** Presto/Trino/Athena interop: the SYMLINK-format manifest (Delta's
  * `GENERATE symlink_format_manifest` / `delta.compatibility.
  * symlinkFormatManifest.enabled`). Writes
  * `_symlink_format_manifest/[<partition dirs>/]manifest` text files, one
  * absolute data-file URI per line, listing exactly the LIVE files of a
  * snapshot — an external Hive-layout reader then sees the table's current
  * state without understanding the commit log.
  *
  * Refused on tables with live deletion vectors: a manifest reader would
  * resurrect the masked rows (Delta refuses the same way).
  *
  * Scale: O(live files) driver metadata work — the same order as the
  * snapshot itself; no data is read. Each manifest file lands via
  * temp-write + atomic move, and the whole tree is rebuilt per refresh so
  * dropped partitions cannot leave stale manifests behind.
  */
object SymlinkManifest {

  val Property = "graft.symlinkFormatManifest.enabled"
  val DirName = "_symlink_format_manifest"

  /** Write the manifest tree for `snap`; returns the number of file
    * entries written.
    */
  def write(tablePath: String, snap: Snapshot): Int = {
    require(!snap.files.exists(_.dv.exists(_.cardinality > 0)),
      s"cannot generate a symlink manifest for $tablePath: live deletion " +
        "vectors present — an external manifest reader would resurrect the " +
        "masked rows. Purge the vectors (rewrite) first")
    val root = Fs.child(tablePath, DirName)
    Fs.deleteRecursively(root)
    Fs.mkdirs(root)
    // group by the partition directory encoded in each file's relative path
    val byDir: Map[String, Seq[AddFile]] = snap.files.groupBy { f =>
      val i = f.path.lastIndexOf('/')
      if (i < 0) "" else f.path.substring(0, i)
    }
    byDir.foreach { case (dir, files) =>
      val out = if (dir.isEmpty) root else Fs.child(root, dir)
      Fs.mkdirs(out)
      val body = files.map(f => Fs.toUriString(GraftTable.resolveDataPath(tablePath, f.path)))
        .sorted.mkString("", "\n", "\n")
      Fs.writeAtomic(Fs.child(out, "manifest"), body.getBytes(StandardCharsets.UTF_8))
    }
    snap.files.size
  }

  /** All data-file URIs listed by the manifest tree (test/read helper). */
  def entries(tablePath: String): Seq[String] = {
    val root = Fs.child(tablePath, DirName)
    if (!Fs.isDirectory(root)) return Nil
    Fs.walkFiles(root)
      .filter(p => Fs.fileName(p) == "manifest")
      .flatMap(Fs.readLines)
      .filter(_.nonEmpty)
  }
}
