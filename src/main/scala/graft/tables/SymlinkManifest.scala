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
    val root = Paths.get(tablePath, DirName)
    deleteTree(root)
    Files.createDirectories(root)
    // group by the partition directory encoded in each file's relative path
    val byDir: Map[String, Seq[AddFile]] = snap.files.groupBy { f =>
      val i = f.path.lastIndexOf('/')
      if (i < 0) "" else f.path.substring(0, i)
    }
    byDir.foreach { case (dir, files) =>
      val out = if (dir.isEmpty) root else root.resolve(dir)
      Files.createDirectories(out)
      val body = files.map(f => GraftTable.resolveDataPath(tablePath, f.path).toUri.toString)
        .sorted.mkString("", "\n", "\n")
      val tmp = Files.createTempFile(out, ".manifest", ".tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, out.resolve("manifest"), StandardCopyOption.REPLACE_EXISTING)
    }
    snap.files.size
  }

  /** All data-file URIs listed by the manifest tree (test/read helper). */
  def entries(tablePath: String): Seq[String] = {
    val root = Paths.get(tablePath, DirName)
    if (!Files.isDirectory(root)) return Nil
    val stream = Files.walk(root)
    try stream.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString == "manifest")
      .flatMap(p => Files.readAllLines(p, StandardCharsets.UTF_8).asScala)
      .filter(_.nonEmpty)
      .toSeq
    finally stream.close()
  }

  private def deleteTree(p: JPath): Unit = {
    if (!Files.exists(p)) return
    val stream = Files.walk(p)
    val all = try stream.iterator().asScala.toSeq finally stream.close()
    all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }
}
