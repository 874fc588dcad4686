package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Storage seam for the commit log — the operations [[GraftLog]] needs,
  * shaped like what an object store offers: list, read, DELETE, atomic
  * full-object replace, and the one primitive the whole optimistic-
  * concurrency protocol rests on — an atomic CONDITIONAL PUT
  * ([[putIfAbsent]]: publish full content iff the key is absent, exactly
  * one concurrent winner). S3 (`If-None-Match: *`), GCS (`ifGenerationMatch
  * =0`) and ABFS (etag preconditions) all provide it natively; POSIX
  * provides it as hard-link/O_EXCL creation. Delta Lake's pluggable
  * LogStore is the same seam — the reference's `withNewTransaction`
  * (reference `DeltaHelpers.scala:112`) assumes it exists underneath.
  *
  * Addressing is by path STRING — a plain local path (`/data/t/_graft_log`)
  * or a Hadoop-FileSystem URI (`hdfs://nn/t/_graft_log`) — so one seam
  * serves every storage scheme; [[LogStore.forPath]] routes remote URIs to
  * the [[HadoopLogStore]] automatically (see [[Fs]] for the scheme rules).
  *
  * Only the LOG routes through this interface. Data files are written and
  * read by Spark's own Hadoop filesystem layer; a store implementation
  * covers the `_graft_log/` objects, which is where atomicity matters.
  *
  * Contract notes:
  *  - [[putIfAbsent]] throws `java.nio.file.FileAlreadyExistsException`
  *    when the key exists (GraftLog translates to
  *    [[CommitConflictException]]); it must never tear — readers see the
  *    full content or nothing.
  *  - [[list]] may lag (object-store list-after-write); [[putIfAbsent]]
  *    must NOT — the conditional put arbitrates even when listing lies,
  *    which is exactly why the protocol survives eventual list
  *    consistency (see the fault-injection specs).
  *  - [[overwrite]] is an atomic full replace (checkpoint sidecars and
  *    vacuum horizon rewrites — never used on contended paths).
  *
  * Shipped implementations: [[PosixLogStore]] (hard-link claims — the
  * POSIX default), [[ConditionalPutLogStore]] (pure conditional-put shape,
  * proving the protocol needs nothing beyond the object-store contract),
  * [[HadoopLogStore]] (FileSystem/FileContext rename-no-overwrite — the
  * HDFS-shaped backend, with an explicit cross-process atomicity
  * capability per scheme), and the fault-injecting [[InMemoryLogStore]]
  * for the race suites.
  */
trait LogStore {

  /** (fileName, byteSize) entries of `dir`, non-recursive; empty when the
    * directory does not exist. MAY lag recent puts (eventual consistency).
    */
  def list(dir: String): Seq[(String, Long)]

  /** Content lines of `path` (UTF-8). Throws `java.io.IOException` flavors
    * when absent.
    */
  def read(path: String): Seq[String]

  def exists(path: String): Boolean

  /** Atomically publish `body` at `path` iff absent — exactly one
    * concurrent winner; losers get `FileAlreadyExistsException`.
    */
  def putIfAbsent(path: String, body: Array[Byte]): Unit

  /** Atomically create-or-replace `path` with `body`. */
  def overwrite(path: String, body: Array[Byte]): Unit

  /** Delete `path`; false when it did not exist. */
  def delete(path: String): Boolean

  def createDirectories(dir: String): Unit

  /** True when log objects live at paths Spark itself can read — the
    * requirement of [[DistributedSnapshot]]'s splittable log fold and
    * checkpoint writer, whose EXECUTORS read log objects directly through
    * Spark's readers (any local path or Hadoop-FileSystem URI qualifies).
    * False only for stores whose objects are not files at all (the
    * in-memory test stores).
    */
  def filesystemBacked: Boolean
}

/** Default store: POSIX filesystems (local disks, NFS/EFS mounts). The
  * conditional put is hard-link creation (fails EEXIST — the POSIX
  * primitive that cannot silently replace), with two recovery behaviors a
  * real object store does not need:
  *  - stale zero-byte DEBRIS at a target path (a crashed legacy claimant)
  *    is broken after [[GraftLog.StaleClaimMillis]];
  *  - filesystems without hard links claim via a separate `.claim` marker
  *    (O_EXCL create) and land content with one atomic move — see
  *    [[PosixLogStore.publishWithoutLink]].
  */
class PosixLogStore extends LogStore {

  private def jp(s: String): JPath = Paths.get(s)

  override def list(dir: String): Seq[(String, Long)] = {
    val d = jp(dir)
    if (!Files.isDirectory(d)) return Nil
    val stream = Files.list(d)
    try stream.iterator().asScala.map { p =>
      val size = try Files.size(p) catch { case _: java.io.IOException => -1L }
      (p.getFileName.toString, size)
    }.toSeq
    finally stream.close()
  }

  override def read(path: String): Seq[String] =
    Files.readAllLines(jp(path), StandardCharsets.UTF_8).asScala.toSeq

  override def exists(path: String): Boolean = Files.exists(jp(path))

  override def putIfAbsent(path: String, body: Array[Byte]): Unit = {
    val target = jp(path)
    if (Files.exists(target)) { // cheap pre-check; the link below is the gate
      // a zero-byte file at the TARGET path is debris (the current claim
      // protocol never creates one — no-link claims live at `.claim`
      // markers, and landings move full content): break it once stale so a
      // crashed legacy claimant cannot wedge the version forever
      val staleDebris =
        try Files.size(target) == 0L &&
          System.currentTimeMillis() - Files.getLastModifiedTime(target).toMillis >
            GraftLog.StaleClaimMillis
        catch { case _: java.io.IOException => false }
      if (!staleDebris)
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
      Files.deleteIfExists(target)
    }
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}", ".tmp")
    Files.write(tmp, body)
    try {
      try Files.createLink(target, tmp)
      catch {
        case _: UnsupportedOperationException => publishWithoutLink(tmp, target)
      }
    } finally Files.deleteIfExists(tmp)
  }

  override def overwrite(path: String, body: Array[Byte]): Unit = {
    val target = jp(path)
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}", ".tmp")
    Files.write(tmp, body)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
  }

  override def delete(path: String): Boolean = Files.deleteIfExists(jp(path))

  override def createDirectories(dir: String): Unit = {
    Files.createDirectories(jp(dir)); ()
  }

  override def filesystemBacked: Boolean = true

  /** Claim for filesystems without hard links, as a LOCK at a separate
    * `<name>.claim` marker path.
    *
    * Why not claim at the target path itself (the previous design): breaking
    * a stale claim there meant deleting the TARGET, and a slow-but-alive
    * claimant landing content in the check→delete window lost a fully
    * committed version — and the exists() pre-check fired before the break
    * could run, so a crashed claimant wedged the version forever. With the
    * marker namespace, committed files are never deleted, renamed or
    * replaced by anyone: breaking a stale claim deletes only the marker.
    *
    * Protocol: acquire the marker with `Files.createFile` (O_EXCL — exactly
    * one winner); markers older than [[GraftLog.StaleClaimMillis]] are
    * presumed crashed and broken (marker deleted, acquisition retried).
    * The holder lands content at the target with a single atomic move,
    * conflicting if the target already exists, and re-validates marker
    * ownership (file key) immediately before the move so a claimant that
    * stalled past the staleness horizon and lost its claim to a breaker
    * aborts instead of racing the new owner. Readers never see a torn
    * state: [[GraftLog.versions]] matches only `\\d+.json` names, so
    * markers are invisible and targets appear only with full content.
    */
  private[tables] def publishWithoutLink(tmp: JPath, target: JPath): Unit = {
    val claim = target.getParent.resolve(target.getFileName.toString + ".claim")
    def keyOf(p: JPath): AnyRef =
      try {
        val attrs = Files.readAttributes(p, classOf[java.nio.file.attribute.BasicFileAttributes])
        Option(attrs.fileKey).getOrElse((attrs.creationTime, attrs.lastModifiedTime))
      } catch { case _: java.io.IOException => null }
    var myKey: AnyRef = null
    while (myKey == null) {
      try {
        Files.createFile(claim)
        myKey = keyOf(claim)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val stale =
            try Files.getLastModifiedTime(claim).toMillis <
              System.currentTimeMillis() - GraftLog.StaleClaimMillis
            catch { case _: java.io.IOException => true } // vanished: retry
          if (!stale)
            throw new java.nio.file.FileAlreadyExistsException(target.toString)
          Files.deleteIfExists(claim) // breaks only the MARKER, never a commit
      }
    }
    try {
      if (Files.exists(target))
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
      // ownership re-validation: if we stalled long enough for a breaker to
      // steal and re-create the marker, its file key changed — abort rather
      // than race the new holder's landing
      if (keyOf(claim) != myKey)
        throw new java.nio.file.FileAlreadyExistsException(target.toString)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    } finally {
      // release only our own marker (a breaker may have replaced it)
      if (keyOf(claim) == myKey) Files.deleteIfExists(claim)
    }
  }
}

/** Conditional-put-shaped store backed by local files — the shape a real
  * S3/GCS/ABFS backend has: ONE primitive claims and publishes in a single
  * atomic step, no debris-breaking, no marker fallback (an object store's
  * conditional put cannot crash half-way: the PUT either materializes the
  * full object or nothing). Locally the atomic conditional put is emulated
  * with write-temp + hard-link, which has exactly those semantics. Running
  * the full OCC race suites against this store proves GraftLog's protocol
  * uses nothing beyond the object-store contract.
  */
class ConditionalPutLogStore extends PosixLogStore {
  override def putIfAbsent(path: String, body: Array[Byte]): Unit = {
    // no stale-debris pre-check, no fallback: the conditional put is the
    // entire protocol — present key = conflict, full stop
    val target = Paths.get(path)
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}", ".tmp")
    Files.write(tmp, body)
    try Files.createLink(target, tmp)
    finally Files.deleteIfExists(tmp)
  }
}

/** In-memory object store with FAULT INJECTION — the proving ground for
  * the protocol's object-store safety claims. Consistency model mirrors a
  * pre-2020 S3: [[putIfAbsent]] is strongly consistent (the conditional
  * put arbitrates), while [[list]]/[[exists]]/[[read]] can be made to lag
  * behind recent puts:
  *
  *  - [[freezeListNow]] — listings stop seeing entries put AFTER the call
  *    (list-after-write inconsistency): writers computing "next version"
  *    from a lagging list MUST be rejected by the conditional put, never
  *    silently overwrite.
  *  - [[freezeReadsNow]] — exists()/read() miss entries put after the call
  *    (lost read visibility): a writer that cannot SEE the winner's commit
  *    still must not be able to replace it.
  *
  * Injection is by put SEQUENCE NUMBER, not wall clock — deterministic
  * regardless of test timing. Not filesystem-backed: executor-side paths
  * (DistributedSnapshot) refuse it loudly.
  */
class InMemoryLogStore extends LogStore {
  private case class Entry(body: Array[Byte], seq: Long)
  private val objects = new ConcurrentHashMap[String, Entry]()
  private val dirs = ConcurrentHashMap.newKeySet[String]()
  private val putSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  @volatile private var listFloor: Long = Long.MaxValue
  @volatile private var readFloor: Long = Long.MaxValue

  /** Listings stop seeing entries put after this call. */
  def freezeListNow(): Unit = { listFloor = putSeq.get() }
  def unfreezeList(): Unit = { listFloor = Long.MaxValue }

  /** exists()/read() stop seeing entries put after this call. */
  def freezeReadsNow(): Unit = { readFloor = putSeq.get() }
  def unfreezeReads(): Unit = { readFloor = Long.MaxValue }

  private def key(p: String): String =
    if (Fs.isRemote(p)) Fs.normalize(p)
    else Paths.get(p).toAbsolutePath.normalize.toString

  override def list(dir: String): Seq[(String, Long)] = {
    val prefix = key(dir) + "/"
    objects.entrySet().asScala.iterator
      .filter(e => e.getKey.startsWith(prefix) &&
        !e.getKey.substring(prefix.length).contains("/") &&
        e.getValue.seq <= listFloor)
      .map(e => (e.getKey.substring(prefix.length), e.getValue.body.length.toLong))
      .toSeq
  }

  override def read(path: String): Seq[String] = {
    val e = objects.get(key(path))
    if (e == null || e.seq > readFloor)
      throw new java.io.FileNotFoundException(path)
    new String(e.body, StandardCharsets.UTF_8).linesIterator.toSeq
  }

  override def exists(path: String): Boolean = {
    val e = objects.get(key(path))
    e != null && e.seq <= readFloor
  }

  override def putIfAbsent(path: String, body: Array[Byte]): Unit = {
    // STRONG conditional put regardless of injected read/list lag — the
    // invariant every real backend provides and the protocol leans on
    val prev = objects.putIfAbsent(key(path),
      Entry(body.clone(), putSeq.incrementAndGet()))
    if (prev != null)
      throw new java.nio.file.FileAlreadyExistsException(path)
  }

  override def overwrite(path: String, body: Array[Byte]): Unit = {
    objects.put(key(path), Entry(body.clone(), putSeq.incrementAndGet())); ()
  }

  override def delete(path: String): Boolean = objects.remove(key(path)) != null

  override def createDirectories(dir: String): Unit = { dirs.add(key(dir)); () }

  override def filesystemBacked: Boolean = false
}

object LogStore {

  val Posix: LogStore = new PosixLogStore
  val ConditionalPut: LogStore = new ConditionalPutLogStore

  /** Shared Hadoop-FileSystem store resolving against the session Hadoop
    * configuration ([[Fs.hadoopConf]]) — the HDFS-shaped backend, and the
    * automatic route for every remote-scheme table path; see
    * [[HadoopLogStore]] for its atomicity capability notes.
    */
  lazy val Hadoop: LogStore = new HadoopLogStore()

  /** Longest-prefix path routing. Registered programmatically (tests,
    * embedding applications) or at boot via the system properties
    * `graft.logstore.conditionalPut.prefixes=/a,/b` /
    * `graft.logstore.hadoop.prefixes=/c` — how a forked JVM (the
    * cross-process OCC race drivers, an HDFS-mounted deployment) is
    * pointed at a specific store for a table prefix. Remote-scheme paths
    * (`hdfs://...`, `s3a://...`) route to [[Hadoop]] with no registration.
    */
  private val overrides = new ConcurrentHashMap[String, LogStore]()

  /** Deployment seam for conditional-put services: bind an
    * [[ObjectStoreClient]] (the SDK adapter) to a URI scheme and every
    * table on that scheme commits through a multi-writer-safe
    * [[ObjectStoreLogStore]] — `registerObjectStoreScheme("s3a", client)`
    * upgrades all `s3a://` tables from the rename-based [[Hadoop]] store
    * (not cross-process atomic there) to true service-side arbitration.
    */
  private val schemeStores = new ConcurrentHashMap[String, LogStore]()

  def registerObjectStoreScheme(scheme: String, client: ObjectStoreClient): Unit = {
    schemeStores.put(scheme.toLowerCase, new ObjectStoreLogStore(client)); ()
  }

  def unregisterObjectStoreScheme(scheme: String): Unit = {
    schemeStores.remove(scheme.toLowerCase); ()
  }

  /** Shared local-file-backed conditional-put object store — the boot-
    * property route for forked JVMs (the cross-JVM OCC races) and for
    * proving a deployment's table flow against the object-store contract
    * without a service.
    */
  lazy val LocalObjectStore: LogStore =
    new ObjectStoreLogStore(new LocalObjectStoreClient)

  private lazy val bootObjectStorePrefixes: Seq[String] =
    sys.props.get("graft.logstore.objectstore.prefixes")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(normalize))
      .getOrElse(Nil)

  private lazy val bootConditionalPutPrefixes: Seq[String] =
    sys.props.get("graft.logstore.conditionalPut.prefixes")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(normalize))
      .getOrElse(Nil)

  private lazy val bootHadoopPrefixes: Seq[String] =
    sys.props.get("graft.logstore.hadoop.prefixes")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map(normalize))
      .getOrElse(Nil)

  private def normalize(p: String): String =
    if (Fs.isRemote(p)) Fs.normalize(p)
    else Paths.get(p).toAbsolutePath.normalize.toString

  def register(pathPrefix: String, store: LogStore): Unit = {
    overrides.put(normalize(pathPrefix), store); ()
  }

  def unregister(pathPrefix: String): Unit = {
    overrides.remove(normalize(pathPrefix)); ()
  }

  def forPath(tablePath: String): LogStore = {
    val p = normalize(tablePath)
    val registered = overrides.entrySet().asScala
      .filter(e => p == e.getKey || p.startsWith(e.getKey + "/"))
      .toSeq.sortBy(-_.getKey.length)
      .headOption.map(_.getValue)
    registered.getOrElse {
      if (Fs.isRemote(p)) {
        val scheme = p.substring(0, p.indexOf(':')).toLowerCase
        Option(schemeStores.get(scheme)).getOrElse(Hadoop)
      } else if (bootObjectStorePrefixes.exists(pre => p == pre || p.startsWith(pre + "/")))
        LocalObjectStore
      else if (bootConditionalPutPrefixes.exists(pre => p == pre || p.startsWith(pre + "/")))
        ConditionalPut
      else if (bootHadoopPrefixes.exists(pre => p == pre || p.startsWith(pre + "/")))
        Hadoop
      else Posix
    }
  }
}
