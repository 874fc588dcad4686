package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** The failure vocabulary of a conditional-put object-store API — the three
  * ways a real S3/GCS/ABFS request ends other than success.
  */
object ObjectStore {

  /** `412 Precondition Failed` / `ifGenerationMatch=0` rejected: the key
    * already exists. THE arbitration signal — exactly one concurrent
    * conditional put receives success; every other receives this.
    */
  class PreconditionFailedException(key: String)
    extends RuntimeException(s"precondition failed (key exists): $key")

  /** `503 SlowDown` / `429` — transient service pushback. The request did
    * NOT take effect; retrying with backoff is always safe.
    */
  class ThrottledException(key: String)
    extends RuntimeException(s"throttled: $key")

  /** The request's OUTCOME IS UNKNOWN — a timeout or connection reset after
    * the bytes were sent. The put may or may not have landed; blind retry
    * would self-conflict, blind failure would lose a landed commit. The
    * store recovers by reading the key back (see
    * [[ObjectStoreLogStore.putIfAbsent]]).
    */
  class AmbiguousOutcomeException(key: String, cause: Throwable = null)
    extends RuntimeException(s"request outcome unknown: $key", cause)
}

/** The object-store SDK surface [[ObjectStoreLogStore]] drives — the five
  * primitives every major object store offers, with the CONDITIONAL PUT
  * (`If-None-Match: *` on S3, `ifGenerationMatch=0` on GCS, etag
  * preconditions on ABFS) as the arbitration primitive. A deployment binds
  * its SDK behind this trait and registers it
  * ([[LogStore.registerObjectStoreScheme]]); the shipped
  * [[LocalObjectStoreClient]] is the same API over local files — the
  * offline proving ground for the store's retry/recovery logic and the
  * claim/fault-storm batteries.
  *
  * Keys are full path strings (`s3a://bucket/table/_graft_log/0.json`) —
  * the same strings Spark's readers use, so one addressing scheme serves
  * both the commit protocol and the data plane.
  */
trait ObjectStoreClient {

  /** Publish `body` at `key` iff the key does not exist — atomic, exactly
    * one concurrent winner. Throws [[ObjectStore.PreconditionFailedException]]
    * when the key exists, [[ObjectStore.ThrottledException]] on transient
    * pushback (nothing landed), [[ObjectStore.AmbiguousOutcomeException]]
    * when the outcome is unknown.
    */
  def putIfNoneMatch(key: String, body: Array[Byte]): Unit

  /** Unconditional create-or-replace (plain PUT). */
  def put(key: String, body: Array[Byte]): Unit

  /** Full object content, or None when the key does not exist. */
  def get(key: String): Option[Array[Byte]]

  /** Byte size of the object, or None when the key does not exist (HEAD). */
  def head(key: String): Option[Long]

  /** Direct children of `dir` (delimiter-style LIST): (name, size) for
    * every key of the form `dir/name`. May lag recent puts.
    */
  def list(dir: String): Seq[(String, Long)]

  /** Delete the object; false when it did not exist. */
  def delete(key: String): Boolean

  /** Whether keys are ALSO paths Spark's own readers can open — true for a
    * real s3a/gs/abfs binding (the connector reads the same URIs) and for
    * the file-backed local client; enables
    * [[graft.tables.DistributedSnapshot]]'s executor-side log folds.
    */
  def fileAddressable: Boolean
}

/** [[LogStore]] over a conditional-put object-store API — the multi-writer-
  * safe backend for the storage real 100 TB corpora live on. Where
  * [[HadoopLogStore]] leans on rename-no-overwrite (atomic only on
  * HDFS-protocol schemes), this store's claim IS the service-side
  * conditional put, so **cross-process atomicity holds on any correctly
  * bound client** — two writers on different machines racing one version
  * get exactly one `200` and one `412`, arbitrated by the store itself.
  *
  * What the store adds over the raw client is the retry discipline an
  * object store demands:
  *
  *  - **Throttling** ([[ObjectStore.ThrottledException]]): exponential
  *    backoff and retry, up to `maxAttempts` — a `503` landed nothing, so
  *    the retry is always safe.
  *  - **Ambiguous outcomes** ([[ObjectStore.AmbiguousOutcomeException]]):
  *    the one genuinely hard failure — a timeout after the bytes went out.
  *    Recovery is read-back: if the key now holds exactly our bytes, our
  *    put landed and the commit WON (failing it would abandon a durable
  *    commit; blindly retrying would conflict with ourselves); if the key
  *    holds different bytes, a rival won — conflict; if the key is absent,
  *    nothing landed — retry the conditional put. Byte-equality is sound
  *    as attribution: a byte-identical rival commit carries the identical
  *    action list, so adopting it yields the identical table state.
  *
  * Capability table (which store for which deployment):
  * {{{
  *   POSIX local/NFS, single or multi writer  -> PosixLogStore (hard links)
  *   HDFS / viewfs / webhdfs / abfs(s)        -> HadoopLogStore (atomic rename)
  *   S3 / GCS / any conditional-put service,
  *     multi-writer across machines           -> ObjectStoreLogStore
  *   fs.<scheme>.impl-only connectors,
  *     single JVM                             -> HadoopLogStore (mutex + fallback)
  * }}}
  */
class ObjectStoreLogStore(
    val client: ObjectStoreClient,
    maxAttempts: Int = 5,
    backoffMillis: Long = 10L
) extends LogStore {

  require(maxAttempts >= 1, "maxAttempts must be >= 1")

  /** Always true: the conditional put arbitrates inside the service, not
    * in any process or filesystem semantics — see the class doc.
    */
  def crossProcessAtomic: Boolean = true

  /** Retry loop for IDEMPOTENT operations (GET/HEAD/LIST/PUT/DELETE): a
    * throttle landed nothing — back off and re-issue; an AMBIGUOUS outcome
    * on an idempotent op is resolved the same way, by simply doing it
    * again (a re-read reads, the same bytes re-put converge, a re-delete
    * deletes) — a real SDK times out on GETs too, and an ambiguous read
    * escaping here would fail a commit whose recovery read-back merely hit
    * a blip. Only the CONDITIONAL put is non-idempotent; it gets the
    * read-back recovery in [[putIfAbsent]] instead of a blind retry.
    */
  private def withRetry[A](key: String)(op: => A): A = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e @ (_: ObjectStore.ThrottledException |
                  _: ObjectStore.AmbiguousOutcomeException) =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMillis * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def putIfAbsent(path: String, body: Array[Byte]): Unit = {
    var attempt = 1
    while (true) {
      try {
        client.putIfNoneMatch(path, body)
        return
      } catch {
        case _: ObjectStore.PreconditionFailedException =>
          throw new java.nio.file.FileAlreadyExistsException(path)
        case e: ObjectStore.ThrottledException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMillis * attempt)
        case e: ObjectStore.AmbiguousOutcomeException =>
          // read-back recovery (class doc): ours -> won; rival's -> lost;
          // absent -> nothing landed, retry the conditional put
          withRetry(path)(client.get(path)) match {
            case Some(b) if java.util.Arrays.equals(b, body) => return
            case Some(_) =>
              throw new java.nio.file.FileAlreadyExistsException(path)
            case None =>
              if (attempt >= maxAttempts) throw e
          }
      }
      attempt += 1
    }
  }

  override def overwrite(path: String, body: Array[Byte]): Unit =
    // an unconditional PUT is idempotent: withRetry resolves both throttle
    // and ambiguous outcomes by re-issuing the same bytes
    withRetry(path)(client.put(path, body))

  override def read(path: String): Seq[String] =
    withRetry(path)(client.get(path)) match {
      case Some(b) => new String(b, StandardCharsets.UTF_8).linesIterator.toSeq
      case None => throw new java.io.FileNotFoundException(path)
    }

  override def exists(path: String): Boolean =
    withRetry(path)(client.head(path)).isDefined

  override def list(dir: String): Seq[(String, Long)] =
    withRetry(dir)(client.list(dir))

  override def delete(path: String): Boolean =
    withRetry(path) {
      try client.delete(path)
      catch {
        // idempotent like overwrite, but the RESULT needs care: when the
        // ambiguous first attempt may have landed, the re-issue's "not
        // found" means WE deleted it — report true. (A re-issue that
        // itself blips rethrows into withRetry's bounded loop.)
        case _: ObjectStore.AmbiguousOutcomeException =>
          client.delete(path); true
      }
    }

  /** Object stores have no directories — prefixes exist implicitly. */
  override def createDirectories(dir: String): Unit = ()

  override def filesystemBacked: Boolean = client.fileAddressable
}

/** [[ObjectStoreClient]] over local files — the reference binding and the
  * offline proving ground. The conditional put is write-temp + hard-link
  * (EEXIST = precondition failed): genuinely atomic ACROSS PROCESSES, so
  * two JVMs sharing a directory exercise the same arbitration a real
  * service provides (the cross-JVM OCC races run through this).
  *
  * Fault injection (per-instance, thread-safe) models the service-side
  * failures [[ObjectStoreLogStore]] must absorb:
  *
  *  - [[throttleNextPuts]]: the next n conditional puts are rejected with
  *    [[ObjectStore.ThrottledException]] before anything lands.
  *  - [[ambiguousNextPut]]: the next conditional put throws
  *    [[ObjectStore.AmbiguousOutcomeException]]; with `land = true` the
  *    object lands FIRST (timeout after a successful write — the case
  *    read-back must claim), with `land = false` nothing lands, and an
  *    optional `rival` body is landed instead (a competing writer winning
  *    inside our timeout window — the case read-back must concede).
  */
class LocalObjectStoreClient extends ObjectStoreClient {

  private val throttlesArmed = new java.util.concurrent.atomic.AtomicInteger(0)
  private case class AmbiguousFault(land: Boolean, rival: Option[Array[Byte]])
  private val ambiguousArmed =
    new java.util.concurrent.atomic.AtomicReference[AmbiguousFault](null)
  private val throttled = new java.util.concurrent.atomic.AtomicInteger(0)

  def throttleNextPuts(n: Int): Unit = { throttlesArmed.set(n); () }
  def ambiguousNextPut(land: Boolean, rival: Option[Array[Byte]] = None): Unit = {
    ambiguousArmed.set(AmbiguousFault(land, rival)); ()
  }

  private val getThrottlesArmed = new java.util.concurrent.atomic.AtomicInteger(0)
  private val getAmbiguousArmed = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The next n GETs are rejected with a throttle (nothing read). */
  def throttleNextGets(n: Int): Unit = { getThrottlesArmed.set(n); () }

  /** The next n GETs throw [[ObjectStore.AmbiguousOutcomeException]] — the
    * SDK-timeout-on-read case: the object's state is whatever it is; only
    * OUR VIEW of it was lost. A correct client re-issues (reads are
    * idempotent); one that doesn't fails spuriously.
    */
  def ambiguousNextGets(n: Int): Unit = { getAmbiguousArmed.set(n); () }

  /** Throttles served so far — proves the retry path actually ran. */
  def throttleCount: Int = throttled.get()

  private def jp(key: String) = Paths.get(key)

  override def putIfNoneMatch(key: String, body: Array[Byte]): Unit = {
    if (throttlesArmed.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      throttled.incrementAndGet()
      throw new ObjectStore.ThrottledException(key)
    }
    val fault = ambiguousArmed.getAndSet(null)
    fault match {
      case AmbiguousFault(false, rival) =>
        rival.foreach(landAtomically(key, _))
        throw new ObjectStore.AmbiguousOutcomeException(key)
      case AmbiguousFault(true, _) =>
        landAtomically(key, body)
        throw new ObjectStore.AmbiguousOutcomeException(key)
      case _ => landAtomically(key, body)
    }
  }

  private def landAtomically(key: String, body: Array[Byte]): Unit = {
    val target = jp(key)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}", ".tmp")
    Files.write(tmp, body)
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ObjectStore.PreconditionFailedException(key)
    } finally Files.deleteIfExists(tmp)
  }

  override def put(key: String, body: Array[Byte]): Unit = {
    val target = jp(key)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, s".${target.getFileName}", ".tmp")
    Files.write(tmp, body)
    Files.move(tmp, target, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  override def get(key: String): Option[Array[Byte]] = {
    if (getThrottlesArmed.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      throttled.incrementAndGet()
      throw new ObjectStore.ThrottledException(key)
    }
    if (getAmbiguousArmed.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new ObjectStore.AmbiguousOutcomeException(key)
    if (Files.isRegularFile(jp(key))) Some(Files.readAllBytes(jp(key))) else None
  }

  override def head(key: String): Option[Long] =
    if (Files.isRegularFile(jp(key))) Some(Files.size(jp(key))) else None

  override def list(dir: String): Seq[(String, Long)] = {
    val d = jp(dir)
    if (!Files.isDirectory(d)) return Nil
    val stream = Files.list(d)
    try stream.iterator().asScala.collect {
      case p if Files.isRegularFile(p) =>
        (p.getFileName.toString, try Files.size(p) catch { case _: java.io.IOException => -1L })
    }.toSeq
    finally stream.close()
  }

  override def delete(key: String): Boolean = Files.deleteIfExists(jp(key))

  override def fileAddressable: Boolean = true
}
