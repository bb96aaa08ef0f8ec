package graft.sched

import java.nio.channels.{FileChannel, FileLock, OverlappingFileLockException}
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.locks.ReentrantLock

/** Mutual-exclusion seam for coordinators sharing one metadata/ledger store
  * — the reference's `ffsync.Locker` (ffsync/locker.go:110: memory and psql
  * implementations behind one interface) so several schedulers can share a
  * task-run table without double-running tasks or losing each other's
  * records.
  *
  * Two bindings, same shape as the reference's pair:
  *  - [[MemoryLocker]]: in-process striped locks (the memory locker) —
  *    correct for the single-JVM topology, zero IO.
  *  - [[FileLocker]]: one lock file per key under a shared directory,
  *    `java.nio.channels.FileLock` for CROSS-PROCESS exclusion (the psql
  *    advisory-lock role on a shared filesystem). OS file locks are
  *    process-scoped — a second acquire in the SAME JVM throws
  *    [[OverlappingFileLockException]] rather than blocking — so each key
  *    also holds a JVM-level [[ReentrantLock]] first; the file lock is
  *    only contended by OTHER processes.
  */
trait Locker {

  /** Acquire `key`, run `body`, release. Blocks until available. */
  def withLock[T](key: String)(body: => T): T

  /** Non-blocking acquire: Some(body result) if the lock was free, None if
    * another holder (thread or process) has it — the scheduler's
    * "someone else claimed this run, move on" branch. */
  def tryWithLock[T](key: String)(body: => T): Option[T]

  /** [[withLock]] with a FENCING TOKEN passed to the body, for stores that
    * must reject a zombie ex-holder's writes ([[FenceGuard]]). Lockers
    * whose exclusion cannot be broken while the holder lives (File/Memory:
    * the OS or the JVM holds the lock, there is no lease to expire) return
    * [[Locker.Unfenced]] (-1) — the guard treats that as "no fencing
    * needed", which is sound for exactly those bindings. [[LeaseLocker]]
    * overrides with real monotone tokens. */
  def withLockFenced[T](key: String)(body: Long => T): T =
    withLock(key)(body(Locker.Unfenced))
}

object Locker {
  /** Token value meaning "this locker's exclusion cannot be broken, no
    * fencing applies" — see [[Locker.withLockFenced]]. */
  val Unfenced: Long = -1L

  /** Locker policy for a durable-state directory: LOCAL dirs (no scheme,
    * `file:`, or anything `java.net.URI` can't parse — e.g. paths with
    * spaces) get a [[FileLocker]] in `<dir>/.locks` for cross-process
    * exclusion; remote schemes (hdfs:, s3a:, …) get a [[LeaseLocker]] in
    * `<dir>/.locks` over the Hadoop FileSystem API (the reference's psql
    * locker role) — falling back to the in-process [[MemoryLocker]] only
    * when no Hadoop binding for the scheme is on the classpath (then the
    * store can't be reached either, so single-process is a safe
    * assumption). */
  def forDir(dir: String): Locker = {
    val cached = byDir.get(dir)
    if (cached != null) return cached
    // evict OUTSIDE computeIfAbsent: the CHM contract forbids the mapping
    // function from modifying the map (clear() from inside it corrupts
    // the in-flight bin/size bookkeeping)
    if (byDir.size >= MaxCached) byDir.clear()
    byDir.computeIfAbsent(dir, make(_))
  }

  // ONE locker instance per directory string, JVM-wide: forDir is called
  // per OPERATION (CatalogStore.save/load, TaskRunner claims), and a fresh
  // MemoryLocker per call would hold a private lock map — zero exclusion
  // even between two threads of one JVM. FileLocker would still exclude
  // via the lock files, but the memory binding must be shared to mean
  // anything. The cache is BOUNDED (round-8 advice: test/bench suites
  // minting nanoTime temp dirs accumulated instances forever): on
  // overflow it is cleared wholesale, which is safe for File/Lease
  // lockers (their exclusion state lives in JVM-GLOBAL gate maps keyed
  // by canonical lock path plus the on-disk locks, not in the instance)
  // — only a remote-scheme MemoryLocker fallback would lose exclusion
  // across an eviction, and that binding is best-effort by design.
  private val byDir =
    new java.util.concurrent.ConcurrentHashMap[String, Locker]()
  private val MaxCached = 512

  private def make(dir: String): Locker = {
    val scheme =
      try Option(new java.net.URI(dir).getScheme)
      catch { case _: java.net.URISyntaxException => None }
    scheme match {
      case None => new FileLocker(s"$dir/.locks")
      case Some("file") =>
        new FileLocker(s"${new java.net.URI(dir).getPath}/.locks")
      case Some(_) =>
        // probe the Hadoop binding NOW (constructing LeaseLocker touches
        // the FS). Fall back to MemoryLocker ONLY when the scheme has no
        // filesystem implementation on the classpath — then the store
        // itself is unreachable, so single-process is a safe assumption.
        // Any OTHER failure (network, auth, permissions) re-surfaces: a
        // reachable-but-flaky store silently downgraded to in-process
        // locking would double-run tasks with no error. The conf prefers
        // the thread's active session, then the JVM default session
        // (forDir is often called from scheduler threads with no
        // thread-local session but real s3a/hdfs credentials on the
        // default one).
        try {
          val conf = org.apache.spark.sql.SparkSession.getActiveSession
            .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
            .map(_.sparkContext.hadoopConfiguration)
            .getOrElse(new org.apache.hadoop.conf.Configuration())
          new LeaseLocker(s"$dir/.locks", conf)
        } catch {
          case e: Exception if isMissingBinding(e) =>
            System.err.println(
              s"[locker] no filesystem binding for $dir (${e.getMessage}); " +
                "falling back to in-process locking")
            new MemoryLocker
        }
    }
  }

  /** True iff the failure means "no Hadoop FileSystem class for this
    * scheme" (vs a reachable store failing transiently). Deliberately
    * NARROW: a broad "not found" substring would also match auth/config
    * failures ("Credential provider not found", missing SIGNING_REGION)
    * and silently downgrade a REACHABLE remote store to MemoryLocker —
    * the double-run hazard this gate exists to prevent. We accept only
    * the exact shapes Hadoop's FileSystem.getFileSystemClass raises for
    * an absent binding: ClassNotFoundException,
    * UnsupportedFileSystemException, the literal "No FileSystem for
    * scheme" message, and its "Class <impl> not found" wrapper. */
  private val classNotFoundMsg =
    java.util.regex.Pattern.compile("""Class \S+ not found""")

  private def isMissingBinding(e: Throwable): Boolean = {
    var t: Throwable = e
    while (t != null) {
      t match {
        case _: ClassNotFoundException => return true
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException => return true
        case _ =>
          val m = t.getMessage
          if (m != null && (m.contains("No FileSystem for scheme") ||
              classNotFoundMsg.matcher(m).find())) return true
      }
      t = t.getCause
    }
    false
  }
}

/** In-process locker — one [[ReentrantLock]] per key. */
final class MemoryLocker extends Locker {
  private val locks = new ConcurrentHashMap[String, ReentrantLock]()
  private def lockFor(key: String): ReentrantLock =
    locks.computeIfAbsent(key, _ => new ReentrantLock())

  def withLock[T](key: String)(body: => T): T = {
    val l = lockFor(key)
    l.lock()
    try body finally l.unlock()
  }

  def tryWithLock[T](key: String)(body: => T): Option[T] = {
    val l = lockFor(key)
    if (!l.tryLock()) None
    else try Some(body) finally l.unlock()
  }
}

/** Cross-process locker over a shared directory. Lock files are tiny,
  * persistent (never deleted — deleting a lock file while another process
  * holds its channel open breaks FileLock's exclusion guarantee on POSIX),
  * and keyed by a sanitized name, so the same key string always maps to
  * the same file from every process. */
final class FileLocker(dir: String) extends Locker {
  Files.createDirectories(Paths.get(dir))

  // JVM-level gate per LOCK FILE: FileLock is process-scoped, and an
  // acquire from another thread of THIS process — possibly through a
  // DIFFERENT FileLocker instance pointed at the same directory — must
  // block, not throw OverlappingFileLockException. Hence the gate map is
  // JVM-global (companion object), keyed by the canonical lock-file path.
  private def jvmLock(key: String): ReentrantLock =
    FileLocker.jvmLocks.computeIfAbsent(
      lockPath(key).toAbsolutePath.normalize.toString,
      _ => new ReentrantLock())

  private def lockPath(key: String): Path = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
    // suffix with a hash so sanitization collisions can't alias two keys
    Paths.get(dir, s"$safe.${Integer.toHexString(key.hashCode)}.lock")
  }

  private def channel(key: String): FileChannel =
    FileChannel.open(lockPath(key),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)

  def withLock[T](key: String)(body: => T): T = {
    val l = jvmLock(key)
    l.lock()
    try {
      // reentrant acquire: this thread already holds the FILE lock from
      // the outer frame — taking it again on a second channel would throw
      // OverlappingFileLockException, so just run the body (matching
      // MemoryLocker's ReentrantLock semantics)
      if (l.getHoldCount > 1) body
      else {
        val ch = channel(key)
        try {
          val fl = ch.lock() // blocks on other PROCESSES
          try body finally fl.release()
        } finally ch.close()
      }
    } finally l.unlock()
  }

  def tryWithLock[T](key: String)(body: => T): Option[T] = {
    val l = jvmLock(key)
    if (!l.tryLock()) return None
    try {
      if (l.getHoldCount > 1) Some(body) // reentrant: file lock already held
      else {
        val ch = channel(key)
        try {
          val fl =
            try ch.tryLock()
            catch { case _: OverlappingFileLockException => null }
          if (fl == null) None
          else try Some(body) finally fl.release()
        } finally ch.close()
      }
    } finally l.unlock()
  }
}

object FileLocker {
  private val jvmLocks = new ConcurrentHashMap[String, ReentrantLock]()
}
