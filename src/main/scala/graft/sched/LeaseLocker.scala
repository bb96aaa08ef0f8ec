package graft.sched

import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, Executors, ScheduledFuture, TimeUnit}
import java.util.concurrent.locks.ReentrantLock

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Lease-file locker over the Hadoop FileSystem API — the REMOTE-scheme
  * binding [[Locker.forDir]] was missing (the reference fills this role
  * with its psql advisory locker, ffsync/locker.go:110): two drivers
  * sharing an `hdfs:`/`s3a:` catalog or task ledger get real
  * cross-process exclusion instead of the in-process MemoryLocker
  * fallback. `java.nio.channels.FileLock` doesn't exist on remote
  * filesystems, so the protocol is the classic lease file:
  *
  *  - ACQUIRE = atomic create-if-absent of `<dir>/<key>.lease`
  *    (`FileSystem.create(path, overwrite = false)` — atomic on HDFS;
  *    on S3 it rides the strong-consistency existence check, so ACQUIRE
  *    additionally reads the lease back and yields unless the body is
  *    exactly ours — the check-then-put double-winner withdraws; see
  *    `createVerified`). The lease body carries the owner id and a
  *    FENCING TOKEN.
  *  - LIVENESS = the lease file's modification time. A background
  *    heartbeat rewrites the lease every `heartbeatMs` while the body
  *    runs, so a live holder's lease mtime is always fresh.
  *  - EXPIRY = a lease whose mtime is older than `leaseExpiryMs` marks
  *    a dead holder (process gone without release): any waiter may
  *    BREAK it — read its token, delete, re-create with
  *    `max(now, token + 1)`. The monotone token lets a downstream store
  *    reject writes from a
  *    zombie holder that wakes up after its lease was broken (classic
  *    fencing; exposed via [[withLockFenced]]).
  *  - RELEASE = delete the lease file.
  *
  * Same-JVM contention never reaches the filesystem: a JVM-global
  * reentrant gate per lease path (the [[FileLocker]] pattern) serializes
  * local threads first, so only genuinely foreign processes contend on
  * the lease. Assumptions, stated: clocks across holders agree to well
  * under `leaseExpiryMs` (the standard lease-protocol requirement when
  * no coordinator exists), and a broken-then-resurrected holder is only
  * fully fenced if the downstream store checks tokens. */
final class LeaseLocker(dir: String, conf: Configuration,
                        leaseExpiryMs: Long = 60000L,
                        heartbeatMs: Long = 5000L,
                        pollMs: Long = 200L) extends Locker {
  require(leaseExpiryMs > heartbeatMs,
    "leaseExpiryMs must exceed heartbeatMs or live leases expire")

  private val base = new HPath(dir)
  private val fs: FileSystem = base.getFileSystem(conf)
  fs.mkdirs(base)

  private val owner =
    s"${java.net.InetAddress.getLocalHost.getHostName}#" +
      s"${ProcessHandle.current().pid()}"

  private def leasePath(key: String): HPath = {
    val safe = key.map(c =>
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.') c else '_')
    // hash suffix so sanitization collisions can't alias two keys
    new HPath(base, s"$safe.${Integer.toHexString(key.hashCode)}.lease")
  }

  private def jvmLock(key: String): ReentrantLock =
    LeaseLocker.jvmLocks.computeIfAbsent(
      fs.makeQualified(leasePath(key)).toString,
      _ => new ReentrantLock())

  private def leaseBody(token: Long): Array[Byte] =
    s"token=$token\nowner=$owner\n".getBytes(StandardCharsets.UTF_8)

  /** `cleanupOnFailure` is for the ACQUIRE path only: a create that
    * succeeds but whose write/close fails would otherwise leave a
    * fresh-mtime zero-byte lease nobody heartbeats — blocking every
    * acquirer (the creator included) until expiry. The heartbeat path
    * must NOT clean up: there the file is our live lease and a truncated
    * body still carries a fresh mtime (liveness preserved; token parse
    * floors to 0). */
  private def writeLease(p: HPath, token: Long, overwrite: Boolean,
                         cleanupOnFailure: Boolean = false): Unit = {
    val out = fs.create(p, overwrite)
    var ok = false
    try { out.write(leaseBody(token)); out.close(); ok = true }
    finally if (!ok) {
      try out.close() catch { case _: Throwable => () }
      if (cleanupOnFailure)
        try fs.delete(p, false) catch { case _: java.io.IOException => () }
    }
  }

  private def readBody(p: HPath): String =
    try {
      val in = fs.open(p)
      val bytes =
        try in.readNBytes(4096)
        finally in.close()
      new String(bytes, StandardCharsets.UTF_8)
    } catch { case _: java.io.IOException => "" } // torn/raced read: floor

  private def readToken(p: HPath): Long =
    "token=(\\d+)".r.findFirstMatchIn(readBody(p))
      .map(_.group(1).toLong).getOrElse(0L)

  /** Post-create owner-readback — closes MOST of the S3A check-then-put
    * window the scaladoc admits: `create(overwrite=false)` is atomic on
    * HDFS but on S3A is an existence check followed by a PUT, so two
    * foreign processes can both "succeed". Reading the lease back and
    * yielding unless the body is EXACTLY ours (owner is host#pid — unique
    * per process; same-process threads never reach the file, the JVM gate
    * serializes them) means the loser of a last-writer-wins double-PUT
    * withdraws. Residual window: a PUT that lands after the winner's
    * readback — only a conditional-write (If-None-Match) API closes that,
    * which the Hadoop FS surface doesn't expose; the protocol remains
    * documented best-effort on S3A. */
  private def createVerified(p: HPath, token: Long): Boolean = {
    writeLease(p, token, overwrite = false, cleanupOnFailure = true)
    val ours = new String(leaseBody(token), StandardCharsets.UTF_8)
    readBody(p) == ours
  }

  /** One acquisition attempt against the lease FILE (the JVM gate is
    * already held). Some(token) on success. Tokens are acquire-time
    * wall-clock ms, bumped past a broken lease's token — monotone across
    * the lock's whole lifetime (including clean release → re-acquire)
    * under the same bounded-clock-skew assumption the expiry rule
    * already makes. */
  private def tryAcquireFile(p: HPath): Option[Long] = {
    // fresh-create fast path (owner-readback verified — see createVerified)
    try {
      val t = LeaseLocker.nextToken(0L)
      if (createVerified(p, t)) return Some(t) else return None
    }
    catch { case _: java.io.IOException => () }
    // create failed: existing lease (or transient IO error — re-surface
    // the latter so withLock doesn't spin on a broken filesystem)
    val st =
      try fs.getFileStatus(p)
      catch {
        case _: java.io.FileNotFoundException =>
          // raced: holder released between create and stat; next poll wins
          return None
      }
    if (System.currentTimeMillis() - st.getModificationTime <= leaseExpiryMs)
      return None // live foreign holder
    // Expired lease: break it via ATOMIC RENAME to a unique trash path.
    // Delete-then-create is racy two ways: a second breaker's delete can
    // remove the FIRST breaker's freshly created lease (two holders), and
    // the stat→break window can hit a lease a faster breaker just
    // re-created. Rename closes the first (exactly one rename of the same
    // source succeeds on HDFS/local; S3A rename is copy+delete — the
    // whole protocol is documented best-effort there) and the second is
    // caught by re-checking the renamed file's mtime: if it is FRESH we
    // renamed a live lease — put it back (and even if the rename-back
    // loses a race, the live holder's next heartbeat re-creates its lease
    // with an overwrite create within heartbeatMs).
    val trash = new HPath(p.getParent,
      s"${p.getName}.broken.${System.nanoTime()}")
    val renamed =
      try fs.rename(p, trash)
      catch { case _: java.io.IOException => false }
    if (!renamed) return None // another breaker won this round
    val stillExpired =
      try System.currentTimeMillis() -
        fs.getFileStatus(trash).getModificationTime > leaseExpiryMs
      catch { case _: java.io.IOException => false }
    if (!stillExpired) {
      try fs.rename(trash, p) catch { case _: java.io.IOException => () }
      return None
    }
    val deadToken = readToken(trash)
    try fs.delete(trash, false) catch { case _: java.io.IOException => () }
    val t = LeaseLocker.nextToken(deadToken + 1L)
    try { if (createVerified(p, t)) Some(t) else None }
    catch { case _: java.io.IOException => None }
  }

  private def withHeartbeat[T](p: HPath, token: Long)(body: => T): T = {
    // Ownership is re-checked before every lease write/delete: a holder
    // that stalled past expiry and was BROKEN must not resurrect the lock
    // file over the new holder's lease (its heartbeat would regress the
    // token, and its release would delete a live lease, admitting a third
    // holder). readToken != ours → we are a zombie → do nothing; the
    // fencing token is what protects the downstream store, this check
    // stops the lock file itself from being clobbered.
    //
    // Release-vs-in-flight-beat: a beat already past its readToken check
    // when release deletes the lease would re-create an UNOWNED lease with
    // a fresh mtime, blocking every acquirer (the ex-holder included) for
    // up to leaseExpiryMs. The `done` flag narrows but cannot close that
    // window; `beatGate` closes it — the beat holds the gate for its whole
    // read→write span, and release acquires the gate AFTER cancelling, so
    // by the time release's delete runs no beat is mid-flight and none can
    // start (cancelled). The gate is per-lease; the shared single-thread
    // scheduler never self-deadlocks on it because release runs on the
    // caller's thread.
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beatGate = new ReentrantLock()
    val beat: ScheduledFuture[_] = LeaseLocker.heartbeats.scheduleAtFixedRate(
      () => {
        beatGate.lock()
        try {
          if (!done.get() && readToken(p) == token)
            writeLease(p, token, overwrite = true)
        } catch { case _: java.io.IOException => () }
        finally beatGate.unlock()
      },
      heartbeatMs, heartbeatMs, TimeUnit.MILLISECONDS)
    try body
    finally {
      done.set(true)
      beat.cancel(false)
      beatGate.lock() // join any in-flight beat before deleting
      try { if (readToken(p) == token) fs.delete(p, false) }
      catch { case _: java.io.IOException => () } // expires on its own
      finally beatGate.unlock()
    }
  }

  // qualified lease path → the token the current holder acquired with, so
  // a REENTRANT acquisition hands the body the real live token (a -1 there
  // would silently disable FenceGuard checks inside nested sections)
  private def qualified(key: String): String =
    fs.makeQualified(leasePath(key)).toString

  /** [[withLock]] with the fencing token passed to the body — hand it to
    * any store that must reject a zombie ex-holder's writes
    * ([[FenceGuard]]). */
  override def withLockFenced[T](key: String)(body: Long => T): T = {
    val l = jvmLock(key)
    l.lock()
    try {
      if (l.getHoldCount > 1)
        body(LeaseLocker.activeTokens.getOrDefault(qualified(key), -1L))
      else {
        val p = leasePath(key)
        var token = tryAcquireFile(p)
        while (token.isEmpty) {
          Thread.sleep(pollMs)
          token = tryAcquireFile(p)
        }
        LeaseLocker.activeTokens.put(qualified(key), token.get)
        try withHeartbeat(p, token.get)(body(token.get))
        finally LeaseLocker.activeTokens.remove(qualified(key))
      }
    } finally l.unlock()
  }

  def withLock[T](key: String)(body: => T): T =
    withLockFenced(key)(_ => body)

  def tryWithLock[T](key: String)(body: => T): Option[T] = {
    val l = jvmLock(key)
    if (!l.tryLock()) return None
    try {
      if (l.getHoldCount > 1) Some(body) // reentrant
      else {
        val p = leasePath(key)
        tryAcquireFile(p).map { t =>
          LeaseLocker.activeTokens.put(qualified(key), t)
          try withHeartbeat(p, t)(body)
          finally LeaseLocker.activeTokens.remove(qualified(key))
        }
      }
    } finally l.unlock()
  }
}

object LeaseLocker {
  private val jvmLocks = new ConcurrentHashMap[String, ReentrantLock]()
  private val activeTokens = new ConcurrentHashMap[String, Long]()

  // Tokens are acquire-time wall-clock ms, floored past a broken lease's
  // token AND made STRICTLY monotone within this JVM: two acquisitions in
  // the same millisecond must not mint equal tokens or two successive
  // holders would both pass a FenceGuard's `token >= stored` check.
  // Cross-process strictness still rests on the protocol's bounded-clock-
  // skew assumption (plus the +1 floor over any token read from disk).
  private val lastToken = new java.util.concurrent.atomic.AtomicLong(0L)
  private def nextToken(floor: Long): Long =
    lastToken.updateAndGet(prev =>
      math.max(math.max(System.currentTimeMillis(), floor), prev + 1))
  private lazy val heartbeats = Executors.newScheduledThreadPool(1, r => {
    val t = new Thread(r, "graft-lease-heartbeat")
    t.setDaemon(true)
    t
  })
}

/** Subprocess main for the REAL two-process lease test (LeaseLockerSpec
  * spawns it with the test JVM's own classpath): acquire `key` in `dir`,
  * print `HELD`, hold for `holdMs`, release, print `RELEASED`. Exercises
  * acquisition, heartbeat, and release from a genuinely foreign PID. */
object LeaseHold {
  def main(args: Array[String]): Unit = {
    val Array(dir, key, holdMs) = args
    val locker = new LeaseLocker(dir, new Configuration(),
      leaseExpiryMs = 60000L, heartbeatMs = 300L, pollMs = 100L)
    locker.withLock(key) {
      println("HELD")
      System.out.flush()
      Thread.sleep(holdMs.toLong)
    }
    println("RELEASED")
  }
}
