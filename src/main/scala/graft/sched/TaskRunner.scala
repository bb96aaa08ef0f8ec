package graft.sched

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Scheduling / orchestration surface — the reference's coordinator +
  * task-DAG layer (scheduling/task_dag.go:17-73, coordinator/scheduler.go:
  * 24-117, `max_job_duration` provider/offline.go:251,378-411) collapsed to
  * one process:
  *
  *  - durable TASK-RUN RECORDS: every attempt appends a JSON line to
  *    `<stateDir>/task_runs.jsonl` (status, attempt, timings, error) — the
  *    etcd/psql task-run table's single-process analogue;
  *  - RETRY with exponential backoff up to `maxAttempts`;
  *  - `maxJobDuration` enforcement: the body runs in a Spark job group that
  *    is CANCELLED on timeout (the same kill the reference issues to
  *    long-running materializations), and the run records `timeout`;
  *  - RESUME: a (task, runKey) that already has a `success` record is
  *    skipped — re-running a crashed pipeline re-executes only what did not
  *    complete, which is what makes the version-dir writers + idempotent
  *    upserts end-to-end restartable;
  *  - RUN CLAIMING across coordinators: ledger rewrites and (task, runKey)
  *    executions are guarded by a [[Locker]] — [[FileLocker]] (cross-
  *    process file locks beside the ledger) on local stateDirs — so
  *    several JVMs sharing one stateDir execute each task exactly once
  *    (reference ffsync/locker.go:110 + scheduling run claiming); a
  *    runner that loses the claim race reports status "locked" without
  *    executing;
  *  - [[Schedule]]: fixed-interval due-time evaluation (the reference
  *    stores cron-ish schedule strings on resources; evaluation is a pure
  *    function here, the driver loop belongs to the caller).
  */
final case class TaskRun(task: String, runKey: String, attempt: Int,
                         status: String, startMs: Long, endMs: Long,
                         error: Option[String])

final case class Schedule(everyMs: Long, offsetMs: Long = 0L) {
  require(everyMs > 0)
  /** Latest due tick at or before `nowMs` (None if before the first). */
  def lastDue(nowMs: Long): Option[Long] =
    if (nowMs < offsetMs) None
    else Some(offsetMs + (nowMs - offsetMs) / everyMs * everyMs)
  /** Is a run due at `nowMs`, given the previous completed tick? */
  def isDue(nowMs: Long, lastRunTickMs: Option[Long]): Boolean =
    lastDue(nowMs).exists(t => lastRunTickMs.forall(_ < t))
}

final class TaskRunner(spark: SparkSession, stateDir: String,
                       maxAttempts: Int = 3,
                       maxJobDuration: java.time.Duration = java.time.Duration.ofHours(4),
                       backoffMs: Long = 100L,
                       locker: Locker = null) {

  private val mapper = new ObjectMapper()
  private val file = new Path(s"$stateDir/task_runs.jsonl")
  private def fs = file.getFileSystem(spark.sparkContext.hadoopConfiguration)
  // Cross-runner exclusion (reference ffsync.Locker, ffsync/locker.go:110):
  // a FileLocker beside the ledger when stateDir is a local path — two JVMs
  // sharing one stateDir then serialize ledger rewrites and claim runs
  // exactly once. Non-local stateDirs (hdfs:/s3:) fall back to the
  // in-process MemoryLocker: correct single-JVM, and a distributed store
  // should bring its own locker (the reference's psql locker role).
  private val lock: Locker = Option(locker).getOrElse(Locker.forDir(stateDir))
  // Store-side fencing (reference: psql advisory locks guard the task-run
  // table, ffsync/locker.go:110): every ledger REWRITE carries the lease's
  // fencing token past the guard first, so a zombie coordinator whose
  // __ledger__ lease was broken mid-stall gets StaleFenceException instead
  // of clobbering records the new holder wrote. File/Memory lockers pass
  // Unfenced (-1) — their exclusion cannot be broken, no zombie exists.
  private val fence = new FenceGuard(stateDir,
    spark.sparkContext.hadoopConfiguration, "task_runs")
  // Successes recorded BY THIS INSTANCE, mirrored in memory so the resume
  // check can never miss a record this process just wrote (the durable file
  // stays the cross-restart source of truth; append() fails loudly if the
  // rewrite cannot be made durable).
  private val localSuccesses =
    scala.collection.mutable.Set.empty[(String, String)]

  // LOCAL ledgers append through java.io (reads too — java.io appends
  // would leave any fs-written .crc sidecar stale for Hadoop's checksummed
  // LocalFileSystem reads). Non-local stateDirs keep the Hadoop path; a
  // distributed deployment brings a run table the way it brings a locker.
  private val localLedgerFile: Option[java.io.File] = {
    val scheme = file.toUri.getScheme
    if (scheme == null || scheme == "file")
      Some(new java.io.File(file.toUri.getPath))
    else None
  }

  // Reads take the ledger lock too: the rewrite's delete→rename pair is
  // crash-atomic but leaves a no-file window a concurrent READER could
  // observe, silently missing every record (and succeeded() would then
  // re-execute a completed task).
  def runs(): Seq[TaskRun] = lock.withLock("__ledger__")(runsLocked())

  private def runsLocked(): Seq[TaskRun] = {
    val text = localLedgerFile match {
      case Some(f) =>
        if (!f.exists()) return Nil
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      case None =>
        healRewritesLocked(file, ledgerTmps)
        if (!fs.exists(file)) return Nil
        val in = fs.open(file)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val lines = text.linesIterator.filter(_.nonEmpty).toVector
    lines.iterator.zipWithIndex.flatMap { case (line, i) =>
      try {
        val m = mapper.readValue(line, classOf[java.util.Map[String, Any]])
        Some(TaskRun(m.get("task").toString, m.get("runKey").toString,
          m.get("attempt").asInstanceOf[Number].intValue(), m.get("status").toString,
          m.get("startMs").asInstanceOf[Number].longValue(),
          m.get("endMs").asInstanceOf[Number].longValue(),
          Option(m.get("error")).map(_.toString)))
      } catch {
        // a TORN TAIL — the append-mode writer crashed mid-line — loses
        // exactly the in-flight record, the same outcome as crashing
        // before the old rewrite's rename; anything malformed EARLIER
        // than the last line is real corruption and must fail loudly
        case e: Exception if i == lines.size - 1 =>
          org.slf4j.LoggerFactory.getLogger("graft.TaskRunner").warn(
            s"dropping torn final ledger line (${line.length} bytes): $e")
          None
      }
    }.toSeq
  }

  // The read + tmp + rename rewrite below is atomic against crashes; the
  // ledger lock (cross-process via FileLocker on local stateDirs) makes it
  // atomic against CONCURRENT TaskRunner instances sharing one stateDir
  // too — each rewrite reads the other's records before appending its own.
  private def append(r: TaskRun): Unit = synchronized {
    lock.withLockFenced("__ledger__") { tok =>
      fence.check(tok)
      appendLocked(r)
    }
  }

  /** The one place a TaskRun becomes a ledger line — append and
    * compaction must never diverge on the on-disk format. */
  private def ledgerLine(r: TaskRun): String = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("task", r.task); m.put("runKey", r.runKey); m.put("attempt", r.attempt)
    m.put("status", r.status); m.put("startMs", r.startMs); m.put("endMs", r.endMs)
    r.error.foreach(e => m.put("error", e))
    mapper.writeValueAsString(m) + "\n"
  }

  private def appendLocked(r: TaskRun): Unit = {
    // absorb rows OTHER runners appended since our last refresh FIRST —
    // the post-append stamp below covers them, so skipping this would
    // stamp-cover foreign rows the index never saw, and a stale index
    // means a raced daemon re-executes a completed run (the exact
    // double-success this ledger exists to prevent). The refresh is a
    // stat when nothing foreign changed, so the single-writer fast path
    // (every daemon attempt record) stays O(1).
    refreshIndexLocked()
    val line = ledgerLine(r)
    localLedgerFile match {
      case Some(f) =>
        // O(1) true append, fsynced — the old read+rewrite was O(ledger)
        // PER RECORD, an O(n²) tail for the always-on daemon's attempt
        // stream. A crash mid-append leaves a torn final line that
        // runsLocked drops (same loss as crashing before a rewrite's
        // rename). Durability before the claim releases: getFD().sync().
        f.getParentFile.mkdirs()
        healTornTail(f)
        val out = new java.io.FileOutputStream(f, true)
        try {
          out.write(line.getBytes("UTF-8"))
          out.getFD.sync()
        } finally out.close()
      case None =>
        // non-local store: LocalFileSystem-style append is unavailable /
        // unreliable across Hadoop bindings, and records are metadata-
        // scale — read + atomic rewrite (tmp + rename) keeps it durable.
        // Heal first: a prior rewrite's crash window may have left the
        // whole ledger only in an orphaned tmp, and the index stamp
        // ((0,0) for a missing dest) would otherwise skip the read-side
        // adoption and silently clobber it below
        fs.mkdirs(new Path(stateDir))
        healRewritesLocked(file, ledgerTmps)
        val existing =
          if (fs.exists(file)) {
            val in = fs.open(file)
            try new String(in.readAllBytes(), "UTF-8") finally in.close()
          } else ""
        val tmp = new Path(s"$stateDir/.task_runs.jsonl.tmp")
        val out = fs.create(tmp, true)
        // hsync BEFORE the destructive delete below: the heal invariant
        // (healRewritesLocked — "tmp files always carry the full intended
        // content") must hold under node power-loss too, and on real HDFS
        // bindings close() completes the file without guaranteeing
        // datanode flush; FSDataOutputStream.hsync falls back to flush()
        // where the wrapped stream is not Syncable, so this is safe on
        // every binding.
        out.write((existing + line).getBytes("UTF-8")); out.hsync(); out.close()
        // A silently failed delete or rename would drop this record from
        // the durable ledger — succeeded() would then miss the resume
        // check and a re-run would append a duplicate success. Fail
        // loudly instead.
        if (fs.exists(file) && !fs.delete(file, false))
          sys.error(s"TaskRunner: could not delete $file during ledger rewrite")
        if (!fs.rename(tmp, file))
          sys.error(s"TaskRunner: could not rename $tmp -> $file during ledger rewrite")
    }
    if (r.status == "success") localSuccesses += ((r.task, r.runKey))
    indexAdd(r)
    recordCount += 1
    indexStamp = fileStamp()
    signalChange() // wake long-poll watchers blocked in awaitChange
  }

  /** Non-local rewrites (append's read+rewrite, log appends, compaction)
    * commit via write-tmp → delete-dest → rename; a crash between the
    * delete and the rename leaves NO dest but a COMPLETE tmp (tmp files
    * always carry the full intended content and are written+closed before
    * the delete). Heal BOTH halves of that window, under the ledger lock,
    * before every non-local read or rewrite:
    *  - dest missing: adopt the NEWEST orphaned tmp (mtime — an older
    *    leftover from a different crashed rewrite must not shadow it);
    *  - dest present: delete leftover tmps — they are uncommitted
    *    rewrites from a crash before their delete (same single-record
    *    loss as crashing before the write), and left lying around they
    *    could shadow a FUTURE orphan adoption with stale content.
    * Local stores never hit this (true appends + ATOMIC_MOVE). */
  private def healRewritesLocked(dest: Path, tmps: Seq[Path]): Unit = {
    if (!fs.exists(dest)) {
      val orphans = tmps.filter(fs.exists(_))
      if (orphans.nonEmpty) {
        val newest = orphans.maxBy(t => fs.getFileStatus(t).getModificationTime)
        org.slf4j.LoggerFactory.getLogger("graft.TaskRunner").warn(
          s"adopting orphaned rewrite $newest as $dest (crash between delete and rename)")
        if (!fs.rename(newest, dest))
          sys.error(s"TaskRunner: could not adopt $newest as $dest")
      }
    }
    if (fs.exists(dest))
      tmps.foreach(t => if (fs.exists(t)) fs.delete(t, false))
  }

  private def ledgerTmps = Seq(new Path(s"$stateDir/.task_runs.jsonl.compact"),
    new Path(s"$stateDir/.task_runs.jsonl.tmp"))
  private def logsTmps = Seq(new Path(s"$stateDir/.run_logs.jsonl.tmp"))

  /** A crashed writer's partial final line must not FUSE with the next
    * append (the merged bytes would read as one malformed line that is no
    * longer last — a loud failure on a healable ledger). We hold the
    * exclusive ledger claim here, so the fragment is dead bytes: truncate
    * back to the last complete line. O(1) when the tail is intact (one
    * positional read of the final byte); the scan-back runs only on the
    * rare post-crash append. */
  private def healTornTail(f: java.io.File): Unit = {
    if (!f.exists() || f.length() == 0) return
    val ch = java.nio.channels.FileChannel.open(f.toPath,
      java.nio.file.StandardOpenOption.READ,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val len = ch.size()
      val one = java.nio.ByteBuffer.allocate(1)
      ch.read(one, len - 1)
      if (one.get(0) != '\n'.toByte) {
        val all = java.nio.file.Files.readAllBytes(f.toPath)
        var i = all.length - 1
        while (i >= 0 && all(i) != '\n'.toByte) i -= 1
        org.slf4j.LoggerFactory.getLogger("graft.TaskRunner").warn(
          s"truncating torn ledger tail (${all.length - i - 1} bytes) in $f")
        ch.truncate((i + 1).toLong)
      }
    } finally ch.close()
  }

  def succeeded(task: String, runKey: String): Boolean =
    synchronized(localSuccesses.contains((task, runKey))) ||
      latestRun(task, runKey).exists(_.status == "success")

  // ---------- latest-run index (the Tasks service's read path) ----------
  // The gRPC Tasks service (and the scheduler's poll loop) ask "current
  // state per run" on every RPC/tick; regrouping the full ledger each time
  // is O(ledger) per call. The index is maintained on every local append
  // and refreshed from the durable file only when ANOTHER process changed
  // it — detected by an (mtime, length) fingerprint, a stat not a read.
  // Ties on attempt keep the LAST appended record (latest state wins).

  private val runIndex =
    scala.collection.mutable.LinkedHashMap.empty[(String, String), TaskRun]
  private var indexStamp: (Long, Long) = (-1L, -1L)
  // total ledger RECORDS (attempt rows) — maintained beside the index so
  // the auto-compaction policy check is O(1), not a full ledger read
  private var recordCount: Long = 0L

  private def fileStamp(): (Long, Long) = localLedgerFile match {
    case Some(f) =>
      if (!f.exists()) (0L, 0L) else (f.lastModified(), f.length())
    case None =>
      if (!fs.exists(file)) (0L, 0L)
      else { val st = fs.getFileStatus(file); (st.getModificationTime, st.getLen) }
  }

  private def refreshIndexLocked(): Unit = {
    val st = fileStamp()
    if (st != indexStamp) {
      runIndex.clear()
      val all = runsLocked()
      all.foreach(indexAdd)
      recordCount = all.size
      indexStamp = st
    }
  }

  private def indexAdd(r: TaskRun): Unit = synchronized {
    val k = (r.task, r.runKey)
    if (runIndex.get(k).forall(_.attempt <= r.attempt)) runIndex.put(k, r)
  }

  /** Latest record per (task, runKey) — each run's current state, sorted
    * by (task, runKey). O(1) after warm when only this process writes.
    * Lock order matches [[append]] (`this` monitor, then the ledger lock)
    * so index reads can never deadlock against a concurrent append. */
  def latestRuns(): Seq[TaskRun] = synchronized {
    lock.withLock("__ledger__") { refreshIndexLocked() }
    runIndex.values.toSeq.sortBy(r => (r.task, r.runKey))
  }

  /** Current state of one run, if it exists. */
  def latestRun(task: String, runKey: String): Option[TaskRun] = synchronized {
    lock.withLock("__ledger__") { refreshIndexLocked() }
    runIndex.get((task, runKey))
  }

  /** Total attempt records in the ledger vs [[latestRuns]]' live-run
    * count — the auto-compaction policy's inputs. O(1) after warm (the
    * count rides the index). */
  def ledgerRecords(): Long = synchronized {
    lock.withLock("__ledger__") { refreshIndexLocked() }
    recordCount
  }

  /** Service-plane append — the Tasks gRPC service's write path
    * (reference scheduling.proto SetRunStatus/SetRunEndTime land as task
    * run table updates): record an externally-reported run state
    * transition in the ledger under the same lock + fence as run-recorded
    * attempts. The ledger stays an append-only attempt log; readers take
    * the latest (runKey, attempt) per run. */
  def record(r: TaskRun): Unit = append(r)

  // -------- run log sidecar (reference AddRunLog, scheduling.proto:29) --

  private val logsFile = new Path(s"$stateDir/run_logs.jsonl")

  // Local stateDirs (the FileLocker case) get true O(1) appends through
  // java.io — Hadoop's checksummed LocalFileSystem rejects append(), and
  // the old read+rewrite was O(total log) PER LINE under the ledger lock,
  // so a chatty AddRunLog client degraded every Tasks RPC sharing the
  // lock. Reads go through the same java.io path (direct appends would
  // leave any fs-written .crc sidecar stale). Non-local stateDirs keep
  // the rewrite (run logs are metadata-scale; a distributed deployment
  // brings a log store the way it brings a locker).
  private val localLogsFile: Option[java.io.File] = {
    val scheme = logsFile.toUri.getScheme
    if (scheme == null || scheme == "file")
      Some(new java.io.File(logsFile.toUri.getPath))
    else None
  }

  /** Append a log line for (task, runKey) — durable beside the ledger,
    * under the same lock. */
  def addRunLog(task: String, runKey: String, log: String): Unit =
    lock.withLock("__ledger__") {
      val m = new java.util.LinkedHashMap[String, Any]()
      m.put("task", task); m.put("runKey", runKey); m.put("log", log)
      val line = mapper.writeValueAsString(m) + "\n"
      localLogsFile match {
        case Some(f) =>
          f.getParentFile.mkdirs()
          healTornTail(f)
          val out = new java.io.FileOutputStream(f, true)
          // fsync like the ledger append: a crash that persists the
          // fsynced run row but loses this sidecar line would silently
          // strip a SCHEDULE-minted run's __cron__/__scheduler__
          // provenance — the Tasks service would then report it as
          // ON_APPLY with no scheduler id after restart
          try { out.write(line.getBytes("UTF-8")); out.getFD.sync() }
          finally out.close()
        case None =>
          fs.mkdirs(new Path(stateDir))
          healRewritesLocked(logsFile, logsTmps) // same crash window as the ledger
          val existing =
            if (fs.exists(logsFile)) {
              val in = fs.open(logsFile)
              try new String(in.readAllBytes(), "UTF-8") finally in.close()
            } else ""
          val tmp = new Path(s"$stateDir/.run_logs.jsonl.tmp")
          val out = fs.create(tmp, true)
          // same power-loss invariant as the ledger rewrite: the tmp must
          // be durably complete before the dest is deleted
          out.write((existing + line).getBytes("UTF-8")); out.hsync(); out.close()
          if (fs.exists(logsFile) && !fs.delete(logsFile, false))
            sys.error(s"TaskRunner: could not delete $logsFile during log rewrite")
          if (!fs.rename(tmp, logsFile))
            sys.error(s"TaskRunner: could not rename $tmp -> $logsFile")
      }
    }

  /** (mtime, length) fingerprint of the run-log sidecar — a lock-free
    * stat, the cache key for readers (e.g. the scheduler's own-orphan
    * check) that want to re-read the file only when it actually
    * changed. (0,0) when the file does not exist. */
  def runLogsStamp(): (Long, Long) = localLogsFile match {
    case Some(f) =>
      if (!f.exists()) (0L, 0L) else (f.lastModified(), f.length())
    case None =>
      if (!fs.exists(logsFile)) (0L, 0L)
      else { val st = fs.getFileStatus(logsFile)
        (st.getModificationTime, st.getLen) }
  }

  /** Log lines for (task, runKey), append order. */
  def runLogs(task: String, runKey: String): Seq[String] =
    lock.withLock("__ledger__") {
      val text = localLogsFile match {
        case Some(f) =>
          if (!f.exists()) return Nil
          new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        case None =>
          healRewritesLocked(logsFile, logsTmps)
          if (!fs.exists(logsFile)) return Nil
          val in = fs.open(logsFile)
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      val lines = text.linesIterator.filter(_.nonEmpty).toVector
      lines.iterator.zipWithIndex.flatMap { case (line, i) =>
        try {
          val m = mapper.readValue(line, classOf[java.util.Map[String, Any]])
          if (m.get("task") == task && m.get("runKey") == runKey)
            Some(m.get("log").toString)
          else None
        } catch {
          // same torn-tail rule as the ledger: only the final line may be
          // a crashed writer's fragment
          case _: Exception if i == lines.size - 1 => None
        }
      }.toSeq
    }

  // ------------------------- cancellation (reference coordinator's kill
  // path: a run whose status is set to CANCELLED mid-flight has its Spark
  // jobs killed and stops retrying).

  private val activeAttempts =
    scala.collection.concurrent.TrieMap.empty[(String, String), (String, Thread)]
  private val cancelRequests =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()

  /** Request cancellation of (task, runKey). If an attempt is in flight IN
    * THIS PROCESS, its Spark job group is cancelled and the body thread
    * interrupted — the attempt loop then records status "cancelled" and
    * stops retrying. The request latches: a not-yet-started run of the
    * same key is refused at claim time. Returns whether an in-flight
    * attempt was killed. */
  def cancel(task: String, runKey: String): Boolean = {
    cancelRequests.add((task, runKey))
    activeAttempts.get((task, runKey)) match {
      case Some((groupId, thread)) =>
        spark.sparkContext.cancelJobGroup(groupId)
        thread.interrupt()
        true
      case None => false
    }
  }

  /** Has [[cancel]] been requested for this run (in this process)? */
  def cancelRequested(task: String, runKey: String): Boolean =
    cancelRequests.contains((task, runKey))

  /** Is (task, runKey)'s execution claim currently FREE — i.e. no live
    * runner (this process or, via the FileLocker, any other) holds it?
    * Probe-only: acquires and immediately releases. A `running` ledger
    * row whose claim is free is an ORPHAN from a crashed coordinator —
    * the Tasks service's SyncUnfinishedRuns re-queues exactly those. */
  def claimFree(task: String, runKey: String): Boolean =
    lock.tryWithLock(s"run!$task!$runKey")(true).getOrElse(false)

  /** Run `body` with retry/backoff/timeout, recording every attempt.
    * Returns the final record; a previously-succeeded (task, runKey) is
    * skipped with status "skipped" (resume semantics).
    *
    * RUN CLAIMING (reference scheduling/scheduling.go run claiming over
    * ffsync): the (task, runKey) is claimed under the locker for the whole
    * attempt loop. A concurrent runner — another thread or, with the
    * FileLocker, another PROCESS sharing this stateDir — that finds the
    * claim taken returns status "locked" WITHOUT executing or appending
    * (the claim holder's records are the authoritative ones), so a task
    * set raced by two coordinators executes each task exactly once. The
    * success re-check happens INSIDE the claim, closing the
    * check-then-run window. */
  def run[T](task: String, runKey: String)(body: => T): (TaskRun, Option[T]) = {
    if (succeeded(task, runKey)) {
      val now = System.currentTimeMillis()
      return (TaskRun(task, runKey, 0, "skipped", now, now, None), None)
    }
    lock.tryWithLock(s"run!$task!$runKey")(runClaimed(task, runKey)(body))
      .getOrElse {
        val now = System.currentTimeMillis()
        (TaskRun(task, runKey, 0, "locked", now, now,
          Some("claimed by a concurrent runner")), None)
      }
  }

  private def runClaimed[T](task: String, runKey: String)(body: => T): (TaskRun, Option[T]) = {
    if (succeeded(task, runKey)) {
      val now = System.currentTimeMillis()
      return (TaskRun(task, runKey, 0, "skipped", now, now, None), None)
    }
    // Seed attempt numbering PAST the run's latest existing record: the
    // index keeps the max-attempt record per run, and the service plane
    // mints bookkeeping rows at latest+1 (SetRunStatus, the orphan
    // re-queue), so a run whose latest row is pending@2 must record its
    // outcome at attempt 3+ — a success@1 under a pending@2 would be
    // permanently buried: GetRunMetadata reports PENDING forever and a
    // restarted daemon re-executes completed work.
    val base = latestRun(task, runKey).map(_.attempt).getOrElse(0)
    var attempt = base + 1
    var last: TaskRun = null
    while (attempt <= base + maxAttempts) {
      if (cancelRequests.contains((task, runKey))) {
        val now = System.currentTimeMillis()
        last = TaskRun(task, runKey, attempt, "cancelled", now, now,
          Some("cancelled before attempt started"))
        append(last)
        return (last, None)
      }
      val start = System.currentTimeMillis()
      val groupId = s"graft-task-$task-$runKey-$attempt"
      val result: Either[TaskRunner.Cause, T] =
        try {
          spark.sparkContext.setJobGroup(groupId, task, interruptOnCancel = true)
          // dedicated thread (not a shared pool) so a timed-out body can be
          // interrupted — cancelJobGroup kills Spark jobs but not arbitrary
          // driver-side code, and an abandoned thread would otherwise still
          // be running when the retry loop starts attempt N+1
          val promise = scala.concurrent.Promise[T]()
          val runner = new Thread(() => {
            // explicit catch-all: Try() would rethrow InterruptedException
            // (fatal per NonFatal), escaping the thread as console noise
            val r = try scala.util.Success(body)
                    catch { case t: Throwable => scala.util.Failure(t) }
            promise.tryComplete(r); ()
          }, s"$groupId-body")
          runner.setDaemon(true)
          // register BEFORE start: a cancel() arriving the instant the body
          // begins must find the attempt, or it would only latch and the
          // in-flight Spark job would run to completion
          activeAttempts.put((task, runKey), (groupId, runner))
          runner.start()
          try {
            val v = scala.concurrent.Await.result(promise.future,
              scala.concurrent.duration.Duration.fromNanos(maxJobDuration.toNanos))
            Right(v)
          } catch {
            case _: java.util.concurrent.TimeoutException =>
              spark.sparkContext.cancelJobGroup(groupId) // the reference's kill
              runner.interrupt()
              runner.join(5000) // grace; a body that ignores interrupts is
              // logged and left behind rather than blocking the retry loop
              if (runner.isAlive)
                org.slf4j.LoggerFactory.getLogger("graft.TaskRunner").warn(
                  s"$groupId: body thread ignored interrupt after timeout; " +
                    "it may still be running while the next attempt starts")
              Left(TaskRunner.Timeout)
            case _: InterruptedException =>
              // THIS (waiting) thread was interrupted — a scheduler
              // shutdown's shutdownNow, not a body failure. Treating it as
              // an ordinary failure would retry: a SECOND body thread
              // spawned while the first (never interrupted on this path)
              // still runs, and a terminal `failed` row that no reconcile
              // re-queues — a graceful stop would then abandon the run
              // where a SIGKILL (leaving `running`) gets it re-queued.
              // Kill the in-flight work and mark it interrupted instead.
              spark.sparkContext.cancelJobGroup(groupId)
              runner.interrupt()
              runner.join(5000)
              Thread.interrupted() // clear so the append below can run
              Left(TaskRunner.Interrupted)
            case e: Throwable =>
              Left(TaskRunner.BodyFailure(Option(e.getMessage).getOrElse(e.toString)))
          }
        } finally {
          activeAttempts.remove((task, runKey))
          spark.sparkContext.clearJobGroup()
        }
      val end = System.currentTimeMillis()
      result match {
        case Right(v) =>
          last = TaskRun(task, runKey, attempt, "success", start, end, None)
          append(last)
          return (last, Some(v))
        case Left(cause) =>
          // a failure caused by a cancel request (job-group kill /
          // interrupt) records "cancelled" and must NOT retry
          if (cancelRequests.contains((task, runKey))) {
            last = TaskRun(task, runKey, attempt, "cancelled", start, end,
              Some(s"cancelled: ${cause.msg}"))
            append(last)
            return (last, None)
          }
          // an interrupt WITHOUT a cancel request is a daemon shutdown:
          // re-queue as `pending` so a restarted (or surviving) daemon's
          // unfinished poll resumes the run — never retry here, the
          // worker pool is going down. The Cause ADT (not an error-message
          // string compare) means a body whose own exception message
          // happens to read "timeout"/"interrupted" still records plain
          // `failed` — only the runner's control paths mint these causes.
          if (cause == TaskRunner.Interrupted) {
            last = TaskRun(task, runKey, attempt, "pending", start, end,
              Some("re-queued: runner interrupted by shutdown"))
            append(last)
            return (last, None)
          }
          val status = if (cause == TaskRunner.Timeout) "timeout" else "failed"
          last = TaskRun(task, runKey, attempt, status, start, end, Some(cause.msg))
          append(last)
          if (attempt < base + maxAttempts) {
            // a shutdown interrupt can land HERE too — escaping would
            // strand the run on the terminal `failed` row just appended
            // (which no reconcile re-queues); tie a `pending` over it
            // (same attempt, last-appended wins) and stop
            try Thread.sleep(backoffMs << (attempt - base - 1))
            catch {
              case _: InterruptedException =>
                // same precedence as the attempt path: a latched cancel
                // wins over the shutdown re-queue — `pending` would let a
                // restarted daemon resurrect a run the client killed
                last =
                  if (cancelRequests.contains((task, runKey)))
                    TaskRun(task, runKey, attempt, "cancelled", start, end,
                      Some("cancelled during retry backoff"))
                  else
                    TaskRun(task, runKey, attempt, "pending", start, end,
                      Some("re-queued: runner interrupted during retry backoff"))
                append(last)
                return (last, None)
            }
          }
          attempt += 1
      }
    }
    (last, None)
  }

  /** Record a task that never ran because an upstream dependency failed —
    * the coordinator's cascade-skip ledger row ([[Dag.run]]). Attempt 0
    * marks "no execution happened", like resume-skips — unless the run
    * already carries higher-attempt bookkeeping rows (a wire SetRunStatus
    * or an orphan re-queue), in which case the record ties the latest
    * attempt so the max-attempt index surfaces it (last-appended wins on
    * ties) instead of burying it under a stale `pending`. */
  def recordUpstreamFailed(task: String, runKey: String,
                           failedUp: Seq[String],
                           runningGraceMs: Long = 300000L): TaskRun = {
    val now = System.currentTimeMillis()
    val cur = latestRun(task, runKey)
    // a run that already COMPLETED must never be cascade-marked: tying
    // its attempt would bury the success (last-appended wins on ties),
    // flipping succeeded() false and re-executing finished work
    if (cur.exists(c => c.status == "success" || c.status == "skipped"))
      return TaskRun(task, runKey, 0, "skipped", now, now, None)
    // ... nor may a FRESH `running` report be buried: a wire-external
    // executor (reachable via Dag.run, which has no orphan-age gate)
    // holds no claim lock, so its live RUNNING row would be tied over by
    // the cascade mark. Mirror the scheduler's staleness gate: a running
    // row younger than the grace window is presumed live — leave it to
    // record its own outcome (the cascade re-evaluates on a later pass
    // if the row goes stale).
    val live = cur.filter(c =>
      c.status == "running" && now - c.startMs < runningGraceMs)
    if (live.isDefined) return live.get
    val att = cur.map(_.attempt).getOrElse(0)
    val r = TaskRun(task, runKey, att, "upstream_failed", now, now,
      Some(s"upstream failed: ${failedUp.mkString(",")}"))
    append(r)
    r
  }

  /** Reconcile ledger state with EXECUTION reality — the reference
    * scheduler's TaskStatusSyncInterval pass (coordinator/scheduler.go:
    * 66-72, 94): a `running` row whose execution claim nobody holds is an
    * orphan from a crashed coordinator — re-queue it as `pending` so any
    * daemon's unfinished poll picks it up. The re-check and the re-queue
    * append happen INSIDE the run's claim lock: the old probe-release-
    * record shape raced a daemon that claimed and finished the run in the
    * window, and the re-queue row (higher attempt) would then bury the
    * outcome. A run whose claim is live is skipped (tryWithLock fails) —
    * its owner's records are truth.
    *
    * `olderThanMs` guards EXTERNAL executors: a wire client that reports
    * SetRunStatus(RUNNING) holds no claim lock, so a free claim is not
    * proof of death for it — the automatic daemon sync passes a staleness
    * threshold (only rows whose startMs is at least that old re-queue),
    * while the explicit SyncUnfinishedRuns RPC keeps 0 (a client invoking
    * the heal by hand asserts the executors are gone). It also closes the
    * daemon's own marker window: execute() appends its fresh `running`
    * marker BEFORE taking the claim, and a 0-threshold sweep in that gap
    * would mint a spurious re-queue. Returns the re-queued run count. */
  def syncUnfinishedRuns(olderThanMs: Long = 0L): Int = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    latestRuns().count { r =>
      r.status == "running" && r.startMs <= cutoff &&
        lock.tryWithLock(s"run!${r.task}!${r.runKey}") {
          // re-read INSIDE the claim: the row may have reached a terminal
          // state between the index read and the lock grant
          val cur = latestRun(r.task, r.runKey)
          if (cur.exists(c => c.status == "running" && c.startMs <= cutoff)) {
            record(cur.get.copy(attempt = cur.get.attempt + 1,
              status = "pending",
              error = Some("re-queued by SyncUnfinishedRuns: orphaned running row")))
            true
          } else false
        }.getOrElse(false)
    }
  }

  /** Compact the attempt ledger to ONE record per (task, runKey) — each
    * run's current state, the same record [[latestRuns]] serves. An
    * always-on daemon appends an attempt stream forever; appends are O(1)
    * but full reads ([[runs]], a restart's index build) stay O(records),
    * so a long-lived deployment compacts on its own cadence the way the
    * reference prunes its task-run table. Runs in O(records) once, under
    * the ledger lock + fence. Crash safety: local ledgers commit via an
    * ATOMIC_MOVE (old or new file, never partial); non-local stores lack
    * atomic replace, so a crash between the delete and the rename leaves
    * only the complete `.compact` tmp — which the next locked read adopts
    * ([[healMissingLedgerLocked]]). Run-log sidecars are untouched (they
    * are per-run provenance, not per-attempt history). Returns records
    * dropped.
    *
    * NOT called implicitly: per-attempt history is evidence (the gated
    * trace queries pin it), so collapsing it is the operator's explicit
    * choice. Current-state reads, resume semantics, and orphan reconcile
    * are all latest-record functions and survive compaction unchanged. */
  def compactLedger(): Int = synchronized {
    lock.withLockFenced("__ledger__") { tok =>
      fence.check(tok)
      val all = runsLocked()
      val latest = scala.collection.mutable.LinkedHashMap
        .empty[(String, String), TaskRun]
      all.foreach { r => // same rule as the index: max attempt, tie → last
        val k = (r.task, r.runKey)
        if (latest.get(k).forall(_.attempt <= r.attempt)) latest.put(k, r)
      }
      val dropped = all.size - latest.size
      if (dropped > 0) {
        val body = latest.values.map(ledgerLine).mkString
        localLedgerFile match {
          case Some(f) =>
            val tmp = new java.io.File(f.getParentFile, ".task_runs.jsonl.compact")
            val out = new java.io.FileOutputStream(tmp)
            try { out.write(body.getBytes("UTF-8")); out.getFD.sync() }
            finally out.close()
            java.nio.file.Files.move(tmp.toPath, f.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          case None =>
            val tmp = new Path(s"$stateDir/.task_runs.jsonl.compact")
            val out = fs.create(tmp, true)
            // durably complete before the delete — the crash-window heal
            // adopts this tmp as the WHOLE ledger, so a power-loss-
            // truncated tmp plus a deleted dest would lose history; hsync
            // (flush fallback on non-Syncable bindings) closes the window
            out.write(body.getBytes("UTF-8")); out.hsync(); out.close()
            if (fs.exists(file) && !fs.delete(file, false))
              sys.error(s"TaskRunner: could not delete $file during compaction")
            if (!fs.rename(tmp, file))
              sys.error(s"TaskRunner: could not rename $tmp -> $file")
        }
        runIndex.clear()
        latest.values.foreach(indexAdd)
        recordCount = latest.size
        indexStamp = fileStamp()
      }
      dropped
    }
  }

  // ------- cached current-state reads (the long-poll watch path) --------
  // WatchForCancel-style watchers poll a run's current state every ~50 ms;
  // routing each poll through latestRun would take the cross-process
  // ledger FILE lock per poll, contending with every append and Tasks RPC
  // sharing __ledger__. The cached read stats the file (lock-free) and
  // takes the lock ONLY when the (mtime,length) stamp shows a foreign
  // change; local appends wake waiting watchers immediately.

  private val changeMonitor = new Object

  /** Current state of one run off the in-memory index — takes the ledger
    * lock only when another process changed the file. */
  def latestRunCached(task: String, runKey: String): Option[TaskRun] =
    synchronized {
      if (fileStamp() != indexStamp)
        lock.withLock("__ledger__")(refreshIndexLocked())
      runIndex.get((task, runKey))
    }

  /** Block until a local append lands or `timeoutMs` passes — the watch
    * loop's wait primitive (foreign appends are caught by the next stamp
    * check). */
  def awaitChange(timeoutMs: Long): Unit =
    changeMonitor.synchronized { changeMonitor.wait(timeoutMs) }

  private def signalChange(): Unit =
    changeMonitor.synchronized { changeMonitor.notifyAll() }
}

object TaskRunner {
  /** Why an attempt did not return a value — a typed ADT, NOT an
    * error-message string: the old string sentinels ("timeout",
    * "__interrupted__") collided with any body exception whose message
    * matched, misclassifying a plain failure as a runner control event
    * (an endless re-queue loop for the interrupted case). */
  private[sched] sealed trait Cause { def msg: String }
  /** Attempt exceeded maxJobDuration — job group killed, retryable. */
  private[sched] case object Timeout extends Cause { val msg = "timeout" }
  /** The RUNNER thread was interrupted (daemon shutdown) — re-queued as
    * `pending`, never retried. */
  private[sched] case object Interrupted extends Cause { val msg = "interrupted" }
  /** The body itself threw. */
  private[sched] final case class BodyFailure(msg: String) extends Cause
}

/** Dependency-ordered task execution — the reference coordinator's task
  * DAG (scheduling/task_dag.go:17-73) on top of [[TaskRunner]]'s durable
  * ledger: tasks run in a deterministic topological order (Kahn with
  * lexicographic tie-break), a task whose upstream failed is recorded as
  * `upstream_failed` WITHOUT running its body (cascade skip), and resume
  * semantics come for free — a re-run of the same runKey re-executes only
  * what has no success record, in the same order.
  *
  * The DAG itself is metadata (names and edges); all data-scale work
  * happens inside the task bodies, which are ordinary Spark actions. */
object Dag {

  /** Deterministic topological order; throws on cycles or unknown deps. */
  def topoOrder(tasks: Seq[String],
                deps: Map[String, Seq[String]]): Seq[String] = {
    val known = tasks.toSet
    deps.foreach { case (t, us) =>
      require(known.contains(t), s"deps mention unknown task $t")
      us.foreach(u => require(known.contains(u), s"unknown dependency $u"))
    }
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val placed = scala.collection.mutable.Set.empty[String]
    val remaining = scala.collection.mutable.SortedSet(tasks: _*)
    while (remaining.nonEmpty) {
      val next = remaining.iterator
        .find(t => deps.getOrElse(t, Nil).forall(placed.contains))
        .getOrElse(sys.error(
          s"dependency cycle among: ${remaining.mkString(", ")}"))
      order += next
      placed += next
      remaining -= next
    }
    order.toSeq
  }

  /** Run every task once for `runKey`; returns the final record per task
    * in execution order. Downstream of a failure records
    * `upstream_failed`; an already-succeeded upstream (resume skip)
    * counts as success. */
  def run(runner: TaskRunner, runKey: String,
          tasks: Map[String, () => Any],
          deps: Map[String, Seq[String]]): Seq[TaskRun] = {
    val order = topoOrder(tasks.keys.toSeq.sorted, deps)
    val ok = scala.collection.mutable.Set.empty[String]
    val locked = scala.collection.mutable.Set.empty[String]
    order.map { t =>
      val notOk = deps.getOrElse(t, Nil).filterNot(ok.contains)
      // split the unmet upstreams: merely-LOCKED ones are mid-flight in
      // ANOTHER runner (may yet succeed) and must never be named in a
      // durable upstream_failed row — only the genuinely failed subset is
      val failedUp = notOk.filterNot(locked.contains)
      val rec =
        if (notOk.nonEmpty && failedUp.isEmpty) {
          // all unmet upstreams are claims held elsewhere: don't execute,
          // and don't write a misleading upstream_failed row — the claim
          // holder's coordinator owns this chain's records
          val now = System.currentTimeMillis()
          TaskRun(t, runKey, 0, "locked", now, now,
            Some(s"upstream claimed elsewhere: ${notOk.mkString(",")}"))
        }
        else if (failedUp.nonEmpty) runner.recordUpstreamFailed(t, runKey, failedUp)
        else runner.run(t, runKey)(tasks(t)())._1
      if (rec.status == "success" || rec.status == "skipped") ok += t
      if (rec.status == "locked") locked += t
      rec
    }
  }
}
