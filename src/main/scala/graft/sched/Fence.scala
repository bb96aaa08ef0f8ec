package graft.sched

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** A write was attempted with a fencing token older than one the store has
  * already accepted — the writer is a ZOMBIE ex-holder whose lease was
  * broken while it stalled. The write must not happen. */
final class StaleFenceException(msg: String) extends RuntimeException(msg)

/** Store-side fencing-token enforcement — the half of the fencing protocol
  * [[LeaseLocker]] alone cannot provide (its scaladoc says so: a zombie is
  * "only fully fenced if the downstream store checks tokens"; the reference
  * gets this from psql advisory locking, ffsync/locker.go:110). The guard
  * persists the HIGHEST token it has accepted at `<dir>/<name>.fence` and
  * rejects any write bearing a smaller one.
  *
  * Usage: call [[check]] with the token from `withLockFenced` IMMEDIATELY
  * before the store mutation, while still inside the locked section:
  *
  * {{{
  * locker.withLockFenced("__ledger__") { tok =>
  *   fence.check(tok)   // throws StaleFenceException for a zombie
  *   rewriteLedger()
  * }
  * }}}
  *
  * Token [[Locker.Unfenced]] (-1, from File/Memory lockers whose exclusion
  * cannot be broken while the holder lives) passes without a fence write —
  * those bindings have no zombie scenario by construction.
  *
  * What this closes: a holder that stalls past lease expiry, is BROKEN, and
  * resumes AFTER the new holder's first fenced write is rejected (the new
  * holder's larger token is on disk). What remains open: a zombie that
  * resumes in the window between the break and the new holder's first
  * write — closing that needs compare-and-swap in the store itself, which
  * a filesystem does not offer; the window is bounded by the new holder's
  * time-to-first-write and the ledger rewrite is last-writer-wins within
  * it. The fence file write is tmp + rename so readers never see a torn
  * token. */
final class FenceGuard(dir: String, conf: Configuration,
                       name: String = "store") {
  private val base = new HPath(dir)
  private val fencePath = new HPath(base, s".$name.fence")
  private val tmpPath = new HPath(base, s".$name.fence.tmp")
  private val fs: FileSystem = base.getFileSystem(conf)

  /** Highest accepted token, or -1 when no fenced write has happened.
    * Reads BOTH the fence file and the tmp file and takes the max: on
    * filesystems without overwrite-rename the publish path is tmp-write →
    * delete → rename, and a crash between the delete and the rename
    * leaves only the tmp — which, written first, always carries a token
    * ≥ the deleted one, so the guard never forgets its high-water mark in
    * that window. */
  def stored(): Long =
    math.max(readToken(fencePath), readToken(tmpPath))

  private def readToken(p: HPath): Long =
    try {
      val in = fs.open(p)
      val s = try new String(in.readNBytes(64), StandardCharsets.UTF_8)
              finally in.close()
      s.trim.toLong
    } catch {
      case _: java.io.FileNotFoundException => -1L
      case _: NumberFormatException => -1L // torn tmp write; fence's max rules
    }

  /** Accept or reject a write bearing `token`. Unfenced (-1) passes
    * untouched; a token ≥ the stored one passes and (when larger) becomes
    * the new stored token; a smaller token throws [[StaleFenceException]].
    * Call while HOLDING the lock the token came from — the read-
    * compare-write below is serialized by that lock for live holders. */
  def check(token: Long): Unit = {
    if (token == Locker.Unfenced) return
    require(token >= 0, s"fencing token must be >= 0, got $token")
    val have = stored()
    if (token < have)
      throw new StaleFenceException(
        s"stale fencing token $token < accepted $have for $fencePath — " +
          "this holder's lease was broken; write rejected")
    if (token > have) {
      fs.mkdirs(base)
      val out = fs.create(tmpPath, true)
      try out.write(token.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // prefer a single atomic overwrite-rename (no window with no fence
      // file at all); fall back to delete+rename where FileContext can't
      // bind — stored()'s tmp fallback covers the crash window there
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          base.toUri, conf)
        fc.rename(tmpPath, fencePath,
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
             _: IllegalArgumentException =>
          fs.delete(fencePath, false)
          if (!fs.rename(tmpPath, fencePath))
            sys.error(s"FenceGuard: could not rename $tmpPath -> $fencePath")
      }
    }
  }
}
