package graft.streaming

import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Drive a BOUNDED stream (a file-backed replay under the correctness
  * gate, or a drain-what's-there incremental run) to completion under
  * `Trigger.AvailableNow`.
  *
  * Versus the previous default-trigger + `processAllAvailable()` loop:
  * AvailableNow snapshots the source's available data at start, runs the
  * SAME `maxFilesPerTrigger`-batched micro-batches — including any
  * required no-data batch (the engine's continue condition includes
  * `lastExecutionRequiresAnotherBatch`, so watermark-armed state timeouts
  * still fire; the streaming gate queries' oracles prove it) — and then
  * SELF-TERMINATES. No status polling, no idle trigger gaps: the measured
  * wall time is the work, not the micro-batch lifecycle floor, which is
  * exactly the component co-tenant contention inflated in the round-9
  * driver bench (stream_dedup 2.11× driver vs 1.00× local on identical
  * code). It is also the restart-friendly shape: re-running the same
  * writer over the same checkpoint drains exactly the unprocessed
  * remainder. */
object StreamRun {

  /** Start `w` with AvailableNow and block until self-termination. */
  def drain[T](w: DataStreamWriter[T], timeoutMs: Long = 600000L): Unit =
    await(w.trigger(Trigger.AvailableNow()).start(), timeoutMs)

  /** Block until an (AvailableNow-triggered) started query terminates.
    * Propagates the query's failure if it died; fails loudly instead of
    * hanging if it neither finishes nor fails within `timeoutMs`. */
  def await(q: StreamingQuery, timeoutMs: Long = 600000L): Unit =
    try {
      if (!q.awaitTermination(timeoutMs))
        throw new IllegalStateException(
          s"stream ${q.name} did not terminate within $timeoutMs ms — " +
            "is the writer AvailableNow-triggered?")
    } finally q.stop()
}
