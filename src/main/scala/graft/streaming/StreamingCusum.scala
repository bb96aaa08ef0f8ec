package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM drift monitor — the event-time form of
  * [[graft.ops.Smooth.cusum]]: per key, the one-sided tabular CUSUM
  * `s = max(0, s + (x − target − slack))` with alarm/reset at `s > h`,
  * folded in EVENT-TIME order over a stream that delivers rows in
  * arrival order.
  *
  * The fold is inherently sequential, so correctness under reordering
  * comes from watermark finalization: each batch buffers arrivals, then
  * folds ONLY the prefix with event time strictly below the watermark —
  * by the watermark contract no admitted row can still land inside that
  * prefix, so the folded chain is exactly the batch operator's
  * (ts, id)-ordered chain. State per key is O(1) fold registers plus the
  * above-watermark buffer (bounded by the watermark delay × arrival
  * rate, the [[StreamingFunnel]] bound — NOT by history length).
  *
  * Emission: an event-time timeout set past the key's last buffered row
  * fires once the watermark proves no more data; the final summary row
  * `(key, n_events, n_alarms, first_alarm_ms, max_stat)` then equals the
  * batch operator's, which is what the oracle asserts (one oracle, two
  * execution models — the streaming_funnel convention). */
object StreamingCusum {

  case class Ev(key: Long, id: Long, ts: Timestamp, x: Double)
  /** Fold registers + the above-watermark buffer (parallel seqs — Spark
    * encodes them more compactly than a Seq of tuples). */
  case class CBuf(s: Double, mx: Double, alarms: Long, firstUs: Long,
                  hasFirst: Boolean, n: Long, bufUs: Seq[Long],
                  bufId: Seq[Long], bufX: Seq[Double], emitted: Boolean)
  case class Summary(key: Long, n_events: Long, n_alarms: Long,
                     first_alarm_ms: Option[Long], max_stat: Double)

  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private val empty =
    CBuf(0.0, 0.0, 0L, 0L, hasFirst = false, 0L, Nil, Nil, Nil,
      emitted = false)

  /** `events(key, id, ts, x)` stream → one final [[Summary]] per key. */
  def cusumStream(spark: SparkSession, events: DataFrame, target: Double,
                  slack: Double, h: Double,
                  delayThreshold: String): Dataset[Summary] = {
    import spark.implicits._
    events.withWatermark("ts", delayThreshold).as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[CBuf, Summary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Ev], state: GroupState[CBuf]) =>
          val st0 = state.getOption.getOrElse(empty)
          if (st0.emitted) {
            rows.foreach(_ => ())
            state.update(st0)
            Iterator.empty
          } else {
            var buf = st0.bufUs.lazyZip(st0.bufId).lazyZip(st0.bufX).toVector
            rows.foreach(r => buf :+= ((micros(r.ts), r.id, r.x)))
            val wm = state.getCurrentWatermarkMs()
            val sorted = buf.sortBy(t => (t._1, t._2))
            // strict <: a row AT the watermark may still arrive and tie
            val (done, keep) = sorted.partition(_._1 / 1000L < wm)
            var s = st0.s; var mx = st0.mx; var alarms = st0.alarms
            var firstUs = st0.firstUs; var hasFirst = st0.hasFirst
            var n = st0.n
            done.foreach { case (us, _, x) =>
              s = math.max(0.0, s + (x - target - slack))
              if (s > mx) mx = s
              if (s > h) {
                alarms += 1L
                if (!hasFirst) { firstUs = us; hasFirst = true }
                s = 0.0
              }
              n += 1L
            }
            if (keep.isEmpty && n > 0L && state.hasTimedOut) {
              state.update(empty.copy(emitted = true))
              val mxr = BigDecimal(java.math.BigDecimal.valueOf(mx))
                .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
              Iterator.single(Summary(key, n, alarms,
                if (hasFirst) Some(firstUs / 1000L) else None, mxr))
            } else {
              state.update(CBuf(s, mx, alarms, firstUs, hasFirst, n,
                keep.map(_._1), keep.map(_._2), keep.map(_._3),
                emitted = false))
              val lastUs =
                if (keep.nonEmpty) keep.map(_._1).max
                else if (n > 0L) wm * 1000L else 0L
              state.setTimeoutTimestamp(lastUs / 1000L + 1L)
              Iterator.empty
            }
          }
      }
  }
}
