package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heartbeat-gap detection — per key, every pair of CONSECUTIVE
  * events (event-time order) further apart than `gapSeconds` emits an
  * alert row, equal to the batch `LEAD` formulation over the same data.
  *
  * Same watermark-finalized sequential fold as [[StreamingCusum]]: each
  * batch buffers arrivals and folds only the prefix strictly below the
  * watermark — by the watermark contract no admitted row can still land
  * inside it, so consecutive-in-fold ≡ consecutive-in-event-time and a
  * gap row is FINAL the moment its later endpoint finalizes. Alerts
  * therefore stream out incrementally (append mode), not at close; state
  * per key is the last finalized event (O(1)) plus the above-watermark
  * buffer (bounded by delay × rate). A missing-heartbeat monitor gets the
  * trailing "still silent" case from the event-time timeout; the batch
  * parity contract here covers completed gaps (LEAD semantics — a
  * trailing gap has no batch counterpart).
  */
object StreamingGaps {

  case class Ev(key: Long, id: Long, ts: Timestamp)
  case class GBuf(lastUs: Long, lastId: Long, hasLast: Boolean,
                  bufUs: Seq[Long], bufId: Seq[Long])
  case class Gap(key: Long, prev_ms: Long, next_ms: Long, gap_s: Long)

  private def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  /** `events(key, id, ts)` stream → one [[Gap]] per super-threshold
    * consecutive pair. */
  def gapStream(spark: SparkSession, events: DataFrame, gapSeconds: Long,
                delayThreshold: String): Dataset[Gap] = {
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events.withWatermark("ts", delayThreshold).as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState[GBuf, Gap](
        // EventTimeTimeout: the buffered suffix must flush when the
        // watermark advances in a batch that carries NO new rows for the
        // key — without a timeout the function is never re-invoked
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, rows: Iterator[Ev], state: GroupState[GBuf]) =>
          val st0 = state.getOption
            .getOrElse(GBuf(0L, 0L, hasLast = false, Nil, Nil))
          var buf = st0.bufUs.zip(st0.bufId).toVector
          rows.foreach(r => buf :+= ((micros(r.ts), r.id)))
          val wm = state.getCurrentWatermarkMs()
          val (done, keep) = buf.sortBy(identity)
            .partition(_._1 / 1000L < wm) // strict <: ties may still arrive
          var lastUs = st0.lastUs
          var lastId = st0.lastId
          var hasLast = st0.hasLast
          val out = Vector.newBuilder[Gap]
          done.foreach { case (us, id) =>
            if (hasLast && us - lastUs > gapUs)
              out += Gap(key, lastUs / 1000L, us / 1000L,
                (us - lastUs) / 1000000L)
            lastUs = us; lastId = id; hasLast = true
          }
          state.update(GBuf(lastUs, lastId, hasLast,
            keep.map(_._1), keep.map(_._2)))
          if (keep.nonEmpty) // flush when the watermark passes the buffer
            state.setTimeoutTimestamp(keep.map(_._1).max / 1000L + 1L)
          out.result().iterator
      }
  }
}
