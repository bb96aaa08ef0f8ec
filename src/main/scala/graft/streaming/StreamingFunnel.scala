package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequential funnel — the event-time form of
  * [[graft.ops.EventFunnel]]: per user, the windowFunnel greedy chain
  * (first step-1 event anchors a horizon; each later step advances on
  * the earliest strictly-later event inside it), computed over a stream
  * under event time, not arrival order.
  *
  * Finalization rule: a user's funnel depth is emittable exactly when
  * the event-time watermark passes `t1 + horizon` — at that point t1 is
  * final (no event at or below the watermark can still arrive, so no
  * earlier anchor exists) and the whole chain window is closed. The
  * emitted depth is therefore identical to the batch operator over the
  * same in-watermark data, which is what the spec and the oracle assert.
  *
  * State per user: the step-type events still relevant — everything
  * above the watermark plus the in-window `[t1, t1+H]` slice — ordered
  * at emission time exactly like batch; events beyond `t1+H` and
  * sub-watermark events before the anchor are pruned every batch, so
  * state is horizon-bounded per user (the [[StreamingAsOf]] bound). An
  * event-time timeout fires the emission when the watermark advances
  * without new rows for the user; a small emitted-tombstone prevents a
  * later burst from re-opening a finished funnel. */
object StreamingFunnel {

  case class Ev(user: Long, step: Int, ts: Timestamp)
  case class FBuf(ts: Seq[Long], step: Seq[Int], emitted: Boolean)
  case class Depth(user: Long, depth: Int, t1Ms: Long)

  /** Batch-exact greedy chain over an in-window event set. */
  private def chainDepth(evs: Seq[(Long, Int)], t1: Long, horizonMs: Long,
                         nSteps: Int): Int = {
    var depth = 1
    var tk = t1
    val inWin = evs.filter { case (t, _) => t > t1 && t <= t1 + horizonMs }
      .sortBy { case (t, s) => (t, s) }
    var continue = true
    while (continue && depth < nSteps) {
      inWin.find { case (t, s) => s == depth + 1 && t > tk } match {
        case Some((t, _)) => tk = t; depth += 1
        case None => continue = false
      }
    }
    depth
  }

  /** `events(userCol=user, tsCol=ts, typeCol=typ)` stream → per-user
    * final depth. Rows whose type is not a funnel step are dropped at
    * the source. */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   steps: Seq[String], horizonSeconds: Long,
                   delayThreshold: String = "30 minutes"): Dataset[Depth] = {
    import spark.implicits._
    val horizonMs = horizonSeconds * 1000L
    val stepIdx = steps.zipWithIndex.map { case (s, i) => (s, i + 1) }.toMap
    val stepCol = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col("typ") === s, lit(i + 1)).otherwise(acc)
    }
    val tagged = events
      .select(col("user"), stepCol.as("step"), col("ts"))
      .where(col("step") > 0)
      .withWatermark("ts", delayThreshold)
      .as[Ev]

    tagged.groupByKey(_.user)
      .flatMapGroupsWithState[FBuf, Depth](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[FBuf]) =>
          val st = state.getOption.getOrElse(FBuf(Nil, Nil, emitted = false))
          if (st.emitted) {
            // tombstone: the funnel is closed; drain late arrivals
            rows.foreach(_ => ())
            state.update(st)
            Iterator.empty
          } else {
            var evs = st.ts.zip(st.step)
            rows.foreach(r => evs +:= (r.ts.getTime, r.step))
            val wm = state.getCurrentWatermarkMs()
            val t1 = evs.filter(_._2 == 1).map(_._1).minOption
            t1 match {
              case Some(anchor) if wm >= anchor + horizonMs =>
                // anchor and window both final: emit and tombstone
                val d = chainDepth(evs, anchor, horizonMs, steps.size)
                state.update(FBuf(Nil, Nil, emitted = true))
                Iterator.single(Depth(user, d, anchor))
              case _ =>
                // prune: keep above-watermark rows plus the candidate
                // window slice (a late anchor can only move EARLIER, so
                // rows beyond candidate t1 + H can never matter)
                val kept = evs.filter { case (t, _) =>
                  t > wm || t1.exists(a => t >= a && t <= a + horizonMs)
                }
                if (kept.isEmpty) state.remove()
                else {
                  state.update(FBuf(kept.map(_._1), kept.map(_._2),
                    emitted = false))
                  t1.foreach(a =>
                    state.setTimeoutTimestamp(a + horizonMs + 1))
                }
                Iterator.empty
            }
          }
      }
  }
}
