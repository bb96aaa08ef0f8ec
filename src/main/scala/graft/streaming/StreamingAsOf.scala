package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stream-stream point-in-time (as-of) join — the streaming form of
  * [[graft.ops.AsOfJoin]]: for every label event (entity, ts) attach the
  * latest feature value with feature.ts <= label.ts, under event time, not
  * arrival order.
  *
  * Spark's built-in stream-stream interval join can't express "latest at or
  * before" (it needs a max-per-key reduction after the join), so this uses
  * the union + `flatMapGroupsWithState` shape: both streams are tagged,
  * unioned, grouped by entity, and a per-entity state buffers
  *
  *  - the feature history above the watermark plus ONE anchor (the latest
  *    feature at or below the watermark — enough to serve any future label),
  *  - labels not yet emittable (ts above the watermark — a late feature
  *    could still precede them).
  *
  * A label is emitted exactly when the event-time watermark passes its
  * timestamp: at that point every feature that could precede it has arrived
  * (later ones are beyond-watermark late and dropped by contract), so the
  * output is identical to the batch as-of join over the same in-watermark
  * data — which is what the spec asserts. An event-time timeout flushes
  * pending labels when the watermark advances without new rows for the
  * entity.
  *
  * Scale: state is per-entity and watermark-bounded (features older than the
  * watermark collapse to the single anchor), partitioned by the same entity
  * hash as the batch materialization — 1000 executors shard it linearly.
  * Tie-break matches batch ([[graft.ops.AsOfJoin]] / the pit oracles):
  * feature order (ts DESC, value DESC).
  */
object StreamingAsOf {

  case class Tagged(entity: Long, isFeature: Boolean, value: Double, ts: Timestamp)
  case class Buf(featTs: Seq[Long], featVal: Seq[Double],
                 pendTs: Seq[Long], pendVal: Seq[Double])
  case class Joined(entity: Long, ts: Timestamp, label: Double, feature: Option[Double])

  def asOfStream(spark: SparkSession, labels: DataFrame, features: DataFrame,
                 delayThreshold: String = "30 minutes"): Dataset[Joined] = {
    import spark.implicits._
    val tagged =
      features.select(col("entity"), lit(true).as("isFeature"), col("value"), col("ts"))
        .withWatermark("ts", delayThreshold)
        .unionByName(
          labels.select(col("entity"), lit(false).as("isFeature"), col("value"), col("ts"))
            .withWatermark("ts", delayThreshold))
        .as[Tagged]

    tagged.groupByKey(_.entity)
      .flatMapGroupsWithState[Buf, Joined](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (entity: Long, rows: Iterator[Tagged], state: GroupState[Buf]) =>
          val st = state.getOption.getOrElse(Buf(Nil, Nil, Nil, Nil))
          var feats = st.featTs.zip(st.featVal)
          var pend = st.pendTs.zip(st.pendVal)
          rows.foreach { r =>
            if (r.isFeature) feats +:= (r.ts.getTime, r.value)
            else pend +:= (r.ts.getTime, r.value)
          }
          val wm = state.getCurrentWatermarkMs()
          val (ready, stillPending) = pend.partition(_._1 <= wm)
          val out = ready.sortBy { case (t, v) => (t, v) }.map { case (lts, lval) =>
            val best = feats.filter(_._1 <= lts) // latest at-or-before, tie: max value
              .sortBy { case (t, v) => (-t, -v) }.headOption
            Joined(entity, new Timestamp(lts), lval, best.map(_._2))
          }
          // prune: features above the watermark stay; everything at/below
          // collapses to the single (ts DESC, value DESC) anchor
          val (fresh, old) = feats.partition(_._1 > wm)
          val anchor = old.sortBy { case (t, v) => (-t, -v) }.headOption
          val kept = fresh ++ anchor
          if (kept.isEmpty && stillPending.isEmpty) state.remove()
          else {
            state.update(Buf(kept.map(_._1), kept.map(_._2),
              stillPending.map(_._1), stillPending.map(_._2)))
            if (stillPending.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          }
          out.iterator
      }
  }
}
