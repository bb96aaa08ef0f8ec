package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-entity behavioral feature vectors from an event stream — the
  * feature-engineering layer the funnel/retention/transition reports roll
  * up from: each entity gets a fixed-width activity profile (hour-of-day
  * histogram, activity entropy, night share) and an activity-trend slope,
  * ready to register as wide features and serve.
  *
  * Float discipline: histograms and OLS sums are exact BIGINTs; the
  * entropy terms are rounded 9 dp and pinned to DECIMAL before the exact
  * sum (the [[InfoTheory]] rule — here the per-entity sum has ≤ 24 terms
  * but the same order-independence argument applies); night share and the
  * OLS slope are each ONE rounded double division over exact integers.
  *
  * Scale shape: both features are single entity-keyed partial aggregates
  * — 24 conditional counters (profile) or 5 OLS accumulators (trend) per
  * entity, map-side combined; no window, no per-entity sort, so a hot
  * entity costs only its own additions. */
object Behavior {

  /** (entity, n_events, hour_counts[24], activity_entropy, night_frac);
    * night = hours 0-5. Entropy is over the hour distribution, nats. */
  def hourProfile(events: DataFrame, entityCol: String,
                  tsCol: String): DataFrame = {
    val h = hour(col(tsCol))
    val hourCounts = (0 until 24).map(k =>
      sum(when(h === k, 1L).otherwise(0L)).as(s"__h$k"))
    val aggs = count(lit(1)).as("n_events") +: hourCounts
    val agg = events.groupBy(col(entityCol)).agg(aggs.head, aggs.tail: _*)
    val n = col("n_events")
    val terms = (0 until 24).map { k =>
      val p = col(s"__h$k").cast("double") / n.cast("double")
      when(col(s"__h$k") === 0, lit(java.math.BigDecimal.ZERO)
          .cast("decimal(18,9)"))
        .otherwise(round(-p * log(p), 9).cast("decimal(18,9)"))
    }
    val night = (0 until 6).map(k => col(s"__h$k")).reduce(_ + _)
    // histogram rendered as a CSV string: full fidelity with scalar
    // cells, so any engine (and the row-hash gate) compares it directly
    agg.select(col(entityCol), col("n_events"),
      concat_ws(",", (0 until 24).map(k => col(s"__h$k").cast("string")): _*)
        .as("hour_counts_csv"),
      // each pairwise sum re-pinned to (18,9): a bare 24-term chain grows
      // precision past Spark's 38-digit cap, which silently DROPS the
      // scale to 6 (the decimal-overflow trap the OracleSql header
      // documents); the cast is lossless here (terms sum < 10⁹)
      terms.reduce((a, b) => (a + b).cast("decimal(18,9)"))
        .cast("double").as("activity_entropy"),
      round(night.cast("double") / n, 6).as("night_frac"))
  }

  /** (entity, n_days, slope): OLS slope of events-per-day over the day
    * index — the activity-velocity feature. NULL slope for single-day
    * entities (degenerate fit). All sums exact BIGINTs; the slope is one
    * rounded double division `(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`. */
  def activityTrend(events: DataFrame, entityCol: String,
                    tsCol: String): DataFrame = {
    val daily = events
      .groupBy(col(entityCol),
        datediff(date_trunc("day", col(tsCol)), lit("1970-01-01").cast("date"))
          .cast("long").as("__x"))
      .agg(count(lit(1)).as("__y"))
    daily.groupBy(col(entityCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col(entityCol), col("n_days"),
        when(col("n_days") * col("__sxx") - col("__sx") * col("__sx") === 0,
          lit(null).cast("double"))
          .otherwise(round(
            (col("n_days") * col("__sxy") - col("__sx") * col("__sy"))
              .cast("double") /
              (col("n_days") * col("__sxx") - col("__sx") * col("__sx"))
                .cast("double"), 6)).as("slope"))
  }
}
