package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — time-to-event analytics over the
  * event stream (time to first conversion with right-censoring at the
  * observation end), the standard churn/conversion-latency curve beside
  * [[LabelWindow.forwardLabel]]'s fixed-horizon labels.
  *
  * Estimator: over ascending distinct death times `t_i` with `d_i`
  * deaths and `n_i` at-risk (duration ≥ t_i),
  * `KM(t) = Π_{t_i ≤ t} (1 − d_i/n_i)`. Float discipline: each factor's
  * `ln(1 − d/n)` is ONE double expression over exact integers rounded
  * to 9 dp and pinned to DECIMAL; the cumulative product is
  * `exp(Σ ln)` over the DECIMAL-exact running sum (ordered cumulative
  * window — a total order on t, so the sum is deterministic), with one
  * final `round(exp(…), 6)`.
  *
  * Scale shape: durations are one entity-keyed aggregate; the curve
  * lives on the distinct-duration table (bounded by the time resolution,
  * not the corpus); at-risk counts come from a cumulative window over
  * that table — nothing corpus-sized past the first aggregate. */
object Survival {

  /** Per-entity (duration, observed) from an event stream: time from the
    * entity's first `startType` event to its first `eventType` event
    * strictly after it; entities that never convert are censored at
    * `censorTs`. Duration unit = days. */
  def durations(events: DataFrame, entityCol: String, tsCol: String,
                typeCol: String, startType: String, eventType: String,
                censorTs: Column): DataFrame = {
    val starts = events.where(col(typeCol) === startType)
      .groupBy(col(entityCol).as("__e"))
      .agg(min(col(tsCol)).as("__start"))
    val deaths = events.where(col(typeCol) === eventType)
      .select(col(entityCol).as("__e"), col(tsCol).as("__ts"))
      .join(starts, "__e")
      .where(col("__ts") > col("__start"))
      .groupBy("__e").agg(min(col("__ts")).as("__death"), min(col("__start")).as("__start"))
    starts.join(deaths.select(col("__e"), col("__death")), Seq("__e"), "left")
      .select(col("__e").as(entityCol),
        when(col("__death").isNotNull,
          datediff(date_trunc("day", col("__death")),
            date_trunc("day", col("__start"))))
          .otherwise(datediff(date_trunc("day", censorTs),
            date_trunc("day", col("__start"))))
          .cast("long").as("duration"),
        col("__death").isNotNull.as("observed"))
  }

  /** The KM curve over a durations table: (t, d, n_at_risk, km) for each
    * distinct observed-death time, ascending. */
  def kaplanMeier(dur: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val total = broadcast(dur.agg(count(lit(1)).as("__n")))
    // per distinct duration: deaths and total leavers (death or censor)
    val byT = dur.groupBy(col("duration").as("t"))
      .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("__leave"))
    val wAsc = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val curve = byT.crossJoin(total)
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("__leave")).over(wAsc), lit(0L)))
      .where(col("d") > 0)
    // d == n_at_risk is the absorbing zero (everyone at risk dies): the
    // factor is 0, ln is undefined — carry it as an explicit flag and
    // force km = 0 from that point on (exactly the estimator's value)
    val term = when(col("d") === col("n_at_risk"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(18,9)"))
      .otherwise(round(log(lit(1.0) -
          col("d").cast("double") / col("n_at_risk")), 9)
        .cast("decimal(18,9)"))
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val zeroed = max(when(col("d") === col("n_at_risk"), 1L).otherwise(0L))
      .over(wCum) === 1L
    curve
      .withColumn("__cum", sum(term).over(wCum))
      .withColumn("__zero", zeroed)
      .select(col("t"), col("d"), col("n_at_risk"),
        when(col("__zero"), lit(0.0))
          .otherwise(round(exp(col("__cum").cast("double")), 6)).as("km"))
  }
}
