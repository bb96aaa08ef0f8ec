package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic experiment bucketing + arm readout — the A/B-testing
  * layer a feature platform serves next to its features (Statsig /
  * GrowthBook-style hash assignment). Assignment is a pure function of
  * `(unit, experiment)` via the md5 bridge: no assignment table to store,
  * any engine recomputes the same arms, and adding arms re-shuffles
  * nothing retroactively.
  *
  * `arm(u) = md5₆₃(unit || '|' || experiment) % nArms` — scan-stage
  * arithmetic, zero shuffle (the [[graft.ops.Split]] family). The readout
  * aggregates a metric per arm with DECIMAL-exact sums and SUM/COUNT
  * means (one rounded double at the end), so the lift table replays
  * bit-for-bit in the oracle. */
object Experiment {

  /** Arm assignment column for a unit-id column. */
  def armCol(unit: Column, experiment: String, nArms: Int): Column = {
    require(nArms >= 2, s"nArms must be >= 2, got $nArms")
    pmod(expressions.Md5Long(
        concat_ws("|", unit.cast("string"), lit(experiment)))
      .bitwiseAND(lit(Long.MaxValue)), lit(nArms.toLong)).cast("int")
  }

  /** Per-arm readout of one metric: (arm, n_units, n_obs, total, mean).
    * `df` has one row per observation; units with no observations simply
    * don't appear (intent-to-treat joins are the caller's). */
  def readout(df: DataFrame, unitCol: String, metric: Column,
              experiment: String, nArms: Int = 2): DataFrame = {
    val y = metric.cast("decimal(18,2)")
    df.select(armCol(col(unitCol), experiment, nArms).as("arm"),
        col(unitCol).as("__u"), y.as("__y"))
      .groupBy("arm")
      .agg(count_distinct(col("__u")).as("n_units"),
        count(lit(1)).as("n_obs"),
        sum(col("__y")).as("__sum"))
      .select(col("arm"), col("n_units"), col("n_obs"),
        col("__sum").cast("double").as("total"),
        round(col("__sum").cast("double") / col("n_obs"), 6).as("mean"))
  }

  /** UCB1 bandit readout — per arm, the mean reward plus the
    * `sqrt(2 ln N / n)` exploration bonus (Auer et al. 2002): the arm
    * with the highest UCB is what a bandit allocator pulls next, so this
    * table IS the allocation decision for an adaptive experiment, next
    * to [[readout]]'s fixed-split A/B report.
    *
    * Reward sums are DECIMAL-exact; the mean is pinned round 6 FIRST and
    * the bonus is one fixed-shape double expression over exact BIGINTs —
    * the whole row replays. One arm-keyed partial aggregate plus a 1-row
    * broadcast total; nothing beyond arms-scale after the scan. */
  def ucb1(df: DataFrame, armCol: String, reward: Column): DataFrame = {
    val arms = df.groupBy(col(armCol).as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(reward.cast("decimal(18,2)")).as("__s"))
    val tot = broadcast(arms.agg(sum(col("n")).as("__N")))
    val mean = round(col("__s").cast("double") / col("n"), 6)
    arms.crossJoin(tot).select(col("arm"), col("n"),
      mean.as("mean_reward"),
      round(mean + sqrt(lit(2.0) * log(col("__N").cast("double")) /
        col("n").cast("double")), 6).as("ucb"))
  }
}
