package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the numeric data-quality screen
  * beside [[Validate]] (rule violations) and [[Drift]] (distribution
  * shift): flag rows whose value sits more than `zMax` standard
  * deviations from their group's mean.
  *
  * Float discipline: group sums and sums-of-squares are DECIMAL-exact
  * (order-independent); the mean is pinned `round(sum/n, 6)` FIRST, the
  * standard deviation is ONE fixed-shape double expression
  * `round(sqrt((sumsq − sum²/n)/n), 6)` (population variance; sqrt is
  * IEEE-correctly-rounded in both engines), and the z-score is
  * `round((x − mean)/sd, 6)` over the two pinned values — so the flagged
  * row set replays exactly in the oracle. Zero-variance groups emit no
  * outliers (sd = 0 guarded).
  *
  * Scale shape: one group-keyed partial aggregate (map-side combine →
  * groups-sized table), broadcast back over the scan — the fact side
  * never shuffles; the filter runs in the scan projection. */
object Outliers {

  /** Rows of `df` with |z| > zMax: (group, id, value, mean, sd, z). */
  def zscore(df: DataFrame, groupCol: String, idCol: String,
             value: Column, zMax: Double): DataFrame = {
    val y = value.cast("decimal(18,2)")
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(y).as("__s"),
        sum(y * y).as("__ss"))
      .select(col(groupCol),
        round(col("__s").cast("double") / col("__n"), 6).as("mean"),
        round(sqrt(
          (col("__ss").cast("double") -
            col("__s").cast("double") * col("__s").cast("double") /
              col("__n")) / col("__n")), 6).as("sd"))
    val z = round((y.cast("double") - col("mean")) / col("sd"), 6)
    df.join(broadcast(stats), groupCol)
      .select(col(groupCol), col(idCol), y.cast("double").as("value"),
        col("mean"), col("sd"), z.as("z"))
      .where(col("sd") > 0 && abs(col("z")) > zMax)
  }
}
