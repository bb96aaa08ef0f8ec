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

  /** Per-group MAD (median absolute deviation) outlier screen — the
    * robust twin of [[zscore]]: a z-score's mean and sd are themselves
    * dragged by the outliers they hunt (masking), while the median and
    * MAD have a 50% breakdown point, so a heavy-tailed column flags the
    * same rows whether the batch carries 1 or 1000 extremes.
    *
    * Median rule (pinned for the oracle): the LOWER median — the value
    * at nearest rank `(n+1) div 2` under the (value) sort; the MAD is
    * the same rank selection over |x − median|. Both extractions pick
    * an existing DECIMAL(18,2) value, and the flag
    * `|x − med| > k · mad` is an EXACT decimal comparison (k integer) —
    * the whole pipeline has zero float operations, so the flagged set
    * replays bit-for-bit.
    *
    * Scale shape: two group-keyed window ranks (value, then deviation)
    * with the median rows filtered to 1 per group before aggregation;
    * both per-group tables broadcast back over the scan — the fact side
    * pays the two window shuffles and nothing else. Zero-MAD groups
    * (over half the mass on one value) emit no outliers, like zscore's
    * sd = 0 guard. */
  def madOutliers(df: DataFrame, groupCol: String, idCol: String,
                  value: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val y = value.cast("decimal(18,2)")

    /** value at rank (n+1) div 2 of `c` within each group → (group, as) */
    def medianOf(in: DataFrame, c: String, as: String): DataFrame = {
      val w = Window.partitionBy(col(groupCol)).orderBy(col(c))
      val wn = Window.partitionBy(col(groupCol))
      broadcast(in
        .select(col(groupCol), col(c),
          row_number().over(w).as("__rk"),
          count(lit(1)).over(wn).as("__n"))
        .where(col("__rk") === expr("(__n + 1) div 2"))
        .groupBy(col(groupCol)).agg(min(col(c)).as(as)))
    }

    val vals = df.select(col(groupCol), col(idCol), y.as("__y"))
    val med = medianOf(vals, "__y", "med")
    val devs = vals.join(med, groupCol)
      .withColumn("__dev", abs(col("__y") - col("med")))
    val mad = medianOf(devs.select(col(groupCol), col("__dev")),
      "__dev", "mad")
    devs.join(mad, groupCol)
      .where(col("mad") > 0 && col("__dev") > lit(k) * col("mad"))
      .select(col(groupCol), col(idCol),
        col("__y").cast("double").as("value"),
        col("med").cast("double").as("median"),
        col("mad").cast("double").as("mad"),
        col("__dev").cast("double").as("abs_dev"))
  }
}
