package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy screening and private release — the tabular companions to
  * `TextFunctions.scrubPii` (free-text redaction): k-anonymity audits of
  * quasi-identifier combinations, and seeded Laplace-noised aggregate
  * release in the differential-privacy shape.
  *
  * On determinism: real DP requires non-reproducible noise; a pipeline
  * under a correctness gate needs the opposite. `dpNoisyCounts` draws
  * its Laplace noise from the md5 bridge (`u = (md5₆₃(key‖seed)+1)/2⁶³`,
  * inverse-CDF transform in ONE fixed-shape double expression), so a
  * release is exactly reproducible given the seed — rotate the seed per
  * release in production and the mechanism is the textbook one. */
object Privacy {

  /** Per quasi-identifier group: (qi…, n, at_risk) with `at_risk` =
    * group smaller than k — the re-identification audit. One partial
    * aggregate, group-cardinality output. */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty && k >= 2, "need QI columns and k >= 2")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** One summary row: (n_groups, risky_groups, risky_rows, min_group) —
    * the headline k-anonymity numbers over [[kAnonymity]]. */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame =
    kAnonymity(df, qiCols, k).agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("risky_groups"),
      sum(when(col("at_risk"), col("n")).otherwise(0L)).as("risky_rows"),
      min(col("n")).as("min_group"))

  /** Group counts with seeded Laplace noise of scale `b` (= sensitivity
    * 1 / ε for a count query): (key, n, noisy_n). Inverse-CDF Laplace:
    * `noise = −b · sign(u−½) · ln(1 − 2|u−½|)`, u the md5 uniform of
    * (key, seed) — scan-stage arithmetic over the group rollup. */
  def dpNoisyCounts(df: DataFrame, keyCol: String, b: Double,
                    seed: String): DataFrame = {
    val u = (graft.functions.expressions.Md5Long(
        concat_ws("|", col(keyCol).cast("string"), lit(seed)))
      .bitwiseAND(lit(Long.MaxValue)).cast("double") + 1.0) /
      lit(9.223372036854776e18)
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n", round(col("n") + noise, 6))
  }
}
