package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile normalization across strata — map each stratum's value
  * distribution onto the GLOBAL distribution (the batch-effect
  * correction used to make per-source quality/length scores comparable
  * before mixing corpora; genomics' quantile normalization, scikit's
  * QuantileTransformer with the corpus itself as the reference).
  *
  * Rule (pinned for the oracle): a row's within-stratum
  * `percent_rank` p (engine-identical tie semantics) maps to the global
  * value at rank `1 + floor(p·(N−1) + 0.5)` — the portable round-half-up
  * on the only double in the pipeline; the mapped value is an EXISTING
  * global value (rank selection, never interpolation — the
  * [[Profile.numericProfile]] rule).
  *
  * Scale shape: one stratum-keyed window (percent_rank), one global
  * distributed rank ([[Materialize.withDistributedRowNumber]] — range
  * exchange, no single-partition window), and one integer-keyed join of
  * the corpus against the N-row rank table. Nothing quadratic, nothing
  * driver-side. */
object Normalize {

  /** (idCol, stratumCol, value, pr, mapped) — `mapped` is the global
    * value at the row's within-stratum rank. `value` must give a total
    * order with `tieCol` (the global rank tie-break). */
  def quantileNormalize(df: DataFrame, idCol: String, stratumCol: String,
                        value: Column, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol)).orderBy(value)
    val ranked = df.select(col(idCol), col(stratumCol), value.as("value"),
      round(percent_rank().over(w), 6).as("pr"))
    val globalRanks = Materialize.withDistributedRowNumber(
        df.select(value.as("__gv"), col(idCol).as("__gid")),
        Seq(col("__gv"), col("__gid")))
      .select(col("row_number").as("__grank"), col("__gv"))
    val nRow = broadcast(df.agg(count(lit(1)).as("__n")))
    ranked.crossJoin(nRow)
      .withColumn("__grank",
        (floor(col("pr") * (col("__n") - 1) + 0.5) + 1).cast("long"))
      .join(globalRanks, "__grank")
      .select(col(idCol), col(stratumCol), col("value"), col("pr"),
        col("__gv").as("mapped"))
  }

  /** Per-group winsorization — clamp each value into its group's
    * [pctLo, pctHi] percentile band (the robust-tail treatment beside
    * [[Outliers.zscore]]'s flag-and-drop: extremes are PULLED IN, rows
    * are never lost, so downstream means/regressions keep their row
    * counts — scikit's `RobustScaler` clipping, the standard guard
    * before computing per-source quality statistics on heavy-tailed
    * corpora).
    *
    * Edge rule (pinned for the oracle): the group's clamp bounds are the
    * values at nearest ranks `ceil(n·pct/100)` under the (value) sort —
    * rank SELECTION of an existing value (the [[Profile.numericProfile]]
    * rule), computed in pure integer arithmetic `(n·pct + 99) div 100`,
    * so both engines pick the identical row. Duplicate values make the
    * rank→value map deterministic regardless of tie permutation (only
    * the value is extracted). Values ride as DECIMAL(18,2) so the
    * least/greatest clamp is an exact comparison, never a float one.
    *
    * Scale shape: one group-keyed window rank over the fact table, the
    * edge rows filtered to 2 per group BEFORE aggregation, the
    * groups-sized bound table broadcast back over the scan — the fact
    * side shuffles once (the window) and the clamp runs in the scan
    * projection. */
  def winsorize(df: DataFrame, idCol: String, groupCol: String,
                value: Column, pctLo: Int, pctHi: Int): DataFrame = {
    require(0 < pctLo && pctLo < pctHi && pctHi <= 100,
      s"need 0 < pctLo < pctHi <= 100, got ($pctLo, $pctHi)")
    import org.apache.spark.sql.expressions.Window
    val v = value.cast("decimal(18,2)")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val wn = Window.partitionBy(col(groupCol))
    val ranked = df.select(col(groupCol), v.as("__v"))
      .select(col(groupCol), col("__v"),
        row_number().over(w).as("__rk"), count(lit(1)).over(wn).as("__n"))
    // ceil(n*pct/100) in integer arithmetic — `div` is integral division
    // in Spark, `//` in DuckDB; identical for positive operands (a float
    // `/` then cast could truncate 17.0-ulp to 16)
    def edgeRank(pct: Int) = expr(s"(__n * $pct + 99) div 100")
    val bounds = broadcast(ranked
      .where(col("__rk") === edgeRank(pctLo) ||
             col("__rk") === edgeRank(pctHi))
      .groupBy(col(groupCol))
      .agg(min(when(col("__rk") === edgeRank(pctLo), col("__v")))
             .as("__lo"),
           min(when(col("__rk") === edgeRank(pctHi), col("__v")))
             .as("__hi")))
    df.select(col(idCol), col(groupCol), v.as("__v"))
      .join(bounds, groupCol)
      .select(col(idCol), col(groupCol),
        col("__v").cast("double").as("value"),
        col("__lo").cast("double").as("lo"),
        col("__hi").cast("double").as("hi"),
        least(greatest(col("__v"), col("__lo")), col("__hi"))
          .cast("double").as("clipped"))
  }
}
