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
}
