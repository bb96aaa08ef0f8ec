package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline model-evaluation metrics computed as relational plans — the
  * eval half of the training-data pipeline (retrieval ranking metrics live
  * in [[Retrieval.rankingMetrics]], next-event accuracy in
  * [[graft.ops.Markov]]).
  */
object EvalMetrics {

  /** Exact ROC AUC of `score` against binary `label` via the Mann-Whitney
    * U statistic, with the standard 0.5 credit for score ties:
    *
    *   AUC = [ Σ_s pos_s · (2·negBelow_s + neg_s) ] / (2 · nPos · nNeg)
    *
    * summed over DISTINCT scores s — every term an exact integer; the one
    * double division happens at the end (round 6 dp).
    *
    * Scale shape: one groupBy collapses the corpus to its distinct-score
    * histogram (map-side combined), and only that histogram flows into the
    * cumulative window. Scores MUST be quantized to a fixed grid first
    * (`round(score, p)` — the caller's contract, standard for at-scale AUC)
    * so the histogram, not the corpus, bounds the window input; the window
    * itself is the unavoidable global prefix over the score axis.
    */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val g = df.select(score.as("__s"), label.cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        sum(lit(1L) - col("__y")).as("__neg"))
    val below = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = g.withColumn("__nb", coalesce(sum(col("__neg")).over(below), lit(0L)))
    cum.agg(
        sum(col("__pos")).as("n_pos"),
        sum(col("__neg")).as("n_neg"),
        sum(col("__pos") * (col("__nb") * 2 + col("__neg"))).as("__num2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("__num2").cast("double") /
          (col("n_pos") * col("n_neg") * 2).cast("double"), 6).as("auc"))
  }

  /** Kolmogorov–Smirnov statistic of a binary classifier — the maximum
    * gap between the positive and negative score CDFs, with the score
    * where it's attained (the classic credit-scoring separation metric
    * beside [[binaryAuc]], and the natural cut point for a hard
    * threshold).
    *
    * Same quantize-first contract as binaryAuc: the corpus collapses to
    * the distinct-score grid in ONE partial aggregate, so the cumulative
    * window is bounded by score cardinality, not corpus size. The gap is
    * maximized in EXACT integer form — `|cumPos·N − cumNeg·P|` in
    * DECIMAL (BIGINT products overflow at 10¹⁰-row scale) with the
    * smallest attaining score as tie-break — and only the final
    * normalization is one rounded double division.
    *
    * Returns one row `(n_pos, n_neg, ks, ks_at_score)`. */
  def ksStatistic(df: DataFrame, score: Column, label: Column): DataFrame = {
    // NULL scores sort NULLS FIRST in Spark's window but NULLS LAST in
    // DuckDB — a NULL group would shift every cumulative cp/cn
    // differently per engine, so drop them (and NULL labels) up front,
    // the mad_outliers/outlier_zscore defensive convention
    val g = df.select(score.as("__s"), label.cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__pos"),
        sum(lit(1L) - col("__y")).as("__neg"))
    val upto = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = g.select(col("__s"),
      sum(col("__pos")).over(upto).as("__cp"),
      sum(col("__neg")).over(upto).as("__cn"))
    val tot = broadcast(g.agg(sum(col("__pos")).as("__p"),
      sum(col("__neg")).as("__n")))
    cum.crossJoin(tot)
      .select(col("__s"), col("__p"), col("__n"),
        abs(col("__cp").cast("decimal(19,0)") * col("__n") -
            col("__cn").cast("decimal(19,0)") * col("__p")).as("__diff"))
      .orderBy(col("__diff").desc, col("__s").asc)
      .limit(1)
      .select(col("__p").as("n_pos"), col("__n").as("n_neg"),
        round(col("__diff").cast("double") /
          (col("__p").cast("double") * col("__n").cast("double")), 6)
          .as("ks"),
        col("__s").as("ks_at_score"))
  }
}
