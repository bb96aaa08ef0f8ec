package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Filter-funnel attrition report — the "why did my corpus shrink" audit
  * beside [[Validate]] (rule violations) and [[Drift]] (distribution
  * shift): every document is attributed to its FIRST failing rule in
  * pipeline order (quality → language → repetition → exact-dup → kept),
  * then rolled up to per-stage (entered, dropped) counts — the
  * observability view of the corpus_clean pipeline, one report row per
  * stage even when a stage drops nothing.
  *
  * Scale shape: all three scalar gates ride ONE TextStats + RepStats scan
  * projection (no joins, no repeated document walks); the dedup stage is
  * one fingerprint-keyed shuffle among scalar-gate survivors
  * (lowest-doc_id-wins, the corpus_clean survivor rule); the funnel
  * arithmetic is a window over the ≤5-row stage rollup — metadata-scale
  * by construction, like Mix.temperatureMix's plan window.
  */
object Funnel {

  /** (stage, n_entered, n_dropped) for the 5 pipeline stages. */
  def filterFunnel(docs: DataFrame, idCol: String, textCol: String,
                   qualityMin: Double, lang: String,
                   maxDupFrac: Double): DataFrame = {
    val TF = graft.functions.TextFunctions
    val spark = docs.sparkSession
    val st = TF.textStats(col(textCol))
    val rep = graft.functions.expressions.RepExprs.repStats(col(textCol))
    val n = rep.getField("n_tokens")
    // the rounded fraction repetition_stats reports — gate on the SAME
    // value so threshold comparisons replay exactly in the oracle
    val dupFrac = round(when(n === 0, 0.0)
      .otherwise(lit(1.0) - rep.getField("n_distinct").cast("double") / n), 6)
    val base = docs.select(col(idCol).as("__id"),
      TF.fingerprintMd5(col(textCol)).as("__fp"),
      (TF.qualityScoreFrom(st) >= qualityMin).as("__pq"),
      (TF.langIdFrom(st) === lang).as("__pl"),
      (dupFrac <= maxDupFrac).as("__pr"))
    val passAll = col("__pq") && col("__pl") && col("__pr")
    // survivor = the lowest id among scalar-gate passers per fingerprint
    val minPass = min(when(passAll, col("__id")))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__fp")))
    val stage = when(!col("__pq"), "1_quality")
      .when(!col("__pl"), "2_language")
      .when(!col("__pr"), "3_repetition")
      .when(col("__id") =!= minPass, "4_exact_dup")
      .otherwise("5_kept")
    val counts = base.select(stage.as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("__n"))
    report(spark, counts)
  }

  /** Stable 5-row frame (zero-drop stages still report) + the funnel
    * arithmetic: entered at stage k = docs not dropped before k = the
    * reverse cumulative sum of the stage bins. */
  private def report(spark: SparkSession, counts: DataFrame): DataFrame = {
    val stages = spark.range(1).select(explode(array(
      lit("1_quality"), lit("2_language"), lit("3_repetition"),
      lit("4_exact_dup"), lit("5_kept"))).as("stage"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("stage")
    stages.join(counts, Seq("stage"), "left")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumn("n_entered",
        sum(col("__n")).over(w.rowsBetween(0, Long.MaxValue)))
      .select(col("stage"), col("n_entered"),
        when(col("stage") === "5_kept", lit(0L)).otherwise(col("__n"))
          .as("n_dropped"))
  }
}
