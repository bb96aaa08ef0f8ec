package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mix planning — turning per-source corpus statistics into the
  * sampling plan a training run executes. The reference stops at
  * training-set serving (SURVEY.md §2.8); these are first-class
  * training-data-pipeline extensions.
  *
  * Both operators are deterministic by construction so the DuckDB oracle
  * replays them exactly: the mix weights use `sqrt` (IEEE-correctly-rounded
  * in every engine, unlike `pow`) and `round(…, 6)`; the curriculum bins
  * use pure integer rank arithmetic — no float interpolation anywhere.
  */
object Mix {

  /** Temperature-weighted mix plan (the multilingual-training sampling
    * rule with temperature 1/2): weight_s ∝ sqrt(tokens_s), so
    * low-resource sources are up-weighted relative to their token share.
    * Output per source: `(source, total_tokens, weight, planned_tokens,
    * sampling_rate)` where `planned_tokens = round(weight · budget)` and
    * `sampling_rate = planned / total` (> 1 means multi-epoch).
    *
    * 100 TB design: one partial-agg shuffle to source granularity; the
    * window that normalizes the weights runs over `n_sources` rows —
    * metadata-scale by construction (the WindowExec warning it triggers is
    * about those ~20 rows, not the corpus). */
  def temperatureMix(docs: DataFrame, sourceCol: String, textCol: String,
                     budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col(sourceCol).as("source"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .groupBy("source")
      .agg(sum(col("n_toks")).as("total_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()  // n_sources rows
      .rowsBetween(Long.MinValue, Long.MaxValue)
    perSource
      .withColumn("__sq", sqrt(col("total_tokens").cast("double")))
      .withColumn("weight", round(col("__sq") / sum(col("__sq")).over(w), 6))
      .withColumn("planned_tokens",
        round(col("weight") * budgetTokens).cast("long"))
      .withColumn("sampling_rate",
        round(col("planned_tokens").cast("double") / col("total_tokens"), 6))
      .select("source", "total_tokens", "weight", "planned_tokens",
        "sampling_rate")
  }

  /** EXECUTE a mix plan: materialize the sampled/repeated corpus the plan
    * describes. A source with `sampling_rate` r contributes ⌊r⌋ full
    * epochs of every document plus one fractional epoch kept at rate
    * r−⌊r⌋ by the md5-prefix gate (the [[Sampling]] hash-gate, per-copy
    * seeded) — multi-epoch repetition and sub-sampling in one rule, fully
    * deterministic. Output: (doc_id, source, epoch).
    *
    * 100 TB design: the plan is n_sources rows broadcast; the epoch
    * explode and the keep gate are scan-stage (fanout = per-source rate,
    * which IS the output size — no overdraw); zero shuffles. */
  def materializeMix(docs: DataFrame, sourceCol: String, idCol: String,
                     plan: DataFrame, seed: String): DataFrame = {
    val copies = floor(col("sampling_rate")).cast("long")
    val frac = col("sampling_rate") - floor(col("sampling_rate"))
    val thresholdHex = format_string("%08x",
      floor(frac * 4294967296.0).cast("long"))
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"))
      .join(broadcast(plan.select(col("source"), col("sampling_rate"))),
        Seq("source"))
      .withColumn("epoch", explode(sequence(lit(0L), copies)))
      .where(col("epoch") < copies ||
        substring(md5(concat_ws("|", col("doc_id").cast("string"),
          col("epoch").cast("string"), lit(seed))), 1, 8) < thresholdHex)
      .select(col("doc_id"), col("source"), col("epoch"))
  }

  /** Token-budget corpus selection: per source, documents ranked by
    * (quality DESC, id ASC) are kept while the running token total BEFORE
    * the document stays under the budget — first-fit greedy, so the
    * boundary-crossing document is included, every non-empty budget
    * selects at least one document, and overshoot is bounded by one
    * document. The selection rule a mix plan's `planned_tokens` feeds.
    *
    * 100 TB design: one per-source window (range exchange on the source
    * key + in-partition sort). A single source bigger than a partition is
    * the skew hazard; the scale path is a two-phase cut — take the
    * approximate quality threshold at the budget from a mergeable
    * quantile sketch ([[graft.ops.Profile.sketchQuantiles]]), keep
    * everything clearly above, and run this exact window only on the
    * boundary band. Same rule, sort sized to the band. */
  def tokenBudgetSelect(docs: DataFrame, sourceCol: String, idCol: String,
                        textCol: String, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Long.MinValue, -1)
    docs
      .select(col(sourceCol).as("source"),
        col(idCol).cast("long").as("doc_id"),
        TextFunctions.qualityScore(col(textCol)).as("quality"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .where(col("cum_before") < budgetTokens)
  }

  /** Curriculum phase assignment: rank every document by
    * (quality score, id) and split the ranking into `nBins` equal-count
    * bins — `bin = floor((rank-1) · nBins / n)`, 0 = lowest quality.
    * Integer rank arithmetic, not ntile (whose remainder distribution is
    * engine-specific) and not threshold interpolation (whose float
    * semantics are engine-specific).
    *
    * 100 TB design: ranking uses the distributed range-exchange +
    * zipWithIndex numbering (no single-partition window); the total count
    * joins in as a broadcast single row. */
  def curriculumBins(docs: DataFrame, idCol: String, textCol: String,
                     nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val scored = docs.select(col(idCol).cast("long").as("doc_id"),
      TextFunctions.qualityScore(col(textCol)).as("quality"))
    val ranked = graft.ops.Materialize.withDistributedRowNumber(
      scored, Seq(col("quality"), col("doc_id")))
    ranked
      .crossJoin(broadcast(scored.agg(count(lit(1)).as("__n"))))
      .select(col("doc_id"), col("quality"),
        floor((col("row_number") - 1) * nBins / col("__n")).as("bin"))
  }
}
