package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature drift detection — Population Stability Index between a baseline
  * snapshot and a current snapshot of one numeric feature (the monitoring
  * op a feature platform runs next to every serving table; the reference
  * stops at resource status, so this is the observability extension).
  *
  * Bin edges are the baseline's nearest-rank deciles (value at rank
  * ⌈k·n/nBins⌉ — the [[Profile.numericProfile]] integer-rank rule, no
  * float interpolation), so "no drift" means "current fills the
  * baseline's own deciles evenly". `bin(v) = #{edges e : v > e}` — ties
  * land in the lower bin; duplicate edge values (heavy ties) simply leave
  * upper bins empty, identically in both engines.
  *
  * PSI per bin: `(p − q)·ln(p/q)` with additive smoothing
  * `p = (n_bin + ½)/(N + ½·nBins)` — no zero-count blowups and every
  * quantity is an exact integer ratio before the one ln (the dsir/bm25
  * ln bridge).
  *
  * Scale shape: edge extraction is the distributed-range-sort rank
  * (no single-partition window), filtered to ≤ nBins−1 candidate rows
  * BEFORE the per-k explode; the edge array is ONE broadcast row; both
  * sides bin with a scan-stage array filter and partial-agg to nBins
  * rows. Nothing bigger than nBins ever sits anywhere central. */
object Drift {

  /** (bin, n_base, n_cur, psi_term) — Σ psi_term is the PSI. */
  def psi(baseline: DataFrame, current: DataFrame, valueCol: String,
          nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val spark = baseline.sparkSession
    def vals(df: DataFrame) =
      df.select(col(valueCol).cast("decimal(18,2)").as("v"))

    val nRow = broadcast(vals(baseline).agg(count(lit(1)).as("__n")))
    val ranked = Materialize
      .withDistributedRowNumber(vals(baseline), Seq(col("v")))
      .crossJoin(nRow)
    // candidate filter first (<= nBins-1 rows), THEN the per-k explode so
    // collapsed ranks (n < nBins) keep their per-k multiplicity
    val edgeRanks = transform(sequence(lit(1), lit(nBins - 1)),
      k => ceil(k * col("__n") / nBins))
    val edges = ranked
      .where(array_contains(edgeRanks, col("row_number")))
      .select(col("v"), col("row_number"), col("__n"),
        explode(sequence(lit(1), lit(nBins - 1))).as("__k"))
      .where(ceil(col("__k") * col("__n") / nBins) === col("row_number"))
    val edgeArr = broadcast(
      edges.agg(sort_array(collect_list(col("v"))).as("__edges")))

    def binned(df: DataFrame, as: String) =
      df.crossJoin(edgeArr)
        .select(size(filter(col("__edges"), e => col("v") > e))
          .cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(as))

    val bins = spark.range(nBins).select(col("id").as("bin"))
    val nb = binned(vals(baseline), "n_base")
    val nc = binned(vals(current), "n_cur")
    // totals stay lazy: the baseline total is the nRow aggregate already
    // built for the edge ranks; the current total is one more 1-row
    // broadcast — no eager .count() jobs at construction time
    val nCurRow = broadcast(vals(current).agg(count(lit(1)).as("__nc")))
    val half = lit(0.5)
    val p = (col("n_base") + half) /
      (col("__n").cast("double") + 0.5 * nBins)
    val q = (col("n_cur") + half) /
      (col("__nc").cast("double") + 0.5 * nBins)
    bins.join(nb, Seq("bin"), "left").join(nc, Seq("bin"), "left")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .crossJoin(nRow).crossJoin(nCurRow)
      .select(col("bin"), col("n_base"), col("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
  }

  /** Categorical PSI — same smoothing and ln discipline over the observed
    * category union (full-outer of two partial-agg group-bys; a category
    * present on one side only gets the ½-smoothed zero, never a blowup).
    * The denominator counts K = |category union|, derived from the joined
    * frame itself (one extra metadata-scale aggregate, no collect). */
  def psiCategorical(baseline: DataFrame, current: DataFrame,
                     catCol: String): DataFrame = {
    def counts(df: DataFrame, as: String) =
      df.select(col(catCol).cast("string").as("category"))
        .groupBy("category").agg(count(lit(1)).as(as))
    val joined = counts(baseline, "n_base")
      .join(counts(current, "n_cur"), Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
    val tot = broadcast(joined.agg(
      sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__k")))
    val p = (col("n_base") + lit(0.5)) /
      (col("__tb") + lit(0.5) * col("__k"))
    val q = (col("n_cur") + lit(0.5)) /
      (col("__tc") + lit(0.5) * col("__k"))
    joined.crossJoin(tot)
      .select(col("category"), col("n_base"), col("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
  }
}
