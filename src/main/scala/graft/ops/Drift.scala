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

  /** Jensen-Shannon divergence between every source pair's token
    * distribution over the global top-`topK` vocabulary (+ one pooled
    * out-of-vocab bucket, keyed by the impossible-token ''), Laplace
    * +1 smoothing — the corpus-shift audit run before mixing sources
    * into one training set ([[psi]] is the numeric-feature analogue).
    *
    * Every JS term is pinned round(·, 9) → DECIMAL before the exact,
    * order-independent sum (the ln-bridge discipline); final round 6.
    *
    * Scale shape: one corpus scan builds the (source, bucket) counts
    * (map-side combined, ≤ sources·(topK+1) rows); everything after —
    * the grid, the pair join, the term sums — is metadata-scale. */
  def vocabJsDivergence(docs: DataFrame, srcCol: String, textCol: String,
                        topK: Int): DataFrame = {
    val toks = docs.select(col(srcCol).as("src"),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
        .as("t"))
    val vocab = graft.functions.UnigramLM.vocab(docs, textCol, topK)
      .select(col("token"))
    val tagged = toks
      .join(broadcast(vocab.withColumn("__v", lit(1))),
        col("t") === col("token"), "left")
      .select(col("src"),
        when(col("__v").isNotNull, col("t")).otherwise(lit("")).as("tok"))
    val counts = tagged.groupBy(col("src"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val buckets = vocab.select(col("token").as("tok"))
      .unionAll(docs.sparkSession.range(1).select(lit("").as("tok")))
    val grid = totals.crossJoin(buckets)
      .join(counts, Seq("src", "tok"), "left")
      .select(col("src"), col("tok"), col("n"),
        coalesce(col("c"), lit(0L)).as("c"))
    val vSize = (topK + 1).toDouble
    val a = grid.select(col("src").as("src_a"), col("tok"),
      col("n").as("__na"), col("c").as("__ca"))
    val b = grid.select(col("src").as("src_b"), col("tok"),
      col("n").as("__nb"), col("c").as("__cb"))
    val pa = (col("__ca").cast("double") + 1.0) /
      (col("__na").cast("double") + vSize)
    val pb = (col("__cb").cast("double") + 1.0) /
      (col("__nb").cast("double") + vSize)
    val m = (pa + pb) / 2.0
    a.join(b, "tok").where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        round(lit(0.5) * (pa * log(pa / m)) + lit(0.5) * (pb * log(pb / m)), 9)
          .cast("decimal(18,9)").as("__term"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(round(sum(col("__term")), 6).cast("double").as("js"))
  }
}
