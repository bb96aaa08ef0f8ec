package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Pearson correlation matrix over numeric columns — the
  * numeric feature-relevance audit beside [[InfoTheory.mutualInfo]]
  * (categorical): all sums for all pairs in ONE full-scan aggregate (the
  * [[Validate.validate]] single-scan rule), exploded to one row per
  * column pair.
  *
  * `r = (nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²) · (nΣy² − (Σy)²))` — every
  * Σ is DECIMAL-exact (values cast to DECIMAL(18,2); products fit the
  * 38-digit cap at warehouse row counts), the expression is one
  * fixed-shape double computation rounded to 6 dp, and sqrt is
  * correctly rounded in both engines. Zero-variance columns yield NULL
  * (guarded), not a division blow-up. */
object Stats {

  /** (x_col, y_col, n, r) for every unordered column pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    def dec(c: String) = col(c).cast("decimal(18,2)")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      count(lit(1)).as("__n") +:
        (cols.flatMap(c => Seq(
          sum(dec(c)).as(s"__s_$c"),
          sum(dec(c) * dec(c)).as(s"__ss_$c"))) ++
          pairs.map { case (a, b) =>
            sum(dec(a) * dec(b)).as(s"__sp_${a}_$b") })
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      val n = col("__n").cast("double")
      val cov = n * col(s"__sp_${a}_$b").cast("double") -
        col(s"__s_$a").cast("double") * col(s"__s_$b").cast("double")
      def varTerm(c: String) =
        n * col(s"__ss_$c").cast("double") -
          col(s"__s_$c").cast("double") * col(s"__s_$c").cast("double")
      struct(lit(a).as("x_col"), lit(b).as("y_col"),
        col("__n").as("n"),
        when(varTerm(a) === 0 || varTerm(b) === 0,
          lit(null).cast("double"))
          .otherwise(round(cov / sqrt(varTerm(a) * varTerm(b)), 6))
          .as("r"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.x_col"), col("p.y_col"), col("p.n"), col("p.r"))
  }

  /** Closed-form two-predictor OLS with intercept — in-engine model
    * fitting as ONE distributed aggregate (the normal equations
    * `(XᵀX)β = Xᵀy` solved by Cramer's rule for the 3×3 system). No
    * gradient loop, no driver matrix library: every Σ is DECIMAL-exact in
    * a single scan and the solve is a fixed-shape double expression the
    * oracle replays verbatim. 100 TB cost = one map-side-combined
    * aggregate to 10 numbers.
    *
    * Returns one row: `(n, b0, b1, b2, r2)` (6-dp rounded), where
    * `y ≈ b0 + b1·x1 + b2·x2` and r2 is the coefficient of
    * determination. */
  def ols2(df: DataFrame, yCol: String, x1Col: String, x2Col: String): DataFrame = {
    def dec(c: String) = col(c).cast("decimal(18,2)")
    val one = df.agg(
      count(lit(1)).as("__n"),
      sum(dec(x1Col)).as("__s1"), sum(dec(x2Col)).as("__s2"),
      sum(dec(yCol)).as("__sy"),
      sum(dec(x1Col) * dec(x1Col)).as("__s11"),
      sum(dec(x1Col) * dec(x2Col)).as("__s12"),
      sum(dec(x2Col) * dec(x2Col)).as("__s22"),
      sum(dec(x1Col) * dec(yCol)).as("__s1y"),
      sum(dec(x2Col) * dec(yCol)).as("__s2y"),
      sum(dec(yCol) * dec(yCol)).as("__syy"))
    // Cramer on A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]], b = (sy,s1y,s2y).
    // Each minor is written once, in one fixed shape, in DOUBLE — the
    // oracle repeats the identical expression text so IEEE agrees.
    val n = col("__n").cast("double")
    def d(c: String) = col(c).cast("double")
    val (s1, s2, sy) = (d("__s1"), d("__s2"), d("__sy"))
    val (s11, s12, s22) = (d("__s11"), d("__s12"), d("__s22"))
    val (s1y, s2y, syy) = (d("__s1y"), d("__s2y"), d("__syy"))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s2y * s12) +
      s2 * (s1y * s12 - s2y * s11)
    val det1 = n * (s1y * s22 - s2y * s12) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s12 * s1y) - s1 * (s1 * s2y - s2 * s1y) +
      sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    // SSE expanded in sums: Σ(y−ŷ)² with ŷ = b0 + b1x1 + b2x2
    val sse = syy - lit(2.0) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22 +
        lit(2.0) * (b0 * b1 * s1 + b0 * b2 * s2 + b1 * b2 * s12))
    val sst = syy - sy * sy / n
    def guarded(c: org.apache.spark.sql.Column) =
      when(det === 0, lit(null).cast("double")).otherwise(round(c, 6))
    one.select(col("__n").as("n"),
      guarded(b0).as("b0"), guarded(b1).as("b1"), guarded(b2).as("b2"),
      when(sst === 0 || det === 0, lit(null).cast("double"))
        .otherwise(round(lit(1.0) - sse / sst, 6)).as("r2"))
  }

  /** Zipf-slope vocabulary audit — the log-log OLS fit of frequency
    * against rank over the top-k vocabulary: natural text sits near
    * slope −1; a corpus whose slope is far off (template spam flattens
    * it, dedup failures steepen it) fails the linguistic-shape check
    * that token-count audits can't see.
    *
    * Float discipline: ranks and frequencies are exact integers; each
    * log coordinate is `round(ln ·, 9)` pinned to DECIMAL(18,9), so
    * Σx/Σy/Σxy/Σxx are EXACT decimal sums (order-independent); slope
    * and intercept are each one fixed-shape double division rounded 6.
    *
    * Scale shape: one (token) partial aggregate over the corpus scan,
    * TakeOrderedAndProject to k rows, then all arithmetic happens on
    * the k-row table (the rank window is k-bounded by construction). */
  def zipfSlope(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topK >= 2, s"topK must be >= 2, got $topK")
    val freq = docs
      .select(explode(graft.functions.TextFunctions.tokens(
        lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("__f"))
      .orderBy(col("__f").desc, col("token").asc)
      .limit(topK)
    val ranked = freq.select(col("token"), col("__f"),
      row_number().over(
        Window.orderBy(col("__f").desc, col("token").asc)).as("__r"))
    val terms = ranked.select(
      round(log(col("__r").cast("double")), 9).cast("decimal(18,9)")
        .as("__x"),
      round(log(col("__f").cast("double")), 9).cast("decimal(18,9)")
        .as("__y"))
    // products re-pinned to scale 9 BEFORE summing so every sum's scaled
    // integer stays < 2^53 and the decimal→double casts below are exact
    // in both engines (a scale-18 sum would round differently per engine)
    val agg = terms.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(round(col("__x") * col("__y"), 9).cast("decimal(18,9)"))
        .as("__sxy"),
      sum(round(col("__x") * col("__x"), 9).cast("decimal(18,9)"))
        .as("__sxx"))
    val nd = col("__n").cast("double")
    val sx = col("__sx").cast("double")
    val sy = col("__sy").cast("double")
    val sxy = col("__sxy").cast("double")
    val sxx = col("__sxx").cast("double")
    val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    agg.select(col("__n").as("n_terms"),
      round(slope, 6).as("slope"),
      round((sy - slope * sx) / nd, 6).as("intercept"))
  }
}
