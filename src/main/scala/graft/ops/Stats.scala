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
}
