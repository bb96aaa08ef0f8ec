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
}
