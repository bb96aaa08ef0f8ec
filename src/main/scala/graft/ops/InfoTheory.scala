package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic profiling — Shannon entropy per column and
  * pairwise mutual information, the feature-selection / data-audit layer
  * beside [[Profile]] (moments and quantiles) and [[Drift]] (PSI). MI is
  * exactly the quantity a feature platform reports as "how much does this
  * categorical feature know about the label".
  *
  * Float discipline (the dsir ln-bridge): every per-category term is ONE
  * double expression over exact BIGINT counts, rounded to 9 dp and pinned
  * to DECIMAL(18,9) BEFORE any sum — decimal sums are exact and
  * order-independent, so totals replay bit-for-bit in the oracle no
  * matter how Spark partitions the aggregation.
  *
  * Scale shape: entropy melts k columns into (column, value) pairs in the
  * scan projection (one corpus read for ALL columns, the
  * [[Validate.validate]] single-scan rule), partial-aggregates to
  * per-(column, value) counts — map-side combine collapses rows to
  * category cardinality before the one shuffle — and derives per-column
  * totals by RE-aggregating that counts table, never rescanning. MI reads
  * the corpus once into the (x, y) contingency table; both marginals are
  * re-aggregations of the contingency table itself (cardinality-sized,
  * three metadata-scale shuffles after the one corpus-sized one). */
object InfoTheory {

  private val NULLCAT = "__null__"

  /** (column, n_categories, entropy_nats) — NULL is its own category. */
  def entropyProfile(df: DataFrame, cols: Seq[String],
                     checkpoint: Boolean = false): DataFrame = {
    val melted = df.select(explode(array(cols.map(c =>
      struct(lit(c).as("column"),
        coalesce(col(c).cast("string"), lit(NULLCAT)).as("value"))): _*))
      .as("kv"))
      .select(col("kv.column").as("column"), col("kv.value").as("value"))
    // barrier: the category-count table feeds the totals leg and the term
    // join — without it the melted corpus scan replays per leg
    val counts = graft.functions.Dedup.barrier(
      melted.groupBy("column", "value").agg(count(lit(1)).as("__n")),
      checkpoint)
    val totals = counts.groupBy("column")
      .agg(sum(col("__n")).as("__tot"), count(lit(1)).as("n_categories"))
    val p = col("__n").cast("double") / col("__tot").cast("double")
    counts.join(totals, "column")
      .select(col("column"), col("n_categories"),
        round(-p * log(p), 9).cast("decimal(18,9)").as("__term"))
      .groupBy("column")
      .agg(min(col("n_categories")).as("n_categories"),
        sum(col("__term")).cast("double").as("entropy_nats"))
  }

  /** Contingency table with per-pair MI terms:
    * (x, y, n_xy, n_x, n_y, mi_term); Σ mi_term = I(X;Y) in nats. */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String,
                 checkpoint: Boolean = false): DataFrame = {
    // barrier: the contingency table feeds both marginals, the total and
    // the output join — one corpus scan, four cardinality-sized reuses
    val pairs = graft.functions.Dedup.barrier(
      df.select(
          coalesce(col(xCol).cast("string"), lit(NULLCAT)).as("x"),
          coalesce(col(yCol).cast("string"), lit(NULLCAT)).as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("n_xy")), checkpoint)
    val nx = pairs.groupBy("x").agg(sum(col("n_xy")).as("n_x"))
    val ny = pairs.groupBy("y").agg(sum(col("n_xy")).as("n_y"))
    val tot = broadcast(pairs.agg(sum(col("n_xy")).as("__n")))
    pairs.join(nx, "x").join(ny, "y").crossJoin(tot)
      .select(col("x"), col("y"), col("n_xy"), col("n_x"), col("n_y"),
        round((col("n_xy").cast("double") / col("__n")) *
          log((col("n_xy") * col("__n")).cast("double") /
              (col("n_x") * col("n_y")).cast("double")), 9)
          .cast("decimal(18,9)").cast("double").as("mi_term"))
  }

  /** One-row I(X;Y): the DECIMAL-exact sum of [[mutualInfo]] terms. */
  def mutualInfoTotal(df: DataFrame, xCol: String, yCol: String): DataFrame =
    mutualInfo(df, xCol, yCol)
      .select(col("mi_term").cast("decimal(18,9)").as("__t"))
      .agg(sum(col("__t")).cast("double").as("mi_nats"))
      .select(lit(xCol).as("x_col"), lit(yCol).as("y_col"), col("mi_nats"))

  /** χ² token selection — per class, the top-k tokens by the chi-square
    * of the token-presence × class contingency table (the classic
    * supervised feature selector feeding
    * [[graft.functions.Classifier]] / [[graft.functions.Bayes]]: MI's
    * cousin with a sharper preference for rare-but-exclusive tokens).
    *
    * With A = in-class docs containing the token, B = out-of-class docs
    * containing it, C/D their complements and n the corpus size:
    * `χ² = n·(AD−BC)² / ((A+B)(C+D)(A+C)(B+D))`. A·D−B·C is computed
    * EXACTLY in DECIMAL (BIGINT products overflow at 10¹⁰-doc scale)
    * and the statistic is ONE fixed-shape double expression over that
    * exact integer and the four exact marginals, rounded 6 — both
    * engines compute the identical doubles. Ranking is (χ², token)
    * per class; the rank filter plans as WindowGroupLimit.
    *
    * Scale shape: one (token, class) partial aggregate over distinct
    * doc-token pairs (map-side combine), token totals RE-aggregated
    * from that table (never a rescan), class totals are
    * classes-sized, the corpus count a 1-row broadcast. Tokens with
    * doc frequency < minDf are dropped before scoring — noise, and at
    * scale the long tail of hapaxes is most of the vocabulary. Only
    * OBSERVED (token, class) cells are scored: a token ranks in the
    * classes it occurs in, and pure-absence signals surface through the
    * complementary class's list (pinned semantics, replayed verbatim). */
  def chi2Tokens(docs: DataFrame, idCol: String, textCol: String,
                 classCol: String, k: Int, minDf: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dt = docs.select(col(idCol).as("__id"), col(classCol).as("cls"),
        explode(array_distinct(
          graft.functions.TextFunctions.tokens(lower(col(textCol)))))
          .as("token"))
    val tokCls = graft.functions.Dedup.barrier(
      dt.groupBy("token", "cls").agg(count(lit(1)).as("__a")),
      checkpoint = false)
    val tokTot = tokCls.groupBy("token").agg(sum(col("__a")).as("__df"))
      .where(col("__df") >= minDf)
    val clsTot = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("__c"))
    val nTot = broadcast(docs.agg(count(lit(1)).as("__n")))
    val scored = tokCls.join(tokTot, "token").join(clsTot, "cls")
      .crossJoin(nTot)
      .select(col("cls"), col("token"), col("__df").as("df"),
        col("__a").as("in_class"),
        // A=a, B=df-a, C=c-a, D=n-df-c+a ; AD-BC exact in DECIMAL
        (col("__a").cast("decimal(19,0)") *
          (col("__n") - col("__df") - col("__c") + col("__a")) -
         (col("__df") - col("__a")).cast("decimal(19,0)") *
          (col("__c") - col("__a"))).as("__num"),
        col("__df"), col("__c"), col("__n"))
      .where((col("__n") - col("__df")) > 0 && (col("__n") - col("__c")) > 0)
      .select(col("cls"), col("token"), col("df"), col("in_class"),
        round(col("__n").cast("double") *
          col("__num").cast("double") * col("__num").cast("double") /
          (col("__df").cast("double") * (col("__n") - col("__df"))
            .cast("double") * col("__c").cast("double") *
            (col("__n") - col("__c")).cast("double")), 6).as("chi2"))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2").desc, col("token").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }
}
