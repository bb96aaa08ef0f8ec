package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encodings — the tabular-ML preprocessing family
  * (target/mean encoding with additive smoothing, frequency encoding)
  * that turns a high-cardinality categorical column into model-ready
  * numerics; the batch twin of what an on-demand feature would compute at
  * request time.
  *
  * Target encoding (the scikit/CatBoost-style smoothed mean):
  * `enc(c) = (sum_y(c) + m · prior) / (n(c) + m)` where `prior` is the
  * global mean and `m` the smoothing pseudo-count. All sums ride
  * DECIMAL(18,2) (exact, order-independent); the prior and the encoding
  * are each ONE double division rounded to 6 dp — the ln-bridge
  * discipline, so the oracle replays bit-for-bit.
  *
  * Scale shape: one category-keyed partial aggregate (map-side combine
  * collapses rows to categories before the shuffle), one 1-row global
  * aggregate broadcast for the prior; output is category-cardinality
  * sized. Encoding application is a broadcast join against this table —
  * never a shuffle of the fact side. */
object Encoding {

  /** (category, n, enc) smoothed target-encoding table. `target` must be
    * castable to DECIMAL(18,2). */
  def targetEncode(df: DataFrame, catCol: String, target: Column,
                   smoothing: Int = 20): DataFrame = {
    val y = target.cast("decimal(18,2)")
    val perCat = df.groupBy(col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n"), sum(y).as("__sum"))
    val global = broadcast(df.agg(
      sum(y).as("__gsum"), count(lit(1)).as("__gn")))
    // prior pinned first (one rounded double), then the encoding uses the
    // PINNED prior — two rounds, both replayed in the oracle
    val prior = round(col("__gsum").cast("double") / col("__gn"), 6)
    perCat.crossJoin(global)
      .withColumn("prior", prior)
      .select(col("category"), col("n"),
        round((col("__sum").cast("double") + lit(smoothing) * col("prior")) /
          (col("n") + lit(smoothing)), 6).as("enc"),
        col("prior"))
  }

  /** (category, n, freq) frequency-encoding table: share of rows, one
    * pinned double division. */
  def frequencyEncode(df: DataFrame, catCol: String): DataFrame = {
    val perCat = df.groupBy(col(catCol).cast("string").as("category"))
      .agg(count(lit(1)).as("n"))
    val global = broadcast(df.agg(count(lit(1)).as("__gn")))
    perCat.crossJoin(global)
      .select(col("category"), col("n"),
        round(col("n").cast("double") / col("__gn"), 6).as("freq"))
  }
}
