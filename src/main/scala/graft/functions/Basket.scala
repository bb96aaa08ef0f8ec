package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence — pairwise item association mining (support
  * + lift), the recsys companion to [[Sampling.negativeSample]] (which
  * mints the negatives this op's positives contrast with) and the
  * item-space analogue of [[UnigramLM.pmiCollocations]] (PMI over word
  * adjacency; lift here is `exp(PMI)` over basket membership).
  *
  * Definitions (all exact integers until the one pinned double):
  *  - basket = the distinct item set of one transaction key;
  *  - `n_a` = #baskets containing a, `n_ab` = #baskets containing both;
  *  - `lift = (n_ab · N) / (n_a · n_b)` — computed as ONE double division
  *    of exact BIGINT products, rounded to 6 dp; ordering is on the
  *    ROUNDED lift so ulp noise collapses into the (item_a, item_b)
  *    tie-break (the pmi_collocations discipline).
  *
  * Scale shape: distinct-per-basket first (partial agg collapses dup
  * lines before any shuffle), then the pair generation is a basket-keyed
  * self-join — cost Σ basket_size², bounded by `maxBasketSize` (baskets
  * above it are dropped and counted, the [[Dedup.capHotKeys]] convention
  * for hot keys; a degenerate "everything in one cart" basket cannot
  * explode the join). Item frequencies join back by item key — two
  * item-keyed shuffles of a table whose size is the distinct (basket,
  * item) set, never raw lines. */
object Basket {

  /** Top-`topK` item pairs by lift among pairs with support ≥ `minSupport`:
    * (item_a, item_b, n_ab, n_a, n_b, lift), item_a < item_b. */
  def cooccurrence(lines: DataFrame, basketCol: String, itemCol: String,
                   minSupport: Long = 2, maxBasketSize: Int = 1000,
                   topK: Int = 100, checkpoint: Boolean = false): DataFrame = {
    // The distinct (basket, item) table feeds the size filter, both
    // item-frequency legs and both self-join legs. In-process, AQE's
    // exchange reuse already deduplicates the identical subtrees and a
    // persist() would DISABLE AQE inside the cached subtree (measured
    // 3.5 s -> 6.7 s WORSE at sf0.1 — the triangle-count lesson); a real
    // checkpoint remains the cluster-scale lineage cut when requested.
    def cut(df: DataFrame): DataFrame =
      if (checkpoint) Dedup.barrier(df, checkpoint = true) else df
    val b = cut(
      lines.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .distinct())
    // hot-basket cap: size via one partial agg, oversized baskets dropped
    val sized = b.groupBy("__b").agg(count(lit(1)).as("__sz"))
      .where(col("__sz") <= maxBasketSize)
    val capped = cut(b.join(sized, "__b"))
    val itemN = capped.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
    val nBaskets = broadcast(sized.agg(count(lit(1)).as("__nb")))
    val pairs = capped.as("x").join(capped.as("y"), "__b")
      .where(col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    pairs
      .join(itemN.select(col("__i").as("item_a"), col("__n").as("n_a")), "item_a")
      .join(itemN.select(col("__i").as("item_b"), col("__n").as("n_b")), "item_b")
      .crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        round((col("n_ab") * col("__nb")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("item_a"), col("item_b"))
      .limit(topK)
  }
}
