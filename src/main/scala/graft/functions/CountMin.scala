package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over an item column —
  * the bounded-memory frequency summary: `depth × width` counters answer
  * "how often does item x occur" with one-sided error (estimates never
  * undercount; overcount ≤ N·e/width with probability 1 − e^−depth).
  * Complements [[expressions.Md5Hll]] (distinct counts) in the
  * sketch-under-the-exact-gate family.
  *
  * Everything is integer arithmetic on md5-derived buckets, so the DuckDB
  * oracle rebuilds the identical sketch and replays every estimate — an
  * approximate operator under the exact correctness gate.
  *
  * Scale design: the build explodes each item to its `depth` (row, bucket)
  * cells and partial-aggregates — map-side combine collapses every task's
  * output to ≤ depth·width rows, so the shuffle moves sketch cells, not
  * items. The sketch itself is depth·width rows — metadata-scale, always
  * broadcastable to estimators.
  */
object CountMin {

  /** Row-r bucket of an item: md5("cms|r|" + item) folded into [0, width). */
  private def bucketOf(item: Column, row: Int, width: Int): Column =
    (expressions.Md5Long(concat(lit(s"cms|$row|"), item))
      .bitwiseAND(lit(Long.MaxValue)) % width).cast("int")

  /** Build the sketch: one row per non-empty cell, `(cms_row, bucket, cnt)`.
    * Absent cells are zero by construction. */
  def build(items: DataFrame, itemCol: String, depth: Int,
            width: Int): DataFrame =
    buildWeighted(items.withColumn("__w", lit(1L)), itemCol, "__w",
      depth, width)

  /** Build from pre-aggregated `(item, weight)` rows — cell = Σ weights.
    * The cheap path when a frequency table already exists: the sketch
    * derives from vocabulary-size input instead of re-reading every
    * occurrence. `build` over raw occurrences ≡ `buildWeighted` over their
    * exact counts. */
  def buildWeighted(items: DataFrame, itemCol: String, weightCol: String,
                    depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    items
      .select(col(weightCol),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("cms_row"),
            bucketOf(col(itemCol), r, width).as("bucket"))): _*)).as("__c"))
      .groupBy(col("__c.cms_row").as("cms_row"), col("__c.bucket").as("bucket"))
      .agg(sum(col(weightCol)).as("cnt"))
  }

  /** Point-estimate the frequency of every row of `probes`: min over the
    * sketch rows of the probed cell. The sketch side is depth·width rows —
    * broadcast by size. Probes absent from the sketch still estimate
    * correctly (missing cell = 0) via the coalesce. */
  def estimate(sketch: DataFrame, probes: DataFrame, itemCol: String,
               depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    val cells = probes
      .select(col(itemCol), explode(array((0 until depth).map(r =>
        struct(lit(r).as("cms_row"),
          bucketOf(col(itemCol), r, width).as("bucket"))): _*)).as("__c"))
      .select(col(itemCol), col("__c.cms_row").as("cms_row"),
        col("__c.bucket").as("bucket"))
    cells
      .join(broadcast(sketch), Seq("cms_row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Join-cardinality estimation from two count-min sketches — the
    * planner-style |A ⋈ B| estimate (Σ_k f_A(k)·f_B(k) ≈ min over sketch
    * rows of the row-wise counter inner product; one-sided like the point
    * estimate: never undercounts). The sketches are depth·width rows, so
    * the estimate costs a metadata-scale join no matter how large either
    * input — the point of estimating before running a 100 TB join.
    *
    * Returns one row `(exact_rows, cms_est, rel_err)`; the exact side is
    * computed from the two key histograms (group-count each input, join,
    * Σ product — itself cheaper than the join it sizes). */
  def joinSizeEstimate(a: DataFrame, aKey: String, b: DataFrame,
                       bKey: String, depth: Int, width: Int): DataFrame = {
    val fa = a.select(col(aKey).cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__fa"))
    val fb = b.select(col(bKey).cast("string").as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__fb"))
    val exact = fa.join(fb, "__k")
      .agg(coalesce(sum(col("__fa") * col("__fb")), lit(0L)).as("exact_rows"))
    val sa = buildWeighted(fa, "__k", "__fa", depth, width)
    val sb = buildWeighted(fb, "__k", "__fb", depth, width)
    val est = sa.as("a").join(sb.as("b"), Seq("cms_row", "bucket"))
      .groupBy(col("cms_row"))
      .agg(sum(col("a.cnt") * col("b.cnt")).as("__e"))
      .agg(min(col("__e")).as("cms_est"))
    exact.crossJoin(est)
      .select(col("exact_rows"), col("cms_est"),
        round((col("cms_est") - col("exact_rows")).cast("double") /
          col("exact_rows").cast("double"), 6).as("rel_err"))
  }
}
