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
}
