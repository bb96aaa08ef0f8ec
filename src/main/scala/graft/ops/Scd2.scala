package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) builder — turn a keyed change/event
  * stream into validity intervals `[valid_from, valid_to)` per key, the
  * dimension-table layout every warehouse PIT join consumes (Kimball SCD2;
  * Delta's `MERGE`-maintained dimensions). The inverse of
  * [[graft.ops.AsOfJoin]]: as-of asks "which value was live at t", this
  * MATERIALIZES the liveness intervals so a keyed
  * [[RangeJoin.pointsInIntervalsKeyed]] can answer it.
  *
  * Rules (pinned for the oracle):
  *  - rows order per key by `(ts, tieCol)` — a total order;
  *  - consecutive rows whose tracked attribute tuple is UNCHANGED compress
  *    into one interval (run-length compression via LAG over the attr
  *    struct, NULL-safe equality);
  *  - `valid_from` = first ts of the run, `valid_to` = next run's
  *    `valid_from` (NULL on the open current run), `is_current` flags it.
  *
  * Scale shape: two windows over the same `(key × (ts, tie))` sort — LAG
  * to find run starts, LEAD over run starts to close intervals — one
  * key-partitioned sort-shuffle total (Catalyst reuses the partitioning;
  * no global sort, no driver state). A key's cost is its own history
  * length, the same bound as any per-entity window. */
object Scd2 {

  /** (key, attrs…, valid_from, valid_to, is_current). */
  def build(changes: DataFrame, keyCol: String, attrCols: Seq[String],
            tsCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val attrs = struct(attrCols.map(col): _*)
    // run starts: first row per key, or attr tuple changed (NULL-safe)
    val changed = lag(attrs, 1).over(w).isNull ||
      !(lag(attrs, 1).over(w) <=> attrs)
    val starts = changes
      .withColumn("__chg", changed)
      .where(col("__chg"))
      .select(col(keyCol) +: attrCols.map(col) :+
        col(tsCol).as("valid_from") :+ col(tieCol).as("__tie"): _*)
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("__tie"))
    starts
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }
}
