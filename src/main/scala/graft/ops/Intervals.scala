package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over event-derived time ranges — union coverage
  * (how much wall-clock each key's intervals actually cover, overlaps
  * merged) and maximum concurrency (sweep-line depth). The classic
  * reservation/uptime/session-overlap operator family.
  *
  * Reference context: featureform models event streams as (entity, value,
  * ts) resources (provider/offline.go:916-922) but has no interval-union
  * operator; this is part of the training-data-pipeline extension surface
  * (activity coverage for rate-limiting / dedup of overlapping capture
  * windows).
  *
  * 100 TB design: both results are per-key window aggregations — one
  * exchange on the key, sort within key, O(1) state per row
  * (gaps-and-islands running max; sweep running sum). No self-join, no
  * interval explosion; scales linearly in events and shards by key.
  */
object Intervals {

  /** Per-key interval union + depth. Input: one interval per row,
    * `[startMs, endMs)` half-open, any order. Output per key:
    * `(key, n_intervals, n_islands, covered_ms, max_depth)`.
    *
    * Islands: an interval starting strictly after the running max end of
    * all previous intervals (ordered by start) opens a new island —
    * touching intervals ([a,b) then [b,c)) merge, mirroring the
    * sessionizer's touching-merge rule (Sessionize.scala boundary note).
    * Depth: sweep over +1 (start) / -1 (end) deltas; at equal timestamp
    * the -1 sorts first (half-open ⇒ an interval ending at t does not
    * overlap one starting at t).
    */
  def coverage(iv: DataFrame, keyCol: String, startCol: String,
               endCol: String): DataFrame = {
    val k = col(keyCol)
    // gaps-and-islands: running max end over preceding rows, ordered by
    // (start, end) — deterministic total order per key
    val wPrev = Window.partitionBy(k)
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(k)
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = iv
      .withColumn("__pmax", max(col(endCol)).over(wPrev))
      .withColumn("__new",
        when(col("__pmax").isNull || col(startCol) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wRun))
      .groupBy(k.as("key"), col("__isl"))
      .agg(count(lit(1)).as("n_iv"),
        min(col(startCol)).as("isl_start"),
        max(col(endCol)).as("isl_end"))
      .groupBy(col("key"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("isl_end") - col("isl_start")).as("covered_ms"))

    // sweep-line depth: ends (-1) before starts (+1) at equal time
    val pts = iv.select(k.as("key"), col(startCol).as("t"), lit(1L).as("d"))
      .unionAll(iv.select(k.as("key"), col(endCol).as("t"), lit(-1L).as("d")))
    val wSweep = Window.partitionBy(col("key")).orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val depth = pts
      .withColumn("__depth", sum(col("d")).over(wSweep))
      .groupBy(col("key"))
      .agg(max(col("__depth")).as("max_depth"))

    islands.join(depth, "key")
  }
}
