package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Session-window aggregation over an event stream — the classic
  * user-activity rollup (gap-based sessionization) via Spark's native
  * `session_window`, which plans as a per-key sorted merge of dynamic
  * windows (one exchange on the user key; sessions never cross keys, so
  * the operator shards linearly at any scale).
  *
  * Boundary rule (what the oracle must replay): a session spans
  * `[first_ts, last_ts + gap]` and TOUCHING sessions merge — an event at
  * exactly `prev_ts + gap` extends the session (probed empirically; pinned
  * by SessionizeSpec with microsecond-exact events). The DuckDB oracle
  * mirrors this with a gaps-and-islands LAG: `diff > gap ⇒ break`.
  */
object Sessionize {

  /** Per (user, session): `(user_id, session_start_ms, n_events,
    * sum_value, last_ts_ms)`. `gap` is a Spark interval string. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gap: String): DataFrame =
    events
      .groupBy(col(userCol).as("user_id"),
        session_window(col(tsCol), gap).as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"),
        max(unix_millis(col(tsCol))).as("last_ts_ms"))
      .select(col("user_id"),
        unix_millis(col("__w.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"), col("last_ts_ms"))

  /** Session journey export — per session, the ORDERED event-type path
    * ("view→view→purchase") plus timing: the sequence-model training
    * artifact [[sessionStats]]'s scalar rollup can't provide, and the
    * input [[Markov]] / [[EventFunnel]] summarize instead of emitting.
    *
    * Session assignment is the same gaps-and-islands rule the
    * sessionStats oracle pins (`diff > gap ⇒ break`, touching events
    * merge); the path is built by sorting each session's collected
    * (ts, tie, type) structs — array_sort on structs is the engines'
    * shared lexicographic order, ≡ DuckDB's ordered `string_agg`.
    *
    * Scale shape: one user-keyed window (the island numbering) and one
    * (user, session)-keyed aggregate; the collected path is bounded by
    * the session's own length — sessions are the natural unit of
    * bounded state (a gap closes them), unlike unbounded per-user
    * histories. */
  def sessionExport(events: DataFrame, userCol: String, tsCol: String,
                    tieCol: String, typeCol: String,
                    gapSec: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__ts"), col("__tie"))
    val flagged = events.select(col(userCol).as("user_id"),
        col(tsCol).as("__ts"), col(tieCol).as("__tie"),
        col(typeCol).as("__t"))
      .withColumn("__new",
        when(unix_micros(col("__ts")) -
          unix_micros(lag(col("__ts"), 1).over(w)) > gapSec * 1000000L ||
          lag(col("__ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("__sess",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged
      .groupBy(col("user_id"), col("__sess"))
      .agg(min(unix_millis(col("__ts"))).as("session_start_ms"),
        count(lit(1)).as("n_events"),
        (max(unix_millis(col("__ts"))) - min(unix_millis(col("__ts"))))
          .as("duration_ms"),
        array_join(
          transform(
            array_sort(collect_list(struct(
              unix_micros(col("__ts")).as("ts"), col("__tie").as("tie"),
              col("__t").as("t")))),
            s => s.getField("t")), "->").as("path"))
      .select(col("user_id"), col("session_start_ms"), col("n_events"),
        col("duration_ms"), col("path"))
  }
}
