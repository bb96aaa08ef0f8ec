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
}
