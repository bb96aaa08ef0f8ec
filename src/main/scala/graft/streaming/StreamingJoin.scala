package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream TIME-INTERVAL join — Spark's native watermarked
  * two-stream inner join with a range condition (the "purchases within N
  * minutes after a click" correlator). Complements [[StreamingAsOf]]
  * (which keeps ONE best match per label via custom state): the interval
  * join emits EVERY pair inside the window and needs no user state at
  * all — the engine's symmetric hash join + watermark bound the buffers.
  *
  * State bound (what makes this 100 TB-safe): with both sides
  * watermarked `delay` and the range condition `r.ts ∈ [l.ts, l.ts+len)`,
  * Spark derives the state-eviction watermark for each side — left rows
  * are dropped once the right watermark passes `l.ts + len`, right rows
  * once the left watermark passes `r.ts` — so per-key state is
  * O(rows inside delay+len), never the full history.
  *
  * Swap `readTripleStream`'s file source for `format("kafka")` and this
  * is the production topology (StreamingLatest.scala:40 note).
  */
object StreamingJoin {

  /** Inner interval join of two (entity, value, ts) streams:
    * right rows with `l.ts <= r.ts < l.ts + lenSeconds` per entity.
    * Emits `(entity, l_ts, l_value, r_ts, r_value)`.
    *
    * `joinType = "leftOuter"` adds the WATERMARK-DRIVEN null emission:
    * a left row with no in-window match emits `(…, NULL, NULL)` only
    * once the watermark passes `l.ts + len` — the engine must prove no
    * late match can still arrive, which is exactly the state-eviction
    * bound. Inner joins emit eagerly; outer results are inherently
    * watermark-paced. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   delayThreshold: String, lenSeconds: Long,
                   joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", delayThreshold)
      .select(col("entity").as("l_entity"), col("value").as("l_value"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", delayThreshold)
      .select(col("entity").as("r_entity"), col("value").as("r_value"),
        col("ts").as("r_ts"))
    l.join(r,
      col("l_entity") === col("r_entity") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") < col("l_ts") + expr(s"interval $lenSeconds seconds"),
      joinType)
      .select(col("l_entity").as("entity"), col("l_ts"), col("l_value"),
        col("r_ts"), col("r_value"))
  }
}
