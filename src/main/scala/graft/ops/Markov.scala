package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-entity event sequences —
  * the sequence-features companion to [[EventFunnel]] (ordered behavior)
  * and the model behind next-event-prediction features and
  * session-anomaly scoring (a transition with p ≈ 0 is a bot signature).
  *
  * Rules: per entity, events totally ordered by `(ts, tieCol)`; each
  * adjacent pair emits one `(from_state, to_state)` transition (LEAD over
  * the keyed window — per-entity sort, the standard bounded-history
  * shape); counts are exact BIGINTs; `p = n_ab / n_a` is ONE rounded
  * double division, with `n_a` re-derived from the transition table
  * itself (row-source marginal, so probabilities sum to 1 per from-state
  * over the observed transitions).
  *
  * Scale shape: one entity-keyed window shuffle (cost = each entity's own
  * history), one (from, to)-keyed partial aggregate that collapses to
  * states² rows, and a states-sized marginal re-aggregation — nothing
  * bigger than the state alphabet leaves the first shuffle. */
object Markov {

  /** (from_state, to_state, n, n_from, p). */
  def transitions(events: DataFrame, entityCol: String, tsCol: String,
                  tieCol: String, stateCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(stateCol).as("from_state"),
        lead(col(stateCol), 1).over(w).as("to_state"))
      .where(col("to_state").isNotNull)
      .groupBy("from_state", "to_state")
      .agg(count(lit(1)).as("n"))
    val fromN = pairs.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(fromN, "from_state")
      .select(col("from_state"), col("to_state"), col("n"), col("n_from"),
        round(col("n").cast("double") / col("n_from"), 6).as("p"))
  }
}
