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

  /** Top-k event-type trigrams over per-entity sequences — the order-2
    * extension of [[transitions]]: the most common three-step paths
    * ("view → cart → purchase"), the raw material for funnel discovery
    * and bot-pattern screens (a high-frequency path no product flow
    * explains is automation).
    *
    * Same keyed-window shape as [[transitions]] (two LEADs ride the SAME
    * per-entity sort — one window shuffle, not two); counts partial-agg
    * to ≤ states³ rows; top-k plans as TakeOrderedAndProject on
    * (n DESC, e1, e2, e3). */
  def pathTrigrams(events: DataFrame, entityCol: String, tsCol: String,
                   tieCol: String, stateCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(entityCol))
      .orderBy(col(tsCol), col(tieCol))
    events
      .select(col(stateCol).as("e1"),
        lead(col(stateCol), 1).over(w).as("e2"),
        lead(col(stateCol), 2).over(w).as("e3"))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1").asc, col("e2").asc, col("e3").asc)
      .limit(k)
  }
}
