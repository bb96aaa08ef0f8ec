package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential event funnel — the product-analytics "did the user view,
  * then click, then purchase within the window" operator (ClickHouse's
  * `windowFunnel`, Snowplow/Amplitude funnels). The reference stops at
  * feature materialization; this is the behavioral-analytics extension
  * beside [[Funnel.filterFunnel]] (corpus attrition) and
  * [[Cohorts.retention]].
  *
  * Semantics (greedy earliest-chain, the windowFunnel rule):
  *  - `t_1(u)` = MIN ts of a step-1 event for user u;
  *  - `t_k(u)` = MIN ts of a step-k event with `ts > t_{k-1}(u)` and
  *    `ts <= t_1(u) + horizon` (strictly increasing chain anchored at the
  *    user's FIRST step-1 event; simultaneous events do not advance);
  *  - a user "reaches" step k if `t_k` exists.
  * The greedy choice is optimal for reachability: taking each step's
  * earliest admissible occurrence can only admit more later steps.
  *
  * Scale shape: one scan filtered to the step types (predicate pushes to
  * the source), then K−1 per-step (filter → user-keyed join → partial
  * agg) rounds — each a single shuffle on the user key, K is small and
  * fixed. Per-user state is ONE timestamp per step, never an event list;
  * no window over a user's full history, so a hot user costs only their
  * per-step min. The report is a K-row union of 1-row aggregates. */
object EventFunnel {

  /** (step_idx, step, n_users) for each funnel step, all users counted at
    * every step they reached. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             horizonSeconds: Long, checkpoint: Boolean = false): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val u = col(userCol).as("__u")
    def stepEvents(name: String) =
      events.where(col(typeCol) === name).select(u, col(tsCol).as("__ts"))

    // reached(k): DataFrame(__u, __t1, __tk) for users reaching step k
    val first = stepEvents(steps.head).groupBy("__u")
      .agg(min(col("__ts")).as("__t1"))
      .withColumn("__tk", col("__t1"))
    val reached = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (name, _)) =>
        stepEvents(name).join(prev, "__u")
          .where(col("__ts") > col("__tk") &&
            col("__ts") <= col("__t1") + expr(s"INTERVAL $horizonSeconds SECONDS"))
          .groupBy("__u")
          .agg(min(col("__ts")).as("__mints"), min(col("__t1")).as("__t1"))
          .select(col("__u"), col("__t1"), col("__mints").as("__tk"))
    }.map(graft.functions.Dedup.barrier(_, checkpoint))
    reached.zip(steps).zipWithIndex.map { case ((df, name), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).cast("int").as("step_idx"),
          lit(name).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Per-user funnel depth (the furthest step reached; users with no
    * step-1 event are absent) — the row-level view [[funnel]] rolls up. */
  def funnelDepth(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String],
                  horizonSeconds: Long,
                  checkpoint: Boolean = false): DataFrame = {
    val u = col(userCol).as("__u")
    def stepEvents(name: String) =
      events.where(col(typeCol) === name).select(u, col(tsCol).as("__ts"))
    val first = stepEvents(steps.head).groupBy("__u")
      .agg(min(col("__ts")).as("__t1"))
      .withColumn("__tk", col("__t1"))
    val chain = steps.zipWithIndex.tail.scanLeft(first) {
      case (prev, (name, _)) =>
        stepEvents(name).join(prev, "__u")
          .where(col("__ts") > col("__tk") &&
            col("__ts") <= col("__t1") + expr(s"INTERVAL $horizonSeconds SECONDS"))
          .groupBy("__u")
          .agg(min(col("__ts")).as("__mints"), min(col("__t1")).as("__t1"))
          .select(col("__u"), col("__t1"), col("__mints").as("__tk"))
    }.map(graft.functions.Dedup.barrier(_, checkpoint))
    // depth = count of reach-frames containing the user: left-join flags
    val flagged = chain.zipWithIndex.map { case (df, i) =>
      df.select(col("__u"), lit(i + 1).as(s"__d${i + 1}"))
    }
    val joined = flagged.reduceLeft((a, b) => a.join(b, Seq("__u"), "left"))
    val depth =
      if (flagged.size == 1) col("__d1")
      else greatest(flagged.indices.map(i => col(s"__d${i + 1}")): _*)
    joined.select(col("__u").as(userCol), depth.cast("int").as("depth"))
  }
}
