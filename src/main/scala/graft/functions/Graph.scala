package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over derived relation graphs — weighted PageRank, the
  * iterative-propagation flagship beside [[Dedup.clusterPairs]] (connected
  * components): same per-round join+aggregate shape, but with numeric
  * mass instead of min-id labels. Rank feeds curation (authority-weighted
  * sampling of a link graph) and entity resolution.
  *
  * Exact-replay arithmetic (every round replays in the oracle):
  *  - edge weights and out-strengths are exact BIGINTs;
  *  - ranks live in DECIMAL(18,12);
  *  - each contribution is ONE double expression
  *    `round(rank · w / out_strength, 12)` pinned back to DECIMAL — so the
  *    per-destination SUM is exact and order/partitioning-independent;
  *  - the update is ONE double expression
  *    `round((1−d)/N + d · Σcontrib, 12)` pinned to DECIMAL.
  *  Dangling mass (nodes with no out-edges) is dropped, not redistributed
  *  — the common simplified variant; pinned so both engines agree.
  *
  * Scale shape per round: one src-keyed join of the node-sized rank table
  * into the edge table (edges partitioned by src; a rank table small
  * enough broadcasts automatically), one dst-keyed partial aggregate —
  * map-side combine collapses each partition's contributions before the
  * shuffle — and one node-keyed left join for the update. Iteration count
  * is the only sequential dimension; per-round cost is |E| + |V|, the
  * textbook Pregel budget. `localCheckpoint` guards the growing lineage
  * like [[Dedup.clusterPairs]] (reliable `checkpoint` on a cluster). */
object Graph {

  /** (node, rank) after `iters` rounds of weighted PageRank over
    * `edges(srcCol, dstCol, weightCol)`; parallel edges are pre-summed. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int, damping: Double = 0.85,
               checkpoint: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"),
        col(weightCol).cast("long").as("__w"))
      .groupBy("__s", "__d").agg(sum(col("__w")).as("__w"))
      .cache()
    val outW = e.groupBy("__s").agg(sum(col("__w")).as("__ow"))
    val nodes = e.select(col("__s").as("__v"))
      .union(e.select(col("__d"))).distinct().cache()
    val nRow = broadcast(nodes.agg(count(lit(1)).as("__n")))

    // r0 = round(1/N, 12); base = round((1-d)/N, 12) — both one double
    // division over the exact count, pinned to DECIMAL
    def pin12(c: org.apache.spark.sql.Column) =
      round(c, 12).cast("decimal(18,12)")
    var ranks = nodes.crossJoin(nRow)
      .select(col("__v"), pin12(lit(1.0) / col("__n")).as("__r"))
    val weighted = e.join(outW, "__s")
    for (_ <- 1 to iters) {
      val contribs = weighted
        .join(ranks.withColumnRenamed("__v", "__s"), "__s")
        .select(col("__d"),
          pin12(col("__r").cast("double") * col("__w") / col("__ow"))
            .as("__c"))
        .groupBy("__d").agg(sum(col("__c")).as("__in"))
      val next = nodes.crossJoin(nRow)
        .join(contribs.withColumnRenamed("__d", "__v"), Seq("__v"), "left")
        .select(col("__v"), pin12(
          lit(1.0 - damping) / col("__n") +
            lit(damping) *
              coalesce(col("__in"), lit(0).cast("decimal(18,12)"))
                .cast("double")).as("__r"))
      ranks = if (checkpoint) next.localCheckpoint(eager = true) else next
    }
    ranks.select(col("__v").as("node"),
      col("__r").cast("double").as("rank"))
  }
}
