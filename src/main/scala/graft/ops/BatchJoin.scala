package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B1/B2: batch feature join — the offline scoring table. The reference
  * generates a chain of FULL OUTER JOINs on entity with
  * `COALESCE(source_0.entity, source_1.entity, ...)` as the output key
  * (provider/spark.go:263-423, provider/sql.go:813-906). Spark's USING-column
  * full outer join produces exactly that coalesced key, so the whole operator
  * is a fold of using-joins — Catalyst then plans each pairwise join
  * independently (broadcast when a side is small, sort-merge otherwise; at
  * scale all sides shuffle once on `entity` and AQE coalesces).
  */
object BatchJoin {

  /** Each input: (outputColumnName, materialized triple or (entity,value) df).
    * Inputs must expose columns `entity` and `value`. */
  def batchFeatures(feats: Seq[(String, DataFrame)]): DataFrame = {
    require(feats.nonEmpty, "need at least one feature")
    val prepared = feats.map { case (name, df) =>
      df.select(col("entity"), col("value").as(name))
    }
    prepared.reduce((a, b) => a.join(b, Seq("entity"), "full_outer"))
  }
}
