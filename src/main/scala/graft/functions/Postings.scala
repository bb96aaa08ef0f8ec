package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index (posting-list) build — the serving artifact behind
  * [[Retrieval.bm25TopK]]: per token, the sorted document ids and aligned
  * term frequencies, ready to export to a search backend (the same
  * export-to-online-store motion as feature materialization, with
  * posting lists instead of feature rows).
  *
  * Scale shape: one (doc, token) partial-agg shuffle, then one
  * token-keyed aggregate whose value is the token's OWN posting list.
  * Tokens with `df > maxDf` are dropped and counted
  * ([[Dedup.capHotKeys]] convention) — stopword postings are corpus-sized
  * rows nobody serves from an index (they're scan territory); the cap
  * bounds the largest aggregation buffer AND the widest output row.
  * Postings sort by doc id inside the aggregate (`sort_array` — per-group
  * work, no global sort), which is the order a posting-list merge needs. */
object Postings {

  /** (token, df, n_postings, doc_ids, tfs) — doc_ids ascending, tfs
    * aligned (both arrays; [[buildFlat]] renders them as CSV strings for
    * engines/gates that can't compare array cells); only tokens with
    * df ≤ maxDf survive. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            maxDf: Long, ngram: Int = 1): DataFrame = {
    require(maxDf > 0, "maxDf must be positive")
    require(ngram == 1 || ngram == 2, "ngram must be 1 (terms) or 2 (phrases)")
    val terms =
      if (ngram == 1) TextFunctions.tokens(lower(col(textCol)))
      else UnigramLM.bigrams(col(textCol))
    val tf = docs
      .select(col(idCol).cast("long").as("__id"),
        explode(terms).as("token"))
      .groupBy("token", "__id").agg(count(lit(1)).as("__tf"))
    tf.groupBy("token")
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(struct(col("__id"), col("__tf"))))
          .as("__p"))
      .where(col("df") <= maxDf)
      .select(col("token"), col("df"),
        size(col("__p")).cast("long").as("n_postings"),
        transform(col("__p"), p => p.getField("__id")).as("doc_ids"),
        transform(col("__p"), p => p.getField("__tf")).as("tfs"))
  }

  /** [[build]] with the posting arrays rendered as comma-joined strings
    * (full fidelity, scalar cells). */
  def buildFlat(docs: DataFrame, idCol: String, textCol: String,
                maxDf: Long, ngram: Int = 1): DataFrame =
    build(docs, idCol, textCol, maxDf, ngram)
      .select(col("token"), col("df"), col("n_postings"),
        array_join(transform(col("doc_ids"), _.cast("string")), ",")
          .as("doc_ids_csv"),
        array_join(transform(col("tfs"), _.cast("string")), ",")
          .as("tfs_csv"))
}
