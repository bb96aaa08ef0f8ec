package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data decontamination: flag corpus documents that share word
  * n-grams with a held-out evaluation set (the standard n-gram-overlap
  * check run before any benchmark-reporting training run).
  *
  * Shape at 100 TB: the eval side is always small (benchmarks are
  * thousands of documents), so its distinct n-gram set is BROADCAST and
  * the corpus side never shuffles its text — n-grams are exploded in the
  * scan stage, the broadcast hash join keeps only hit rows, and the
  * per-document aggregation shuffles just (doc_id, hit) rows (a
  * vanishing fraction of the corpus). The join key is the 63-bit md5 of
  * the gram, not the gram string: 8 B/gram in the broadcast and the hash
  * maps instead of ~50 B of text (measured 7.3 s → ~3 s at sf0.1), and
  * because the oracle replays the SAME hash (`md5_number_lower % 2^63`)
  * even the astronomically-unlikely collision produces identical output
  * in both engines.
  *
  * No reference counterpart (its surface stops at SQL transformations);
  * this extends the corpus-hygiene family beside [[Dedup]].
  */
object Decontam {

  /** Space-joined word n-grams of `lower(text)` (whitespace tokens, the
    * TOKS_LOWER contract; tokens contain no spaces, so the join is
    * collision-free). Empty array when the document has fewer than n
    * tokens. Single-walk [[expressions.WordNgrams]]; see its scaladoc for
    * why not the declarative transform/slice/array_join chain. */
  def wordNgrams(text: Column, n: Int): Column =
    expressions.NgramExprs.wordNgrams(lower(text), n)

  /** 63-bit md5 of a gram — the compact join key (≡ DuckDB
    * `md5_number_lower(g) % 2^63`). */
  private def gramHash(g: Column): Column =
    expressions.Md5Long(g).bitwiseAND(lit(Long.MaxValue))

  /** (doc_id, n_hits): corpus documents sharing at least one word n-gram
    * with `eval`, with the count of distinct overlapping n-grams. */
  def contaminated(corpus: DataFrame, eval: DataFrame, textCol: String,
                   idCol: String, n: Int): DataFrame = {
    val evalGrams = eval
      .select(explode(wordNgrams(col(textCol), n)).as("__g"))
      .select(gramHash(col("__g")).as("__ng")).distinct()
    corpus
      .select(col(idCol), explode(wordNgrams(col(textCol), n)).as("__g"))
      .select(col(idCol), gramHash(col("__g")).as("__ng"))
      .join(broadcast(evalGrams), "__ng")
      .groupBy(col(idCol))
      .agg(countDistinct(col("__ng")).as("n_hits"))
  }
}
