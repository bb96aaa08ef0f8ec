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

  /** Dense Bloom filter words (63 bits per long, ceil(mBits/63) longs) over
    * the distinct word n-grams of `eval` — probe scheme documented on
    * [[expressions.BloomHits]]. Built distributed (explode → k probe
    * positions → per-word `bit_or`), then collected: the collect is the
    * FILTER, not the gram set — ceil(mBits/63) rows regardless of how many
    * grams went in (~130 KB at the 2^20-bit default; a 2^30-bit production
    * filter is ~17 MB, still driver-safe, built once per eval-set
    * version). */
  def bloomFilter(eval: DataFrame, textCol: String, n: Int,
                  numProbes: Int, mBits: Int): Array[Long] = {
    bloomFilterOf(
      eval.select(explode(wordNgrams(col(textCol), n)).as("__g")),
      numProbes, mBits)
  }

  /** Bloom filter over arbitrary key strings (`__g` derived from
    * `keyCol`) — the generic builder behind [[bloomFilter]] (n-gram
    * decontamination) and [[graft.ops.Skew.bloomPrefilteredJoin]]
    * (join-key pre-filtering). Same probe scheme as
    * [[expressions.BloomHits]], replayable bit-for-bit. */
  def bloomFilterKeys(df: DataFrame, keyCol: org.apache.spark.sql.Column,
                      numProbes: Int, mBits: Int): Array[Long] =
    bloomFilterOf(df.select(keyCol.cast("string").as("__g")),
      numProbes, mBits)

  private def bloomFilterOf(grams: DataFrame, numProbes: Int,
                            mBits: Int): Array[Long] = {
    val probes = (1 to numProbes).map { i =>
      (expressions.Md5Long(concat(col("__g"), lit("#" + i)))
        .bitwiseAND(lit(Long.MaxValue)) % mBits).as(s"__p$i")
    }
    val sparse = grams.distinct()
      .select(explode(array(probes: _*)).as("__p"))
      .select(expr("__p DIV 63").as("__w"),
        expr("shiftleft(1L, CAST(__p % 63 AS INT))").as("__m"))
      .groupBy(col("__w")).agg(expr("bit_or(__m)").as("__bits"))
      .collect()
    val words = new Array[Long]((mBits + 62) / 63)
    sparse.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Bloom-filter decontamination — the 100 TB shape of [[contaminated]]:
    * the eval set collapses to a fixed-size bit array and the corpus-side
    * membership test is a single scan-stage expression (no gram explode, no
    * join; only flagged docs reach the output). One-sided by construction:
    * every exactly-contaminated doc is flagged with `n_bloom_hits >=
    * n_hits`, and any surplus rows/counts are false positives at the
    * filter's ~(1-e^(-kn/m))^k rate. Output (doc_id, n_bloom_hits,
    * n_exact_hits) keeps the exact count alongside so the error is visible
    * (0 n_exact_hits = a purely-false-positive doc). */
  def contaminatedBloom(corpus: DataFrame, eval: DataFrame, textCol: String,
                        idCol: String, n: Int, numProbes: Int,
                        mBits: Int): DataFrame = {
    val filt = bloomFilter(eval, textCol, n, numProbes, mBits)
    val flagged = corpus
      .select(col(idCol),
        expressions.BloomHits(wordNgrams(col(textCol), n),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(filt),
          numProbes, mBits).as("n_bloom_hits"))
      .where(col("n_bloom_hits") > 0)
    flagged
      .join(contaminated(corpus, eval, textCol, idCol, n)
        .withColumnRenamed("n_hits", "n_exact_hits"), Seq(idCol), "left")
      .select(col(idCol), col("n_bloom_hits"),
        coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"))
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams that occur in no other document — the memorization /
    * boilerplate-share audit (low novelty = the doc is assembled from
    * corpus-common n-grams; the complement of [[Dedup]]'s near-dup view).
    *
    * Returns `(id, n_grams, n_novel, novelty)`, one row per input doc
    * (gram-less docs score 0.0). Scale shape: grams ride as 63-bit md5
    * keys (8 B through both shuffles, same bridge as [[contaminated]]);
    * the document-frequency table is map-side combined, and the join back
    * is gram-keyed — everything linear in corpus gram count. */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame = {
    // array_distinct prunes locally; the (id, hash) distinct pins parity
    // with the oracle's DISTINCT-on-hash even under a 63-bit collision
    val grams = docs
      .select(col(idCol),
        explode(array_distinct(wordNgrams(col(textCol), n))).as("__g"))
      .select(col(idCol), gramHash(col("__g")).as("__h"))
      .distinct()
    val df = grams.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    val per = grams.join(df, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_novel"))
    docs.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_novel").cast("double") /
            col("n_grams").cast("double"), 6)).as("novelty"))
  }
}
