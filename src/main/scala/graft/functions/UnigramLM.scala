package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level unigram language-model statistics — the classic cheap
  * quality filter for LLM training data (the KenLM-filter role, reduced to
  * unigrams): score every document against the corpus's own token
  * distribution, flag documents dominated by rare/unseen tokens, and build
  * the frequency-ranked vocabulary used for tokenizer training.
  *
  * 100 TB design: one `groupBy(token)` shuffle with map-side partial
  * aggregation builds the frequency table (bounded by vocabulary size, which
  * grows ~log with corpus size); per-doc scoring broadcasts it and
  * re-aggregates by doc id. At real corpus scale the table is truncated by
  * `minCount` before broadcast — rare tokens collapse into the OOV bucket
  * exactly as a trained tokenizer would treat them.
  *
  * Determinism: the oracle-facing stats are integer sums (token counts and
  * corpus frequencies) and exact integer ratios rounded at the end — no
  * float accumulation order to diverge on. Log-space perplexity
  * ([[surprisal]]) is a double and deliberately NOT part of the oracle
  * surface (ln() is only ~1-ulp-specified in both engines); its spec checks
  * it against a Scala reference with a tolerance instead.
  */
object UnigramLM {

  private def toks(text: Column): Column =
    TextFunctions.tokens(lower(trim(text)))

  /** Corpus token frequencies: `(token, freq)`, lowercased whitespace
    * tokens. One shuffle, partial-agg before it. */
  def tokenFrequencies(docs: DataFrame, textCol: String,
                       minCount: Long = 1): DataFrame =
    docs.select(explode(toks(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)

  /** Per-document corpus-frequency score: `(doc_id, n_toks, sum_freq,
    * n_rare, mean_freq, rare_ratio)`. `sum_freq` = Σ corpus-frequency of the
    * doc's tokens (duplicates counted — it is the doc's token multiset);
    * `n_rare` = tokens with corpus frequency < `rareBelow`. Low `mean_freq`
    * / high `rare_ratio` = gibberish, boilerplate code, or wrong-language
    * content — the unigram version of a perplexity gate. */
  def corpusFreqScore(docs: DataFrame, idCol: String, textCol: String,
                      rareBelow: Long = 5): DataFrame = {
    val freqs = broadcast(tokenFrequencies(docs, textCol))
    docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .join(freqs, Seq("token")) // inner: every doc token exists in the corpus table
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_toks"),
        sum(col("freq")).as("sum_freq"),
        sum(when(col("freq") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_toks"), col("sum_freq"), col("n_rare"),
        round(col("sum_freq").cast("double") / col("n_toks"), 6).as("mean_freq"),
        round(col("n_rare").cast("double") / col("n_toks"), 6).as("rare_ratio"))
  }

  /** Per-document mean surprisal −mean log2 p(token) under the corpus
    * unigram LM (2^surprisal = perplexity). Spec-checked against a Scala
    * reference; excluded from the DuckDB oracle (see class doc). */
  def surprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val freqs = broadcast(tokenFrequencies(docs, textCol))
    val total = freqs.agg(sum("freq")).head.getLong(0).toDouble // metadata-scale
    docs.select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("token"))
      .join(freqs, Seq("token"))
      .groupBy("doc_id")
      .agg((-sum(log(2.0, col("freq") / total)) / count(lit(1))).as("surprisal"))
  }

  /** Space-joined word bigrams of the lowercased token stream (tokens
    * contain no spaces, so the join is collision-free — the Decontam
    * n-gram trick at n=2). Empty for sub-2-token docs. Single-walk
    * [[expressions.WordNgrams]] expression — the declarative
    * transform/concat_ws chain was interpreted per element and held the
    * bigram queries at ~13 s at sf0.1. */
  def bigrams(text: Column): Column =
    expressions.NgramExprs.wordNgrams(lower(trim(text)), 2)

  /** Corpus bigram frequencies: `(bigram, freq)`. Same single-shuffle
    * shape as [[tokenFrequencies]]; the table is larger (bigram vocab
    * grows faster than unigram) so `minCount` truncation matters sooner
    * at corpus scale. */
  def bigramFrequencies(docs: DataFrame, textCol: String,
                        minCount: Long = 1): DataFrame =
    docs.select(explode(bigrams(col(textCol))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("freq"))
      .where(col("freq") >= minCount)

  /** Per-document bigram-frequency score — the order-2 sharpening of
    * [[corpusFreqScore]]: a document whose unigrams are common but whose
    * bigrams are rare is word salad, which a unigram gate cannot see.
    * Same integer-exact output shape: `(doc_id, n_bigrams, sum_freq,
    * n_rare, mean_freq, rare_ratio)`. */
  def bigramScore(docs: DataFrame, idCol: String, textCol: String,
                  rareBelow: Long = 5): DataFrame = {
    val freqs = broadcast(bigramFrequencies(docs, textCol))
    docs.select(col(idCol).as("doc_id"),
        explode(bigrams(col(textCol))).as("bigram"))
      .join(freqs, Seq("bigram"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("freq")).as("sum_freq"),
        sum(when(col("freq") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_freq"), col("n_rare"),
        round(col("sum_freq").cast("double") / col("n_bigrams"), 6).as("mean_freq"),
        round(col("n_rare").cast("double") / col("n_bigrams"), 6).as("rare_ratio"))
  }

  /** Top-k collocations by pointwise mutual information:
    * `pmi(a,b) = ln(f_ab·T / (f_a·f_b))` over bigrams with `f_ab >=
    * minCount` (PMI at low counts is noise — the standard cutoff). The
    * corpus-phrase detector (multi-word entities, idioms) beside the
    * frequency-only [[vocab]].
    *
    * Scale shape: the unigram and bigram tables are the two existing
    * single-shuffle aggregations; the bigram table joins the unigram
    * table twice on the word key (sort-merge — vocab not assumed
    * broadcast-small), T broadcasts as one row, and the top-k is
    * TakeOrderedAndProject. Float discipline: counts exact; ONE double
    * expression `ln((fab·T)/(f1·f2))` with every cast pinned, ties broken
    * by the bigram string. */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    require(k > 0 && minCount >= 1, "k and minCount must be positive")
    val uni = tokenFrequencies(docs, textCol)
    val tot = broadcast(uni.agg(sum(col("freq")).as("__t")))
    val pmi = log((col("fab").cast("double") * col("__t").cast("double")) /
      (col("f1").cast("double") * col("f2").cast("double")))
    bigramFrequencies(docs, textCol, minCount)
      .withColumnRenamed("freq", "fab")
      .withColumn("w1", split(col("bigram"), " ")(0))
      .withColumn("w2", split(col("bigram"), " ")(1))
      .join(uni.select(col("token").as("w1"), col("freq").as("f1")), Seq("w1"))
      .join(uni.select(col("token").as("w2"), col("freq").as("f2")), Seq("w2"))
      .crossJoin(tot)
      .select(col("bigram"), col("fab"), col("f1"), col("f2"),
        round(pmi, 6).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  /** Frequency-ranked vocabulary: top `topK` tokens as `(vocab_id, token,
    * freq)`, ids dense from 0 in (freq DESC, token ASC) order — the
    * deterministic tie-break makes the table identical on every run and
    * engine. Top-K plans as TakeOrderedAndProject (distributed partial
    * top-K, no global sort); the final numbering runs over K rows —
    * metadata-scale by construction. */
  def vocab(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val order = Seq(col("freq").desc, col("token").asc)
    tokenFrequencies(docs, textCol)
      .orderBy(order: _*).limit(topK)
      .withColumn("vocab_id",
        (row_number().over(Window.orderBy(order: _*)) - 1).cast("long"))
      .select("vocab_id", "token", "freq")
  }

  /** Per-document out-of-vocabulary rate against the corpus top-`topK`
    * vocabulary: `(id, n_tokens, n_oov, oov_rate)` — the tokenizer-fit /
    * domain-shift audit run before committing a vocab to a training mix.
    *
    * Scale shape: the vocab is a K-row broadcast (TakeOrderedAndProject
    * partial top-K builds it, same as [[vocab]]); membership is a hash
    * lookup inside the per-doc token walk — one corpus scan, no shuffle
    * beyond the K-row build. */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              topK: Int): DataFrame = {
    val vocabToks = vocab(docs, textCol, topK).select(col("token"))
    val toks = TextFunctions.tokens(lower(col(textCol)))
    docs.select(col(idCol), explode_outer(toks).as("__t"))
      .join(broadcast(vocabToks.withColumn("__in", lit(1L))),
        col("__t") === col("token"), "left")
      .groupBy(col(idCol))
      .agg(count(col("__t")).as("n_tokens"),
        sum(when(col("__t").isNotNull && col("__in").isNull, 1L)
          .otherwise(0L)).as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("n_oov").cast("double") /
            col("n_tokens").cast("double"), 6)).as("oov_rate"))
  }

  /** Stupid Backoff bigram scoring (Brants et al. 2007) on a held-out
    * split — the web-scale LM rule: score a bigram by its conditional
    * frequency when the TRAIN split saw it, else back off to
    * `α · unigram`: `S(w₂|w₁) = c(w₁w₂)/c(w₁)` or
    * `α · (c(w₂)+1)/(N+1)` (the +1 floor keeps OOV words finite,
    * pinned). Backoff RATE is the interesting signal: a document whose
    * bigrams constantly back off is phrased unlike the corpus even when
    * its words are common — [[bigramScore]]'s rare-gate, upgraded with a
    * principled score.
    *
    * Every log is `round(ln(exact ratio), 9)` pinned to DECIMAL before
    * the per-doc sum (the ln bridge). Frequency tables join sort-merge —
    * the bigram vocab is NOT broadcast-assumed ([[pmiCollocations]]
    * rule). Returns per held-out doc:
    * `(doc_id, n_bigrams, n_backoff, avg_logscore)`. */
  def stupidBackoff(docs: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.4): DataFrame = {
    val split = graft.functions.expressions.Md5Long(
      concat(col(idCol).cast("string"), lit("|sb")))
      .bitwiseAND(lit(Long.MaxValue)) % 2
    val train = docs.where(split === 0)
    val bi = bigramFrequencies(train, textCol)
      .select(col("bigram"), col("freq").as("__c12"))
    val uni = tokenFrequencies(train, textCol)
    val nTok = broadcast(train
      .select(explode(toks(col(textCol))).as("t"))
      .agg(count(lit(1)).as("__N")))
    val scored = docs.where(split === 1)
      .select(col(idCol).as("doc_id"),
        explode(bigrams(col(textCol))).as("bigram"))
      .withColumn("__w1", split_part(col("bigram"), lit(" "), lit(1)))
      .withColumn("__w2", split_part(col("bigram"), lit(" "), lit(2)))
      .join(bi, Seq("bigram"), "left_outer")
      .join(uni.select(col("token").as("__w1"), col("freq").as("__c1")),
        Seq("__w1"), "left_outer")
      .join(uni.select(col("token").as("__w2"), col("freq").as("__c2")),
        Seq("__w2"), "left_outer")
      .crossJoin(nTok)
      .select(col("doc_id"),
        col("__c12").isNull.cast("long").as("__bo"),
        when(col("__c12").isNotNull,
          round(log(col("__c12").cast("double") /
            col("__c1").cast("double")), 9))
          .otherwise(round(log(lit(alpha) *
            ((coalesce(col("__c2"), lit(0L)) + 1).cast("double") /
              (col("__N") + 1).cast("double"))), 9))
          .cast("decimal(18,9)").as("__s"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__bo")).as("n_backoff"),
        round(sum(col("__s")).cast("double") / count(lit(1)), 6)
          .as("avg_logscore"))
  }

  /** Held-out unigram perplexity — the LM-quality eval the per-doc
    * scores ([[corpusFreqScore]], [[surprisal]]) feed but never close:
    * train a Laplace-smoothed unigram model on the md5-even half of the
    * corpus, evaluate `exp(mean NLL)` on the held-out half. A corpus
    * whose held-out perplexity drifts between snapshots changed
    * distribution even when its token counts didn't.
    *
    * Model (pinned): `p(t) = (c_t + 1) / (N + V + 1)` with c from the
    * train split, V = train vocab size, and the +1 bucket serving every
    * unseen token. Each token's `round(−ln p, 9)` is pinned to DECIMAL
    * before the exact corpus sum (the ln bridge); the mean is one
    * division and the final `exp` one call, both rounded 6.
    *
    * Scale shape: one token-keyed partial aggregate per split, an eval-
    * token × train-frequency sort-merge join (vocab NOT broadcast-
    * assumed — the [[pmiCollocations]] rule), and 1-row broadcast
    * totals. */
  def heldoutPerplexity(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("__id"),
        (graft.functions.expressions.Md5Long(
          concat(col(idCol).cast("string"), lit("|ppl")))
          .bitwiseAND(lit(Long.MaxValue)) % 2).as("__split"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val train = toks.where(col("__split") === 0)
      .groupBy("token").agg(count(lit(1)).as("__c"))
    val stats = broadcast(train.agg(sum(col("__c")).as("__n"),
      count(lit(1)).as("__v")))
    val evalToks = toks.where(col("__split") === 1)
    val nll = evalToks
      .join(train, Seq("token"), "left_outer")
      .crossJoin(stats)
      .select(round(-log((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
        (col("__n") + col("__v") + 1).cast("double")), 9)
        .cast("decimal(18,9)").as("__nll"))
    nll.crossJoin(stats)
      .agg(min(col("__n")).as("n_train_tokens"), min(col("__v")).as("vocab"),
        count(lit(1)).as("n_eval_tokens"), sum(col("__nll")).as("__s"))
      .select(col("n_train_tokens"), col("vocab"), col("n_eval_tokens"),
        round(col("__s").cast("double") / col("n_eval_tokens"), 6)
          .as("avg_nll"),
        round(exp(col("__s").cast("double") / col("n_eval_tokens")), 6)
          .as("perplexity"))
  }
}
