package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * `Column` expressions built from `org.apache.spark.sql.functions` — fully
  * codegen'd, evaluated inside the scan projection (no shuffle, no UDF), so
  * they stream at parquet-scan speed on any cluster size.
  *
  * The reference has no text operators of its own (SURVEY.md §2.9) — these are
  * the training-data-pipeline extensions the engine adds as first-class ops.
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A crude BPE-ish subword count: letter runs consumed in chunks of <=4
    * chars, each digit, and each non-space symbol count as one token (regex
    * approximation kept for cheap heuristics; [[bpeTokenCount]] is the
    * tokenizer-faithful counter). */
  def subwordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"))

  /** Real greedy-merge BPE subword count over the built-in merge table
    * ([[graft.functions.expressions.BpeVocab]]) — deterministic, computed in
    * the scan projection, and exactly replayed by the DuckDB oracle (the
    * oracle's merge VALUES are generated from the same Scala table). Swap
    * the table for a model's published merge list for budget-grade counts. */
  def bpeTokenCount(text: Column): Column =
    graft.functions.expressions.BpeExprs.bpeCount(text)

  /** Deterministic word-dropout augmentation: token at 0-based position
    * `p` survives iff `md5₆₃(id|p|seed) % 100 >= dropPct` — the
    * paraphrase-free augmentation (and robustness-eval perturbation) used
    * to multiply scarce training text. Pure scan-stage array arithmetic
    * (tokenize → indexed higher-order filter with the md5 gate →
    * re-join); no shuffle, no RNG state, and the gate replays exactly in
    * the oracle (DuckDB's indexed list_filter is 1-based — the replay
    * uses `i-1`). */
  def dropoutTokens(idCol: Column, text: Column, dropPct: Int,
                    seed: String): Column = {
    require(dropPct >= 0 && dropPct < 100, s"dropPct $dropPct out of [0,100)")
    val toks = tokens(text)
    val kept = filter(toks, (t, i) =>
      pmod(expressions.Md5Long(concat_ws("|", idCol.cast("string"),
          i.cast("string"), lit(seed)))
        .bitwiseAND(lit(Long.MaxValue)), lit(100L)) >= dropPct)
    array_join(kept, " ")
  }

  def charCount(text: Column): Column = length(text)

  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))

  def digitRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[^0-9]", "")).cast("double") / length(text))

  // ------------------------------------------------------- PII scrubbing

  /** PII patterns shared verbatim with the DuckDB oracle: RE2-safe (no
    * backrefs / lookarounds), identical match semantics in Java regex.
    * Raw strings — single backslashes work in both engines. */
  val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  val PhoneRe = """\+\d{9,14}"""
  val Ipv4Re = """\b\d{1,3}(\.\d{1,3}){3}\b"""

  /** Redact emails, +intl phone numbers, and IPv4 addresses — the standard
    * corpus-hygiene pass before publication or training. Email first (its
    * body would otherwise feed the IP pattern); three codegen'd
    * regexp_replace ops in the scan projection, no shuffle. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Mean whitespace-token length (0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double") / n)
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "on", "with", "as", "was", "are", "this", "be", "by", "at", "from")
  val GermanStopwords: Seq[String] = Seq(
    "der", "die", "das", "und", "ist", "von", "mit", "den", "im", "für",
    "auf", "ein", "eine", "nicht", "auch", "sich", "des", "dem", "zu", "werden")
  val SpanishStopwords: Seq[String] = Seq(
    "el", "la", "de", "que", "y", "en", "los", "del", "se", "las",
    "por", "un", "para", "con", "una", "es", "al", "lo", "como", "más")
  val FrenchStopwords: Seq[String] = Seq(
    "le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
    "dans", "que", "pour", "qui", "sur", "pas", "au", "plus", "par", "avec")

  private def lcTokens(text: Column): Column = array_distinct(tokens(lower(text)))

  /** # of distinct lowercase tokens hitting a stopword list. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(array_intersect(lcTokens(text), array(words.map(lit): _*)))

  def stopwordRatio(text: Column, words: Seq[String] = EnglishStopwords): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(
      size(filter(tokens(lower(text)), t => array_contains(array(words.map(lit): _*), t)))
        .cast("double") / n)
  }

  /** CJK character count (Chinese text carries no whitespace tokens, so
    * stopword scoring can't see it — count Han codepoints instead). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^一-鿿]", ""))

  def cjkRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(cjkCount(text).cast("double") / length(text))

  // ------------------------------------------------- single-pass statistics

  /** Every per-document count in ONE pass ([[graft.functions.expressions
    * .TextStats]] struct: n_chars/n_alpha/n_digit/n_punct/n_cjk/n_tokens/
    * stop_occ_en/hits_{en,de,es,fr}) — the scan-stage building block for
    * [[qualityScore]], [[langId]] and the text_stats query. Repeated uses of
    * the same struct in one projection are deduplicated by Spark's
    * subexpression elimination, so a query reading 8 stats still walks the
    * document once, not 8 times. */
  def textStats(text: Column): Column =
    graft.functions.expressions.TextExprs.textStats(text)

  /** alphaRatio rebuilt from a [[textStats]] struct (identical value). */
  def alphaRatioFrom(stats: Column): Column =
    when(stats.getField("n_chars") === 0, lit(0.0)).otherwise(
      stats.getField("n_alpha").cast("double") / stats.getField("n_chars"))

  def digitRatioFrom(stats: Column): Column =
    when(stats.getField("n_chars") === 0, lit(0.0)).otherwise(
      stats.getField("n_digit").cast("double") / stats.getField("n_chars"))

  def punctRatioFrom(stats: Column): Column =
    when(stats.getField("n_chars") === 0, lit(0.0)).otherwise(
      stats.getField("n_punct").cast("double") / stats.getField("n_chars"))

  def stopwordRatioFrom(stats: Column): Column =
    when(stats.getField("n_tokens") === 0, lit(0.0)).otherwise(
      stats.getField("stop_occ_en").cast("double") / stats.getField("n_tokens"))

  def cjkRatioFrom(stats: Column): Column =
    when(stats.getField("n_chars") === 0, lit(0.0)).otherwise(
      stats.getField("n_cjk").cast("double") / stats.getField("n_chars"))

  /** n-gram-heuristic language ID over {en,de,es,fr,zh}: CJK ratio ≥ 0.2 ⇒ zh,
    * else argmax of stopword hits with a deterministic tie order
    * (en > de > es > fr; 0 hits everywhere ⇒ "und" = undetermined).
    * Declarative definition (the oracle-SQL-facing one): stopwordHits ×4 +
    * cjkRatio; computed here from one [[textStats]] pass. */
  def langIdFrom(stats: Column): Column = {
    val en = stats.getField("hits_en")
    val de = stats.getField("hits_de")
    val es = stats.getField("hits_es")
    val fr = stats.getField("hits_fr")
    when(cjkRatioFrom(stats) >= 0.2, lit("zh"))
      .when(en === 0 && de === 0 && es === 0 && fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
  }

  def langId(text: Column): Column = langIdFrom(textStats(text))

  /** Composite quality score in [0,1]: favors alphabetic text of reasonable
    * length with moderate punctuation and some stopword mass. Deterministic,
    * branch-free, codegen'd. Declarative definition: lenScore·0.25 +
    * alphaRatio·0.35 + min(stopwordRatio·4,1)·0.2 + max(0,1−punctRatio·5)·0.2;
    * computed here from one [[textStats]] pass. */
  def qualityScoreFrom(stats: Column): Column = {
    val lenScore = least(stats.getField("n_chars").cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatioFrom(stats)
    val stop = least(stopwordRatioFrom(stats) * 4.0, lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatioFrom(stats) * 5.0)
    round(lenScore * 0.25 + alpha * 0.35 + stop * 0.2 + punctPenalty * 0.2, 6)
  }

  def qualityScore(text: Column): Column = qualityScoreFrom(textStats(text))

  /** Whitespace-collapsed, lowercased canonical form. */
  def normalizedText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Stable content fingerprint: md5 of the canonical form. */
  def fingerprintMd5(text: Column): Column = md5(normalizedText(text))

  /** Character k-gram (shingle) set of the canonical form. Sub-k texts
    * yield an EMPTY set — guarded because Spark's `sequence(1, 0)` DESCENDS
    * (returns [1, 0]) where SQL generate_series is empty. */
  def shingles(text: Column, k: Int): Column = {
    val t = normalizedText(text)
    val n = greatest(length(t) - (k - 1), lit(0))
    when(n >= 1,
      array_distinct(transform(sequence(lit(1), n), i => t.substr(i, lit(k)))))
      .otherwise(typedlit(Array.empty[String]))
  }

  /** Fixed-window document chunking with overlap — the embedding-pipeline
    * splitter: chunk i covers characters [i·(size−overlap), i·(size−overlap)
    * + size), 0-based; the last chunk may be shorter; a chunk starts only
    * while the previous one didn't already reach the end (no fully-covered
    * trailing fragment); empty docs yield no chunks. Pure scan-stage
    * arithmetic (`sequence` + `substring`) — zero shuffle, and the chunk
    * count is known per row up front (bounded fan-out, the same explode
    * discipline as the range-join bucketing).
    * Output: idCol, chunk_id, chunk_start, chunk_text. */
  def chunkDocs(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, size: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > overlap >= 0")
    val step = size - overlap
    df.select(col(idCol), col(textCol).as("__t"))
      .where(char_length(col("__t")) > 0)
      .withColumn("__nc",
        lit(1) + floor(greatest(char_length(col("__t")) - overlap - 1, lit(0))
          / step).cast("int"))
      .withColumn("chunk_id", explode(sequence(lit(0), col("__nc") - 1)))
      .select(col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * step).cast("long").as("chunk_start"),
        col("__t").substr(col("chunk_id") * step + 1, lit(size))
          .as("chunk_text"))
  }
}
