package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: BM25 (Robertson et al., the
  * TREC-3 Okapi formulation) scoring of a bag-of-terms query, returning the
  * top-k documents. The reference has no search surface (its text coverage
  * is nil — SURVEY.md §2.9); this is a training-data-pipeline extension:
  * "pull the k documents most about X" is the standard seed step for
  * targeted corpus slices and eval-set curation.
  *
  * Scale design: everything is a scan-stage projection over the token
  * array — per-term tf via `filter(...)`+`size` (codegen'd, no UDF, no
  * explode: a query of q terms costs q array walks, not a tokens-table
  * shuffle). Corpus statistics (N, Σdl, per-term df) are ONE single-row
  * aggregate broadcast back to the scan; the top-k is `orderBy(...).limit(k)`
  * which Spark executes as TakeOrderedAndProject — per-partition partial
  * top-k, then a k-row merge on the driver, never a global sort. The tf
  * projection feeds both the stats pass and the scoring pass, so it is
  * persisted: a few dozen bytes per document (id + dl + q tf longs, the
  * text column already dropped) versus re-walking every token array q+1
  * times per pass.
  *
  * Float discipline (oracle-exact): tf/dl/df/N are exact integers; the
  * doubles (idf, length norm) derive from them with ONE fixed expression
  * shape, and the per-term contributions are added in declared term order
  * (left-associated `+`), so the sum is bit-reproducible in any engine that
  * evaluates the same shape — no AVG, no float SUM over groups.
  */
object Retrieval {

  /** Lowercased whitespace tokens — the tokenization the DuckDB oracle
    * mirrors as string_split_regex(lower(trim(text)), '\s+'). */
  private def toks(text: Column): Column =
    TextFunctions.tokens(lower(text))

  /** Top-k documents by BM25 over `terms`. Output (idCol, bm25) with the
    * score rounded to 6 dp (ordering uses the rounded value so engine ulp
    * differences cannot flip near-ties; doc id breaks exact ties). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term")
    require(k > 0, "k must be positive")
    val tfCols = terms.zipWithIndex.map { case (term, i) =>
      size(filter(toks(col(textCol)), t => t === lit(term)))
        .cast("long").as(s"__tf$i")
    }
    val base = Dedup.barrier(docs.select(
      (col(idCol) +: size(toks(col(textCol))).cast("long").as("__dl") +:
        tfCols): _*), checkpoint = false)
    val statAggs = count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = base.agg(statAggs.head, statAggs.tail: _*)

    val avgdl = col("__sumdl").cast("double") / col("__n")
    def contrib(i: Int): Column = {
      val tf = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      val norm = lit(1.0 - b) + lit(b) * (col("__dl").cast("double") / avgdl)
      idf * (tf * lit(k1 + 1.0)) / (tf + lit(k1) * norm)
    }
    val score = terms.indices.map(contrib).reduceLeft(_ + _)
    val anyHit = terms.indices.map(i => col(s"__tf$i") > 0).reduceLeft(_ || _)
    base.join(broadcast(stats))
      .where(anyHit)
      .select(col(idCol), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Ranking stability under scorer hyperparameters — top-k overlap
    * (Jaccard) and Kendall τ between two [[bm25TopK]] parameterizations
    * of the SAME query: the pre-deploy check that a k1/b retune reorders
    * the tail, not the head. Ranks are positions in each (score DESC,
    * id) total order; τ counts concordant minus discordant pairs over
    * the COMMON documents (no ties possible — ranks are distinct), one
    * rounded division at the end. Everything after the two k-row
    * rankings is k²-bounded arithmetic. Returns one row
    * `(n_a, n_b, n_common, jaccard, kendall_tau)`; τ is NULL when fewer
    * than 2 common docs. */
  def rankStability(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], k: Int,
                    k1a: Double, bA: Double,
                    k1b: Double, bB: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(k1: Double, b: Double, as: String) =
      bm25TopK(docs, idCol, textCol, terms, k, k1, b)
        .select(col(idCol).as("id"),
          row_number().over(
            Window.orderBy(col("bm25").desc, col(idCol))).as(as))
    val ra = ranked(k1a, bA, "ra")
    val rb = ranked(k1b, bB, "rb")
    val common = Dedup.barrier(ra.join(rb, "id"), checkpoint = false)
    val counts = broadcast(ra.agg(count(lit(1)).as("__na"))
      .crossJoin(rb.agg(count(lit(1)).as("__nb")))
      .crossJoin(common.agg(count(lit(1)).as("__nc"))))
    val pairs = common.as("x").join(common.as("y"),
        col("x.id") < col("y.id"))
      .select(when((col("x.ra") - col("y.ra")) *
        (col("x.rb") - col("y.rb")) > 0, 1L).otherwise(-1L).as("__s"))
    pairs.agg(sum(col("__s")).as("__cd")).crossJoin(counts)
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__nc").as("n_common"),
        when(col("__na") + col("__nb") - col("__nc") === 0,
          lit(null).cast("double"))
          .otherwise(round(col("__nc").cast("double") /
            (col("__na") + col("__nb") - col("__nc")), 6)).as("jaccard"),
        round(col("__cd").cast("double") /
          expr("(__nc * (__nc - 1)) div 2"), 6).as("kendall_tau"))
  }

  /** Ranking-quality metrics for a batch of term queries — NDCG@k and
    * MRR@k of the [[bm25TopK]] ranking against binary relevance
    * ("document contains EVERY query term"): the eval loop a retrieval
    * pipeline runs after every index or scorer change.
    *
    * Float discipline: each rank's discounted gain is ONE fixed double
    * expression `1 / (ln(rank+1)/ln 2)` pinned `round(·,9) → DECIMAL`
    * before summation (order-independent); NDCG divides the two exact
    * decimal sums in one double op, rounded to 6 dp. MRR is
    * `round(1/first_rel_rank, 9)`; queries with no relevant document in
    * the top-k score 0 for both.
    *
    * Scale: per query, one bm25 pass (scan + single-row stats broadcast +
    * TakeOrderedAndProject) plus arithmetic over the k-row result; the
    * relevant-document count is a 1-row aggregate. Queries are
    * independent — a q-query eval is q parallel scans, not a cross
    * join. */
  def rankingMetrics(docs: DataFrame, idCol: String, textCol: String,
                     queries: Seq[Seq[String]], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    queries.map { terms =>
      val name = terms.mkString(" ")
      val ranked = bm25TopK(docs, idCol, textCol, terms, k)
      val hasAll = terms.map(tm =>
        size(filter(toks(col(textCol)), t => t === lit(tm))) > 0)
        .reduceLeft(_ && _)
      val rel = docs.select(col(idCol),
        when(hasAll, 1L).otherwise(0L).as("__rel"))
      val nRel = rel.agg(sum(col("__rel")).as("__nrel"))
      // k rows — the no-partition window is bounded by construction
      val w = Window.orderBy(col("bm25").desc, col(idCol))
      val gain = round(lit(1.0) /
        (log(col("__rank") + 1) / log(lit(2.0))), 9).cast("decimal(18,9)")
      val scored = ranked.join(rel, idCol)
        .withColumn("__rank", row_number().over(w))
        .select((col("__rel").cast("decimal(12,0)") * gain).as("__g"),
          when(col("__rel") === 1, col("__rank")).as("__rr"))
        .agg(sum(col("__g")).as("__dcg"), min(col("__rr")).as("__first"))
      // ideal DCG over ranks 1..min(k, n_rel)
      val ideal = docs.sparkSession.range(1, k + 1).toDF("__rank")
        .crossJoin(broadcast(nRel))
        .filter(col("__rank") <= col("__nrel"))
        .agg(sum(gain).as("__idcg"))
      scored.crossJoin(broadcast(ideal)).crossJoin(broadcast(nRel))
        .select(lit(name).as("query"), col("__nrel").as("n_rel"),
          when(col("__idcg").isNull, lit(0.0))
            .otherwise(round(col("__dcg").cast("double") /
              col("__idcg").cast("double"), 6)).as("ndcg"),
          when(col("__first").isNull, lit(0.0))
            .otherwise(round(lit(1.0) / col("__first"), 9)).as("mrr"))
    }.reduce(_.unionByName(_))
  }

  /** Top-k TF-IDF keywords per document — the per-doc complement of
    * [[bm25TopK]]'s per-query scoring (keyword tagging / topic seeding for
    * corpus slices). `score = tf · ln(N/df)`; common words get idf → 0 and
    * fall out of the top-k naturally.
    *
    * Scale shape: term frequencies are one (doc, token)-keyed partial-agg
    * shuffle of the exploded scan; document frequencies re-aggregate THAT
    * result token-keyed (vocab-sized input, not corpus-sized); the df
    * table joins back on the token key sort-merge — vocab is NOT assumed
    * broadcast-small. N broadcasts as a single row. The per-doc top-k is
    * a rank-filtered doc-keyed window (WindowGroupLimit: map-side top-k
    * before the exchange).
    *
    * Float discipline: tf/df/N exact integers; the one double expression
    * is `tf * ln(N/df)`; the window orders on the ROUNDED score (6 dp)
    * with the token as the tie break, so sub-rounding ln ulp differences
    * between engines collapse into the deterministic tie-break — the
    * bm25/pmi ordering convention. */
  /** Top-k most-similar documents per document by sparse TF-IDF cosine —
    * lexical similarity search, the sparse complement of the dense
    * embedding ANN family ([[Vectors.annTopK]]/IVF): near-dup mining and
    * "more like this" retrieval with no embedding model in the loop.
    *
    * Scale shape: the (doc, token, tf) table shuffles once; tokens with
    * `df > maxDf` are DROPPED before pairing (stopword-frequency terms
    * carry ~zero idf but quadratic join mass — the hot-key cap rule, same
    * role as [[Dedup.capHotKeys]]), so the token self-join is bounded by
    * Σ df² over capped tokens; pair scores partial-aggregate to the
    * observed pair set; per-doc top-k is a WindowGroupLimit rank filter.
    *
    * Float discipline: weights `round(tf·ln(N/df), 9)` pinned to
    * DECIMAL(18,9), so pair dot products and per-doc norm sums are EXACT
    * decimal arithmetic; the norm takes one sqrt (correctly rounded in
    * both engines) pinned to 9 dp; the cosine is one double division
    * rounded to 6 dp, ordered with the neighbor-id tie-break. */
  def tfidfNeighbors(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, maxDf: Long,
                     checkpoint: Boolean = false): DataFrame = {
    require(k > 0 && maxDf > 0, "k and maxDf must be positive")
    val tf = Dedup.barrier(docs
      .select(col(idCol).as("__id"), explode(toks(col(textCol))).as("__t"))
      .groupBy("__id", "__t").agg(count(lit(1)).as("__tf")), checkpoint)
    val dfT = tf.groupBy("__t").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf)
    val n = broadcast(docs.agg(count(lit(1)).as("__n")))
    val weighted = Dedup.barrier(tf.join(dfT, "__t").crossJoin(n)
      .select(col("__id"), col("__t"),
        round(col("__tf").cast("double") *
            log(col("__n").cast("double") / col("__df").cast("double")), 9)
          .cast("decimal(18,9)").as("__w")), checkpoint)
    val norms = weighted.groupBy("__id")
      .agg(round(sqrt(sum(col("__w") * col("__w")).cast("double")), 9)
        .as("__nrm"))
    val dots = weighted.as("a")
      .join(weighted.as("b"), col("a.__t") === col("b.__t") &&
        col("a.__id") =!= col("b.__id"))
      .groupBy(col("a.__id").as("id"), col("b.__id").as("neighbor"))
      .agg(sum(col("a.__w") * col("b.__w")).as("__dot"))
    val cos = round(col("__dot").cast("double") /
      (col("__na") * col("__nb")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(cos.desc, col("neighbor"))
    dots
      .join(norms.select(col("__id").as("id"), col("__nrm").as("__na")), "id")
      .join(norms.select(col("__id").as("neighbor"),
        col("__nrm").as("__nb")), "neighbor")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col("id"), col("neighbor"), cos.as("cosine"),
        col("__rk").cast("int").as("rank"))
  }

  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = docs
      .select(col(idCol), explode(toks(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("__n")))
    val score = round(col("tf").cast("double") *
      log(col("__n").cast("double") / col("df").cast("double")), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(score.desc, col("token"))
    tf.join(df, "token").crossJoin(n)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        round(score, 6).as("tfidf"))
  }
}
