package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes — in-engine probabilistic text classification
  * (the classic language-ID / domain-routing model), trained and applied
  * entirely as aggregations: no gradient loop, no driver-side model. The
  * companion to [[Classifier.trainLinearScores]] (discriminative) — this
  * is the generative one, and the per-class token tables ARE the model.
  *
  * Determinism contract (the [[graft.ops.InfoTheory]] ln-bridge):
  * every log term is ONE double expression `ln((n_tc + 1) / (tot_c + V))`
  * pinned `round(·, 9) → DECIMAL(18,9)` before summing, so per-document
  * score sums are exact, order-independent, and replayed bit-for-bit by
  * the DuckDB oracle. Ties in the argmax break to the lexicographically
  * smallest class.
  *
  * Scale shape: the model is vocab×classes rows (broadcastable); scoring
  * explodes each document's distinct tokens × the class list (a constant
  * factor) and runs one (doc, class) partial aggregate. Linear in corpus
  * tokens; no full-corpus shuffle beyond the token count aggregates —
  * exactly the 100 TB budget of any bag-of-words pass.
  */
object Bayes {

  /** Train on (`idCol`, `textCol`, `classCol`) and classify the same
    * corpus (self-classification — the training-diagnostics view; apply
    * to held-out rows by unioning them in with NULL class upstream).
    * Returns `(id, actual, pred, hit)`. */
  def classifySelf(df: DataFrame, idCol: String, textCol: String,
                   classCol: String): DataFrame = {
    val toks = TextFunctions.tokens(lower(trim(col(textCol))))
    val base = df.select(col(idCol).as("__id"), col(classCol).as("__cls"),
      toks.as("__toks"))
    val tok = base.select(col("__id"), col("__cls"),
      explode(col("__toks")).as("__t"))

    // model: per-(class, token) counts, per-class totals, vocab size,
    // document priors — all metadata-scale frames (vocab × classes)
    val tokClass = tok.groupBy(col("__cls"), col("__t"))
      .agg(count(lit(1)).as("__ntc"))
    val classTot = tok.groupBy(col("__cls")).agg(count(lit(1)).as("__totc"))
    val vocab = tok.agg(count_distinct(col("__t")).as("__V"))
    val nDocs = base.agg(count(lit(1)).as("__N"))
    val priors = base.groupBy(col("__cls"))
      .agg(count(lit(1)).as("__ndc"))
      .crossJoin(broadcast(nDocs))
      .join(classTot, "__cls")
      .crossJoin(broadcast(vocab))
      .select(col("__cls"), col("__totc"), col("__V"),
        round(log(col("__ndc").cast("double") / col("__N")), 9)
          .cast("decimal(18,9)").as("__prior"))

    // score: per-document distinct-token counts × every class; unseen
    // (token, class) falls back to the Laplace floor ln(1/(totc+V))
    val docTok = tok.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__cdt"))
    val grid = docTok.crossJoin(broadcast(priors.select(col("__cls"),
        col("__totc"), col("__V"))))
      .join(tokClass, Seq("__cls", "__t"), "left")
      .select(col("__id"), col("__cls"),
        (col("__cdt").cast("decimal(12,0)") *
          round(log((coalesce(col("__ntc"), lit(0L)) + lit(1)).cast("double") /
            (col("__totc") + col("__V")).cast("double")), 9)
            .cast("decimal(18,9)")).as("__term"))
    val scores = grid.groupBy(col("__id"), col("__cls"))
      .agg(sum(col("__term")).as("__like"))
      .join(priors.select(col("__cls"), col("__prior")), "__cls")
      .select(col("__id"), col("__cls"),
        (col("__like") + col("__prior")).as("__score"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__score").desc, col("__cls").asc)
    val pred = scores
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__cls").as("pred"))
    base.select(col("__id"), col("__cls").as("actual"))
      .join(pred, "__id")
      .select(col("__id").as("id"), col("actual"), col("pred"),
        when(col("actual") === col("pred"), 1L).otherwise(0L).as("hit"))
  }
}
