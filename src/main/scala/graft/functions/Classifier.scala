package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model training: a linear classifier over hashed bag-of-words
  * features (the fastText-style quality/domain filter pattern — reference
  * provider/offline.go's transformation surface has no training op; this is
  * part of the LLM-pipeline extension), trained by FULL-BATCH gradient
  * descent on the least-squares objective — so the trained model, not just
  * its application, is reproducible anywhere.
  *
  * Determinism contract (the [[Vectors.kmeansAssign]] discipline applied to
  * model training):
  *  - features: md5-bucketed token counts (`Md5Long % dim`, ≡ DuckDB
  *    `md5_number_lower % 2^63 % dim`) + an intercept — all integers, held
  *    in a FIXED-ORDER float vector;
  *  - prediction: [[expressions.VectorExprs.MatVec]] sequential double fold
  *    ≡ `list_dot_product` on the same order;
  *  - gradient: per-(doc, component) terms quantized to
  *    `floor(err·x·2²⁰ + 0.5)` BIGINTs before summing — the sum is
  *    ORDER-INDEPENDENT where a double sum would depend on the partial-agg
  *    tree, so any partitioning (and the DuckDB oracle) produces the same
  *    model bit-for-bit;
  *  - update: `w − lr·((Σ/2²⁰)/n)` with lr an exact binary fraction.
  *
  * Scale: each round is ONE scan of the cached feature table plus a
  * (docs × (dim+1)) → (dim+1) map-side-combined shuffle and a
  * (dim+1)-row driver collect (the model — metadata by definition).
  * Batch GD over a 100 TB corpus is exactly this shape; rounds are the
  * only sequential dimension. Gradient-term magnitude: |err·x|·2²⁰ stays
  * < 2²⁷ for bounded err and token counts, so the BIGINT sum holds past
  * 10¹⁰ documents.
  */
object Classifier {

  /** Train `iters` rounds on (`textCol`, binary `labelCol`) and score every
    * row with the final model: (idCol, label, score). `lr` must be an
    * exact binary fraction (default 2⁻¹⁰) — stability wants
    * lr < 2/λmax(XᵀX/n), which for ~100-token docs in 32 buckets sits
    * around 2⁻⁸. */
  def trainLinearScores(df: DataFrame, idCol: String, textCol: String,
                        labelCol: Column, dim: Int = 32, iters: Int = 3,
                        lr: Double = 1.0 / 1024): DataFrame = {
    require(dim > 0 && iters >= 0, "dim > 0, iters >= 0")
    val toks = TextFunctions.tokens(lower(trim(col(textCol))))
    val base = df.select(col(idCol).as("__id"), toks.as("__toks"),
      labelCol.cast("double").as("__y"))
    val bucket = (expressions.Md5Long(col("__tok"))
      .bitwiseAND(lit(Long.MaxValue)) % dim).cast("int")
    val counts = base
      .select(col("__id"), explode(col("__toks")).as("__tok"))
      .groupBy(col("__id"), bucket.as("__j")).agg(count(lit(1)).as("__c"))
      .groupBy(col("__id"))
      .agg(map_from_entries(collect_list(struct(col("__j"), col("__c"))))
        .as("__m"))
    // fixed-order feature vector: dim hashed counts then the intercept
    val x = concat(
      transform(sequence(lit(0), lit(dim - 1)),
        j => coalesce(element_at(col("__m"), j), lit(0L)).cast("float")),
      array(lit(1.0f)))
    val feats = Dedup.barrier(
      base.join(counts, Seq("__id"), "left_outer")
        .select(col("__id"), col("__y"), x.as("__x")),
      checkpoint = false)
    val n = feats.count()

    def predWith(w: Array[Double]): Column =
      element_at(
        expressions.VectorExprs.matVec(col("__x"), Array(w.clone())), 1)

    var w = Array.fill(dim + 1)(0.0)
    for (_ <- 1 to iters) {
      val err = (predWith(w) - col("__y")).as("__err")
      val grads = feats
        .select(err, posexplode(col("__x")).as(Seq("__j", "__xv")))
        .groupBy(col("__j"))
        .agg(sum(floor(col("__err") * col("__xv").cast("double") * 1048576.0
          + 0.5).cast("long")).as("__sx"))
        .collect()
      val next = w.clone()
      grads.foreach { r =>
        val j = r.getInt(0)
        next(j) = w(j) - lr * ((r.getLong(1).toDouble / 1048576.0) / n)
      }
      w = next
    }
    feats.select(col("__id").as(idCol), col("__y").cast("long").as("label"),
      round(predWith(w), 6).as("score"))
  }

  /** Platt scaling — fit the logistic calibration `p = σ(a·s + b)` of an
    * existing score against binary labels by full-batch gradient descent
    * on the log-loss (Platt 1999), completing the calibration trio beside
    * isotonic (shape-free, step output) and reliability bins
    * (diagnostic): Platt gives the smooth two-parameter curve a serving
    * layer can apply as one fused expression.
    *
    * Same determinism contract as [[trainLinearScores]]: per-row gradient
    * terms are quantized `floor(g·2²⁰ + 0.5)` BIGINTs before summing
    * (order-independent under any partitioning, replayable in SQL), the
    * (a, b) updates are driver arithmetic over those exact sums, and the
    * reported log-loss pins each row's term round(·,9)→DECIMAL before
    * the exact sum. Each round is ONE scan + a 2-cell aggregate — model
    * state is two doubles, metadata by definition.
    *
    * Returns one row `(n, a, b, avg_logloss)`. */
  def plattScale(df: DataFrame, score: Column, label: Column,
                 iters: Int = 5, lr: Double = 0.5): DataFrame = {
    require(iters >= 0, "iters >= 0")
    val base = Dedup.barrier(
      df.select(score.cast("double").as("__s"),
        label.cast("double").as("__y")), checkpoint = false)
    val n = base.count()
    var a = 0.0
    var b = 0.0
    // empty-input robustness: no rows → gradient sums are NULL; keep the
    // zero model and emit the (empty-aggregate) report row
    for (_ <- 1 to (if (n == 0) 0 else iters)) {
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("__s") + lit(b))))
      val g = base.agg(
        sum(floor((p - col("__y")) * col("__s") * 1048576.0 + 0.5)
          .cast("long")).as("__ga"),
        sum(floor((p - col("__y")) * 1048576.0 + 0.5)
          .cast("long")).as("__gb")).collect()(0)
      a = a - lr * ((g.getLong(0).toDouble / 1048576.0) / n)
      b = b - lr * ((g.getLong(1).toDouble / 1048576.0) / n)
    }
    val p = lit(1.0) / (lit(1.0) + exp(-(lit(a) * col("__s") + lit(b))))
    base
      .select(round(-(col("__y") * log(p) +
        (lit(1.0) - col("__y")) * log(lit(1.0) - p)), 9)
        .cast("decimal(18,9)").as("__ll"))
      .agg(count(lit(1)).as("n"), sum(col("__ll")).as("__sll"))
      .select(col("n"), round(lit(a), 6).as("a"), round(lit(b), 6).as("b"),
        round(col("__sll").cast("double") / col("n"), 6).as("avg_logloss"))
  }
}
