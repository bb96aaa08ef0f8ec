package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-mix primitive: keep
  * each stratum (language, quality bucket, source domain, …) at its own
  * rate, reproducibly, with no RNG state and no shuffle.
  *
  * A row is kept iff the first 8 hex chars of `md5(id || '|' || seed)`
  * fall below the stratum's threshold `floor(rate * 2^32)` — the same
  * portable hash-prefix gate the X2 train/test split uses, so any engine
  * (and the DuckDB oracle) reproduces the exact row set. Changing the seed
  * draws an independent sample; rates are inlined as literals (a
  * when-chain over the stratum column), so the filter runs in the scan
  * projection — at 100 TB this is a pushdown-adjacent scan filter with
  * zero exchange, and the sampled fraction is all that leaves the scan.
  */
object Sampling {

  /** 8-hex-digit keep threshold for a rate in [0, 1]. */
  def hexThreshold(rate: Double): String =
    f"${math.min(math.max((rate * 4294967296.0).toLong, 0L), 4294967295L)}%08x"

  /** Keep-predicate column: md5-prefix of (id, seed) under the stratum's
    * threshold. */
  def keep(idCol: Column, stratumCol: Column, rates: Map[String, Double],
           defaultRate: Double, seed: String): Column = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(stratumCol === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    substring(md5(concat_ws("|", idCol.cast("string"), lit(seed))), 1, 8) < threshold
  }

  /** The sampled frame: rows of `df` kept at their stratum's rate. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       seed: String): DataFrame =
    df.where(keep(col(idCol), col(stratumCol), rates, defaultRate, seed))

  /** Deterministic weighted sampling WITHOUT replacement
    * (Efraimidis–Spirakis A-ES): item i survives with probability
    * proportional to `weight`, via the exponential sort key
    * `e_i = -ln(u_i)/w_i` with `u_i` a deterministic md5 uniform — the
    * k smallest keys ARE the weighted sample. No RNG state, reproducible
    * in any engine.
    *
    * Float discipline: `u_i = (md5₆₃(id|seed) + 1) / 2⁶³` (never 0, so ln
    * is finite) and the key is ONE double expression rounded to 9 dp; the
    * ORDER is on the rounded key with the id tie-break, the
    * pmi_collocations convention. Scale shape: the key is scan-stage
    * arithmetic; selection is a TakeOrderedAndProject top-k (per-partition
    * heaps, no global sort). Weights must be > 0 (filtered). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int, seed: String): DataFrame = {
    val u = (expressions.Md5Long(
        concat_ws("|", col(idCol).cast("string"), lit(seed)))
      .bitwiseAND(lit(Long.MaxValue)).cast("double") + 1.0) /
      lit(9.223372036854776e18)
    val key = round(-log(u) / weightCol.cast("double"), 9)
    df.where(weightCol.cast("double") > 0)
      .withColumn("es_key", key)
      .orderBy(col("es_key"), col(idCol))
      .limit(k)
  }

  /** Deterministic NEGATIVE sampling — the recommender-training primitive:
    * for every user, `k` items they did NOT interact with, drawn from a
    * dense item-id space [0, nItems). No RNG state: candidate slot `s` of
    * user `u` maps to item `md5(u|s|seed) % nItems`, so the sample is
    * reproducible in any engine (the md5 bridge).
    *
    * Drawing k·oversample slots, deduping, anti-joining the positives, and
    * ranking by slot keeps the first k survivors — a user interacting with
    * nearly everything can come up short (reported honestly, not padded;
    * raise `oversample` for dense users). Scale shape: candidates are
    * |users|·k·oversample rows built scan-stage from the user list (no
    * cross join with the item table — the item space is arithmetic); one
    * anti-join on (user, item) against the positives; the per-user window
    * ranks ≤ k·oversample rows. */
  def negativeSample(interactions: DataFrame, userCol: String,
                     itemCol: String, nItems: Long, k: Int,
                     seed: String, oversample: Int = 3): DataFrame = {
    require(nItems > 0 && k > 0 && oversample >= 1, "bad sampling params")
    val users = interactions.select(col(userCol).as("user")).distinct()
    val cand = users
      .select(col("user"),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("slot"))
      .withColumn("item",
        pmod(expressions.Md5Long(concat_ws("|", col("user").cast("string"),
            col("slot").cast("string"), lit(seed)))
          .bitwiseAND(lit(Long.MaxValue)), lit(nItems)))
      // two slots can hash to the same item: keep the LOWEST slot so the
      // final rank order is well-defined
      .groupBy(col("user"), col("item"))
      .agg(min(col("slot")).as("slot"))
    val pos = interactions.select(col(userCol).as("user"),
      col(itemCol).cast("long").as("item")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user")).orderBy(col("slot"))
    cand.join(pos, Seq("user", "item"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("user"), col("item"), col("rank").cast("long").as("rank"))
  }
}
