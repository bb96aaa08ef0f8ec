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
}
