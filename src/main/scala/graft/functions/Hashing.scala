package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The hashing trick (feature hashing): unbounded categorical/token
  * domains → a FIXED-dimension signed count vector, no vocabulary table,
  * no fit step — the standard trick for streaming featurization of
  * high-cardinality fields (Weinberger et al. 2009). Collisions are
  * unbiased because each token also draws a ± sign from an independent
  * hash bit.
  *
  * Cross-engine exact: bucket = `md5_64(tok) & MaxLong % dim`, sign =
  * bit 0 of `md5_64(tok ⊕ "|s")` — both replayed by the DuckDB oracle's
  * `md5_number_lower` arithmetic. All counts are BIGINTs; no floats
  * anywhere.
  *
  * Scale: one (id, bucket) partial aggregate (map-side combined) then a
  * per-id assembly — the same budget as any bag-of-words pass; the
  * output vector is `dim` longs regardless of vocabulary size. */
object Hashing {

  /** `toks`: one row per (id, token) occurrence. Returns `(id, fvec)`
    * where `fvec` is a length-`dim` signed-count array. */
  def hashFeatures(toks: DataFrame, idCol: String, tokCol: String,
                   dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val h = expressions.Md5Long(col(tokCol)).bitwiseAND(lit(Long.MaxValue))
    val j = (h % dim).cast("int")
    val sign = when(expressions.Md5Long(concat(col(tokCol), lit("|s")))
      .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)
    toks
      .groupBy(col(idCol).as("id"), j.as("__j"))
      .agg(sum(sign).as("__c"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("__j"), col("__c"))))
        .as("__m"))
      .select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          jj => coalesce(element_at(col("__m"), jj), lit(0L))).as("fvec"))
  }
}
