package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column profiling — the stats a catalog shows next to every registered
  * source (the reference's dashboard source-stats role, metadata/search):
  * per column, row/null/distinct counts and min/max. One output row per
  * column: `(column, n_rows, n_null, n_distinct, min_value, max_value)`.
  *
  * Everything is computed in a single pass: one `agg` with all counters;
  * Catalyst plans the multi-column `count(DISTINCT ...)` via Expand (rows ×
  * profiled columns before partial aggregation) — exact NDV, the right
  * choice under a correctness gate. At 100 TB swap `countDistinct` for
  * `approx_count_distinct` (HLL, one pass, no Expand) — noted here because
  * exact NDV is the only part of this plan that doesn't scale linearly.
  *
  * min/max are rendered as strings so heterogeneous columns share one
  * schema; numeric columns should be cast to DECIMAL by the caller first —
  * decimal-to-string is format-stable across engines, double-to-string is
  * not. */
object Profile {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // unpivot the single wide row into one row per column
    // "col_name", not "column" — COLUMN is a reserved word in ANSI engines
    // and the oracle runs this schema through DuckDB verbatim
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
