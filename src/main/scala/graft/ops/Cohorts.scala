package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the "of the users who first appeared in week W, how
  * many were active again k weeks later" matrix, the standard
  * product-analytics companion to [[EventFunnel]]. Weeks are ISO
  * `date_trunc('week', …)` buckets (Monday start, identical in Spark and
  * DuckDB), so the offset is an exact integer `days/7` — no float time
  * arithmetic anywhere.
  *
  * Scale shape: one per-user MIN aggregate (the cohort assignment, one
  * user-keyed shuffle), one (user, week) DISTINCT (partial-agg collapses
  * each user-week to a row before the shuffle), one user-keyed join to
  * attach cohorts, and a (cohort, offset) rollup whose size is
  * weeks² — metadata-scale output regardless of corpus size. A hot user
  * contributes at most one row per week. */
object Cohorts {

  /** (cohort_ms, bucket_offset, n_users); offset 0 is the cohort's own
    * bucket, so `n_users` at offset 0 is the cohort size. `bucket` is
    * "week" or "day". */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                bucket: String = "week"): DataFrame = {
    val days = bucket match {
      case "week" => 7
      case "day"  => 1
      case other  => throw new IllegalArgumentException(
        s"bucket must be week or day, got $other")
    }
    val bk = date_trunc(bucket, col(tsCol))
    val cohorts = events
      .groupBy(col(userCol).as("__u"))
      .agg(min(bk).as("__cohort"))
    val active = events
      .select(col(userCol).as("__u"), bk.as("__bucket"))
      .distinct()
    active.join(cohorts, "__u")
      .groupBy(col("__cohort"),
        (datediff(col("__bucket"), col("__cohort")) / days)
          .cast("int").as("bucket_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(unix_millis(col("__cohort")).as("cohort_ms"),
        col("bucket_offset"), col("n_users"))
  }
}
