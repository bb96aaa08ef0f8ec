package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match point rows to the intervals that contain
  * them. The reference's analytics surface reaches this shape through its
  * PIT/as-of machinery plus ad-hoc SQL (provider/offline_store_spark_runner
  * .py exposes raw SQL transformations, no dedicated range operator); here it
  * is a first-class operator because Spark itself plans a pure inequality
  * join as BroadcastNestedLoopJoin — O(points × intervals) work however
  * selective the predicate is.
  *
  * Scale design — the classic bucketized interval join:
  *  - pick a bucket width W (ideally ≈ the typical interval length);
  *  - each interval explodes to the buckets it overlaps
  *    (len/W + 1 rows — bounded fan-out, known up front);
  *  - each point maps to exactly ONE bucket;
  *  - equi-join on the bucket id (hash shuffle, AQE-skew-splittable,
  *    never a nested loop), then apply the exact range predicate.
  *
  * Because a point belongs to a single bucket, every matching
  * (point, interval) pair meets in exactly one bucket: the join needs NO
  * post-dedup, so the only shuffle is the equi-join itself. Cost is
  * O(points + intervals·fanout) shuffled rows plus the true match count —
  * at 100 TB the bucket key distributes uniformly when event time does; a
  * time-skewed corpus concentrates buckets exactly where the matches are,
  * which AQE's skew-join split handles because this IS a plain equi-join.
  */
object RangeJoin {

  /** Keyless interval containment: rows of `points` joined to every row of
    * `intervals` whose [startCol, endCol) half-open window contains
    * `tsCol`. All columns of both inputs survive (name collisions are the
    * caller's to resolve). `bucketMicros` is the bucket width in
    * microseconds (timestamps compare at Spark's micros precision).
    */
  def pointsInIntervals(points: DataFrame, tsCol: String,
                        intervals: DataFrame, startCol: String, endCol: String,
                        bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucket width must be positive")
    val w = lit(bucketMicros)
    // exact floor division on longs: pmod is non-negative, so the numerator
    // is the largest multiple of w <= micros and integral `div` is exact —
    // no double rounding at any timestamp magnitude
    def bkt(micros: Column): Column =
      call_function("div", micros - pmod(micros, w), w)
    val pts = points.withColumn("__bkt", bkt(unix_micros(col(tsCol))))
    // Degenerate/inverted intervals (end <= start) match nothing under the
    // half-open predicate, but sequence(hi, lo) would DESCEND — a badly
    // inverted interval explodes into a huge bucket array. Drop them first.
    // end is exclusive: a window ending exactly on a bucket boundary does
    // not reach into that bucket, hence the -1 on the last covered bucket
    val ivs = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__bkt",
        explode(sequence(
          bkt(unix_micros(col(startCol))),
          bkt(unix_micros(col(endCol)) - 1))))
    pts.join(ivs, Seq("__bkt"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bkt")
  }

  /** Keyed variant: an equality key plus the range predicate. Spark plans
    * this as a sort-merge join on the key with the range as join condition —
    * already the right shape (no nested loop), so no bucketing is needed;
    * exposed for symmetry and so callers don't hand-build the condition.
    */
  def pointsInIntervalsKeyed(points: DataFrame, tsCol: String, key: String,
                             intervals: DataFrame, startCol: String,
                             endCol: String): DataFrame = {
    val ivs = intervals.withColumnRenamed(key, "__k")
    points.join(ivs,
        col(key) === col("__k") &&
          col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__k")
  }
}
