package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual skew mitigation for joins whose hot keys overwhelm a partition.
  * AQE's skew-join split (on by default) covers sort-merge joins at runtime;
  * this utility is the explicit salting form for when the plan must be pinned
  * (e.g. writing bucketed output, or broadcast-threshold edge cases).
  *
  * The large side gets a per-row salt in [0, buckets); the small side is
  * replicated `buckets`×; the join key becomes (key, salt), splitting each
  * hot key across `buckets` partitions. Row-level salt assignment uses the
  * row's own content hash (xxhash64 over all columns) — deterministic, no
  * RNG state, uniform for distinct rows; exact duplicates land in one bucket,
  * which only matters if duplicates themselves are the skew.
  */
object Skew {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col): _*), lit(buckets)).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Bloom-prefiltered inner join — when the small side is selective
    * (most big-side rows have no partner), its key set collapses to a
    * fixed-size Bloom filter and the big side is pre-filtered IN THE
    * SCAN STAGE before anything shuffles: at 100 TB the shuffle carries
    * only probable matches (~1.3 bytes/key of filter for a 0.25% FP
    * rate) instead of the whole fact table — the explicit form of the
    * runtime row-level-filtering Spark can only sometimes inject itself.
    *
    * Correctness is unconditional: Bloom false positives pass the
    * pre-filter but are dropped by the real join, so the result is
    * row-identical to the plain join (the one-sided-error contract of
    * [[graft.functions.Decontam.contaminatedBloom]], applied to joins).
    * The filter rides as a task-serialized reference object —
    * [[graft.functions.expressions.BloomHits]] keeps whole-stage
    * codegen. */
  /** Statistics-driven join-strategy advisor — the explicit, auditable
    * form of the decision a cost-based optimizer makes blind: measure,
    * then pick. Small side under `maxBroadcastRows` → broadcast hash
    * join (zero big-side shuffle); otherwise ONE key-histogram aggregate
    * of the big side decides between [[saltedJoin]] (top key carries
    * more than `skewFactor`× the mean frequency — the exact integer
    * comparison `max·k > skewFactor·n`, no float means) and the plain
    * shuffle join. Returns the joined frame and the chosen strategy
    * (pin it in reports — regressions in data shape surface as strategy
    * flips long before they surface as timeouts).
    *
    * The stats pass costs one keys-sized partial aggregate (the
    * skew_report shape) — at 100 TB that is the cheap insurance against
    * the quadratic hot-key join it prevents. */
  def adaptiveJoin(big: org.apache.spark.sql.DataFrame,
                   small: org.apache.spark.sql.DataFrame, key: String,
                   maxBroadcastRows: Long = 1000000L,
                   skewFactor: Long = 10L, saltBuckets: Int = 16)
      : (org.apache.spark.sql.DataFrame, String) = {
    val smallN = small.count()
    if (smallN <= maxBroadcastRows)
      (big.join(broadcast(small), Seq(key)), "broadcast")
    else {
      val h = big.groupBy(col(key)).agg(count(lit(1)).as("__c"))
        .agg(max(col("__c")).as("__mx"), sum(col("__c")).as("__n"),
          count(lit(1)).as("__k"))
        .collect()(0)
      // BigInt products: at 10^10-rows/key scale max*k and factor*n
      // overflow Long and would silently flip the strategy choice
      val skewed = !h.isNullAt(0) &&
        BigInt(h.getLong(0)) * BigInt(h.getLong(2)) >
          BigInt(skewFactor) * BigInt(h.getLong(1))
      if (skewed) (saltedJoin(big, small, key, saltBuckets), "salted")
      else (big.join(small, Seq(key)), "shuffle")
    }
  }

  def bloomPrefilteredJoin(big: org.apache.spark.sql.DataFrame,
                           small: org.apache.spark.sql.DataFrame,
                           key: String, numProbes: Int = 5,
                           mBits: Int = 1 << 20)
      : org.apache.spark.sql.DataFrame = {
    val filt = graft.functions.Decontam.bloomFilterKeys(
      small, col(key), numProbes, mBits)
    val pre = big.where(graft.functions.expressions.BloomHits(
      array(col(key).cast("string")),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(filt),
      numProbes, mBits) > 0)
    pre.join(small, Seq(key))
  }
}
