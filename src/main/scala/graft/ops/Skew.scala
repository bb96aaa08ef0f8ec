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
}
