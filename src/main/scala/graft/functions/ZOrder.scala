package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two scan
  * dimensions so ONE sort key clusters BOTH — range-partition + sort by the
  * z-value and a parquet scan filtered on either dimension (or a 2-D box)
  * skips most row groups on min/max stats, the Databricks `ZORDER BY` /
  * Iceberg sort-order role for multi-dimensional pruning.
  *
  * The curve is `z(a,b) = spread(a) | spread(b) << 1` with `spread`
  * inserting a 0 between consecutive bits. Since the two operands occupy
  * disjoint bit positions, `z = spread(a) + 2·spread(b)` and spread is
  * strictly monotone — so `z` is monotone in EACH coordinate and a box
  * `[alo,ahi]×[blo,bhi]` maps to the valid pre-filter
  * `z BETWEEN z(alo,blo) AND z(ahi,bhi)` (a superset: the exact box
  * predicate still applies after the pruned scan).
  *
  * Everything is integer bit arithmetic — identical in any engine, codegen
  * inside the scan projection, zero shuffle to compute; the write's
  * range-repartition is the one (intentional, layout-producing) shuffle. */
object ZOrder {

  /** Bit-interleaved z-value of two non-negative columns, `bits` low bits
    * each (values must fit in `bits` bits for the box pre-filter bound to
    * hold). a occupies even positions, b odd. */
  def zValue2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Reference implementation (driver-side) — box pre-filter bounds and
    * the spec's ground truth. */
  def zValue2Long(a: Long, b: Long, bits: Int): Long = {
    require(a >= 0 && b >= 0 && (a >> bits) == 0 && (b >> bits) == 0,
      s"values must fit in $bits bits")
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Write `df` z-ordered on (`aCol`, `bCol`): compute the z-value, range
    * partition on it (`numFiles` output files ≈ z-contiguous tiles), sort
    * within partitions, write parquet with the `zkey` column retained so
    * readers can push z-range pre-filters onto row-group stats. */
  def writeZOrdered(df: DataFrame, aCol: Column, bCol: Column, bits: Int,
                    numFiles: Int, path: String): Unit =
    df.withColumn("zkey", zValue2(aCol, bCol, bits))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(path)

  /** Read back a 2-D box from a z-ordered table: the z-range pre-filter
    * (pushed to parquet min/max stats — row groups outside the curve
    * segment never decompress) plus the exact box predicate. */
  def readBox(spark: org.apache.spark.sql.SparkSession, path: String,
              aCol: String, bCol: String, bits: Int,
              aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val zLo = zValue2Long(aLo, bLo, bits)
    val zHi = zValue2Long(aHi, bHi, bits)
    spark.read.parquet(path)
      .where(col("zkey") >= zLo && col("zkey") <= zHi)
      .where(col(aCol) >= aLo && col(aCol) <= aHi &&
        col(bCol) >= bLo && col(bCol) <= bHi)
  }
}
