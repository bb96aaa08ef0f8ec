package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X1/X2: train/test split. The reference's ClickHouse implementation splits
  * by `row_number OVER (ORDER BY cityHash64(concat(_row, seed)))`
  * (provider/clickhouse.go:1278-1346) — a deterministic hash split. We keep
  * the deterministic-hash design (reproducible across runs AND engines, unlike
  * `randomSplit`) but make it purely local: a row is a test row iff the first
  * 8 hex chars of `md5(key || seed)` fall below `testSize` of the hash space.
  * No shuffle, no global ordering — evaluated in the scan projection, so it
  * scales embarrassingly.
  */
object Split {

  /** Hex threshold string such that P(md5 8-hex prefix <= t) ≈ testSize. */
  def hexThreshold(testSize: Double): String = {
    require(testSize >= 0 && testSize <= 1, s"testSize $testSize out of [0,1]")
    val cut = math.min((testSize * 4294967296.0).toLong, 4294967295L)
    f"$cut%08x"
  }

  def isTestCol(keys: Seq[Column], seed: Long, testSize: Double): Column = {
    val h = md5(concat_ws("|", (keys :+ lit(seed.toString)): _*))
    (substring(h, 1, 8) < lit(hexThreshold(testSize))).cast("int")
  }

  /** Adds `is_test` ∈ {0,1}. `keyCols` must (jointly) identify a row's split
    * fate — typically the entity + ts of a training-set row. */
  def withSplit(df: DataFrame, keyCols: Seq[String], testSize: Double,
                seed: Long): DataFrame =
    df.withColumn("is_test", isTestCol(keyCols.map(col), seed, testSize))

  def train(df: DataFrame, keyCols: Seq[String], testSize: Double, seed: Long): DataFrame =
    withSplit(df, keyCols, testSize, seed).filter(col("is_test") === 0).drop("is_test")

  def test(df: DataFrame, keyCols: Seq[String], testSize: Double, seed: Long): DataFrame =
    withSplit(df, keyCols, testSize, seed).filter(col("is_test") === 1).drop("is_test")
}
