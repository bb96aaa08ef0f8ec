package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.PrimaryData

/** File-source readers (reference S1/S2 —
  * offline_store_spark_runner.py:1036-1053). All reads are declarative
  * `spark.read` so Catalyst gets pushdown + pruning; `recursiveFileLookup`
  * mirrors the reference, `ignoreCorruptFiles` is NOT set by default (we want
  * hard failures, the reference's silent-skip is a data-loss footgun at 100 TB —
  * opt in via the options map if needed).
  */
object Readers {

  def readPrimary(spark: SparkSession, p: PrimaryData): DataFrame = p.format match {
    case "parquet" => parquet(spark, p.path)
    case "csv"     => csv(spark, p.path, header = p.csvHeader)
    case "json"    => spark.read.option("recursiveFileLookup", "true").json(p.path)
    case "orc"     => orc(spark, p.path)
    case other     => throw new IllegalArgumentException(s"unsupported format $other")
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(path)

  /** ORC scan — the other columnar lake format Spark reads natively
    * (vectorized, predicate pushdown); same recursive-dir convention. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").orc(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .option("recursiveFileLookup", "true")
      .csv(path)

  /** Convenience: read one of the harness tables from an sf directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Normalize a parquet timestamp column to session-TZ (UTC) micros
    * TIMESTAMP regardless of how the file encodes it:
    *  - INT64 NANOS (read as raw long under `nanosAsLong`): integer-divide
    *    to micros — the truncation DuckDB's `CAST(ts_ns AS TIMESTAMP)`
    *    applies;
    *  - micros TIMESTAMP_NTZ (plain parquet timestamp, NTZ inference on):
    *    cast — identity on the instant in a UTC session, matching DuckDB's
    *    epoch-UTC reading of naive parquet timestamps;
    *  - already TIMESTAMP: untouched. */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c,
          org.apache.spark.sql.functions.expr(s"timestamp_micros($c div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, org.apache.spark.sql.functions.col(c).cast("timestamp"))
      case _ => df
    }

  /** The harness `events` table with `ts` normalized via [[normalizeTs]].
    * Encoding-agnostic: testdata snapshots have shipped both nanos and
    * micros timestamps across rounds. */
  def eventsNormalized(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"), "ts")
  }
}
