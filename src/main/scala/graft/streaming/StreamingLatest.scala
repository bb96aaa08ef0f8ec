package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming feature upkeep (reference §1.4: Kafka `PrimaryData` topics +
  * `ComputationMode.STREAMING` features, metadata.proto:228-232, 651-653;
  * runner consumer offline_store_spark_runner.py:385-407).
  *
  * This environment ships no Kafka connector jars, so the source here is the
  * file stream (`readStream.parquet` — drop-in `format("kafka")` + `from_json`
  * when the connector is on the classpath; the operator graph below is
  * identical either way). Semantics:
  *
  *  - `latestValueStream`: stateful latest-(value, ts) per entity via
  *    `flatMapGroupsWithState` — the streaming equivalent of the M1/M5
  *    materialization window, emitting an update row only when an entity's
  *    latest value actually changes (Update output mode → online-store MERGE,
  *    reference K6).
  *  - `windowedCounts`: watermarked sliding-window aggregation — the standard
  *    late-data-bounded state shape.
  *
  * Scale: state is one row per entity (the snapshot), partitioned by the
  *  group key — the same entity-hash layout the batch materialization
  *  shuffles to, so a 1000-executor cluster shards state linearly.
  */
object StreamingLatest {

  case class TripleRow(entity: Long, value: Double, ts: Timestamp)
  case class LatestState(value: Double, ts: Timestamp)

  val tripleSchema: StructType = StructType(Seq(
    StructField("entity", LongType), StructField("value", DoubleType),
    StructField("ts", TimestampType)))

  /** File-source stream of canonical (entity, value, ts) triples. */
  def readTripleStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(tripleSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Stateful latest-value per entity. Emits (entity, value, ts) whenever the
    * entity's latest row advances (ts strictly greater, or equal ts with
    * greater value — the batch tie-break, Materialize.latest). */
  def latestValueStream(spark: SparkSession, triples: DataFrame): Dataset[TripleRow] = {
    import spark.implicits._
    triples.as[TripleRow]
      .groupByKey(_.entity)
      .flatMapGroupsWithState[LatestState, TripleRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (entity: Long, rows: Iterator[TripleRow], state: GroupState[LatestState]) =>
          var cur = state.getOption
          rows.foreach { r =>
            val newer = cur.forall(c =>
              r.ts.after(c.ts) || (r.ts.equals(c.ts) && r.value > c.value))
            if (newer) cur = Some(LatestState(r.value, r.ts))
          }
          cur match {
            case Some(c) if state.getOption != cur =>
              state.update(c)
              Iterator.single(TripleRow(entity, c.value, c.ts))
            case _ => Iterator.empty
          }
      }
  }

  /** Watermarked sliding-window count/sum per entity. Late rows beyond the
    * watermark are dropped; state is bounded by (watermark ÷ slide) windows. */
  def windowedCounts(triples: DataFrame, windowDur: String = "10 minutes",
                     slideDur: String = "5 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    triples
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slideDur), col("entity"))
      .agg(count("*").as("n"), sum(col("value")).as("sum_value"))

  /** Incremental refresh for batch outputs (reference T5/S5 semantics without
    * Delta CDF: the versioned-dir scheme is append-only, so "new data since
    * last run" = version dirs lexicographically greater than the last
    * processed one). Returns (newDirs, unionDF). */
  def incrementalRead(spark: SparkSession, baseDir: String,
                      lastProcessed: Option[String]): (Seq[String], Option[DataFrame]) = {
    val fs = new org.apache.hadoop.fs.Path(baseDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(baseDir)
    if (!fs.exists(p)) (Nil, None)
    else {
      val dirs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.toUri.getPath)
        .filter(d => lastProcessed.forall(d > _)).sorted.toSeq
      if (dirs.isEmpty) (Nil, None)
      else (dirs, Some(spark.read.parquet(dirs: _*)))
    }
  }
}
