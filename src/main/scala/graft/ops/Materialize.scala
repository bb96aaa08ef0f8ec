package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.types.ResourceSchema

/** Latest-value materialization — the core "feature snapshot" operator
  * (reference M1-M5: provider/queries/materialize_ts.sql,
  * materialize_no_ts.sql, provider/sql.go:1816-1867,
  * offline_store_spark_runner.py:672-685).
  *
  * Scale notes: the window `partitionBy(entity)` shuffles once on the entity
  * key — the minimum possible for this semantics — and the row_number filter
  * is evaluated streaming per partition (no buffering beyond the sort). With
  * AQE on, skewed entities get split at the shuffle. The reference's
  * correlated `MAX(ts)` subquery (M1) would be a second shuffle; the window
  * form is strictly better and is what the reference itself uses on Spark (M5).
  */
object Materialize {

  val EpochZero: Column = to_timestamp(lit(0)) // CAST(0 AS TIMESTAMP), reference spark.go:120

  /** Project a wide source onto the canonical (entity, value, ts) triple
    * (reference ResourceSchema, provider/offline.go:916-922). Missing ts ⇒
    * epoch-0 constant (reference materialize_no_ts.sql, spark.go:120). */
  def toTriple(df: DataFrame, schema: ResourceSchema): DataFrame = {
    val ts = schema.ts.map(col).getOrElse(EpochZero)
    df.select(col(schema.entity).as("entity"), col(schema.value).as("value"),
      ts.as("ts"))
  }

  /** M1/M5: one row per entity — the latest by ts. The reference's SQL-store
    * variant dedups ties via rn=1 (provider/sql.go:1839-1843) but leaves the
    * tie order unspecified; we pin a deterministic tie-break (highest ts, then
    * highest value, then caller-supplied extras) so results are reproducible
    * and oracle-checkable. */
  def latest(df: DataFrame, entity: String, value: String, ts: Option[String],
             extraTieBreak: Seq[Column] = Nil): DataFrame = {
    ts match {
      case Some(t) =>
        val w = Window.partitionBy(col(entity))
          .orderBy((col(t).desc +: col(value).desc +: extraTieBreak.map(_.desc)): _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
      case None =>
        // M2: no timestamp — assume ~1 row/entity, enforce deterministically.
        val w = Window.partitionBy(col(entity))
          .orderBy((col(value).desc +: extraTieBreak.map(_.desc)): _*)
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
    }
  }

  /** Materialize a canonical triple to one row per entity. */
  def latestTriple(triple: DataFrame): DataFrame =
    latest(triple, "entity", "value", Some("ts"))

  /** K6: MERGE-upsert equivalent — fold a batch of new events into an
    * existing one-row-per-entity snapshot (reference Iceberg MERGE INTO,
    * offline_store_spark_runner.py:688-765; with no table-format jars here
    * the refreshed snapshot is written as a new version dir, which is the
    * same atomic-replace semantics). Unioning and re-reducing is one shuffle
    * on entity; entities untouched by `updates` keep their snapshot row. */
  def upsert(snapshot: DataFrame, updates: DataFrame): DataFrame =
    latestTriple(snapshot.select("entity", "value", "ts")
      .unionByName(updates.select("entity", "value", "ts")))

  /** Incremental ADDITIVE rollup maintenance — the aggregate-feature twin
    * of [[upsert]] (which keeps latest values): the maintained table holds
    * per-entity partial aggregates `(entity, n, sum, min_v, max_v)`, and a
    * new batch folds in as a MERGE of partials — count/sum add, min/max
    * combine — never a recompute over history. This is the windowless
    * "lifetime aggregate feature" pattern (Feast-style count/sum
    * features): refresh cost is O(batch + touched entities), and the
    * result provably equals the full recompute (the driver query's
    * oracle). Sums ride DECIMAL for exactness. */
  def rollupIncrement(state: DataFrame, batch: DataFrame): DataFrame = {
    val b = rollupOf(batch)
    state.unionByName(b)
      .groupBy(col("entity"))
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** The per-entity partial-aggregate shape [[rollupIncrement]] maintains,
    * computed from raw (entity, value) rows. */
  def rollupOf(rows: DataFrame): DataFrame =
    rows.groupBy(col("entity"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_v"),
        min(col("value").cast("decimal(18,2)")).as("min_v"),
        max(col("value").cast("decimal(18,2)")).as("max_v"))

  /** K6 with schema evolution — the multi-feature online table. The reference
    * evolves the wide feature table with `ALTER TABLE ADD COLUMNS` per new
    * feature and MERGEs each feature's updates into its column
    * (offline_store_spark_runner.py:688-765). Re-expressed relationally:
    * the wide table is the pivot of per-(entity, feature) latest triples, so
    * an upsert = melt the snapshot, union the update triples, re-reduce,
    * re-pivot — features present only in the updates become new columns (the
    * ALTER ADD analog), entities/features untouched keep their cells.
    *
    * Wide layout: (entity, f, f__ts, g, g__ts, ...) — per-feature value +
    * timestamp, column order = sorted feature names (deterministic schema).
    *
    * Scale: two entity-keyed shuffles ((entity, feature) reduce, entity
    * pivot) over |snapshot|+|updates| rows, never the full history; the
    * feature-name list is metadata-scale (a distinct-collect, exactly what
    * the reference's schema inspection does).
    */
  def wideSnapshot(triples: DataFrame, features: Seq[String]): DataFrame = {
    val latest = {
      val w = Window.partitionBy(col("entity"), col("feature"))
        .orderBy(col("ts").desc, col("value").desc)
      triples.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val aggs = features.sorted.flatMap { f =>
      Seq(max(when(col("feature") === f, col("value"))).as(f),
        max(when(col("feature") === f, col("ts"))).as(s"${f}__ts"))
    }
    latest.groupBy(col("entity")).agg(aggs.head, aggs.tail: _*)
  }

  /** Inverse of [[wideSnapshot]]: wide → (entity, feature, value, ts)
    * triples; features are inferred from the `<name>__ts` column pairs. */
  def meltWide(wide: DataFrame): DataFrame = {
    val feats = wide.columns.filter(_.endsWith("__ts")).map(_.dropRight(4)).sorted
    val stackExpr = feats.map(f => s"'$f', `$f`, `${f}__ts`").mkString(", ")
    wide.selectExpr("entity",
        s"stack(${feats.length}, $stackExpr) AS (feature, value, ts)")
      .where(col("value").isNotNull)
  }

  /** Fold per-feature update triples (entity, feature, value, ts) into a wide
    * snapshot, adding columns for features never seen before. */
  def upsertWide(wide: DataFrame, updates: DataFrame): DataFrame = {
    val known = wide.columns.filter(_.endsWith("__ts")).map(_.dropRight(4)).toSet
    // metadata-scale collect: the distinct feature-name list (≡ reference
    // schema inspection before ALTER ADD COLUMNS)
    val incoming = updates.select("feature").distinct().collect().map(_.getString(0))
    val allFeats = (known ++ incoming).toSeq.sorted
    wideSnapshot(meltWide(wide).unionByName(updates.select("entity", "feature", "value", "ts")),
      allFeats)
  }

  /** M3/S11: chunk addressing for parallel export.
    *
    * Exact reference semantics (global contiguous row_number —
    * provider/sql.go:1821-1843) require a total order: fine for export of a
    * materialization that fits a single downstream consumer, but the global
    * window collapses to one partition. The scale path is hash chunking:
    * deterministic, shuffle-free (computed in the scan projection), and every
    * chunk is independently addressable — which is all the reference's chunked
    * online-store copy (runner/materialize.go:101-230) actually needs.
    */
  def withHashChunk(df: DataFrame, entity: String, nChunks: Int): DataFrame =
    df.withColumn("chunk_id", pmod(xxhash64(col(entity)), lit(nChunks)))

  /** Reference-exact global row numbering (small/medium exports only —
    * the empty-partition window collapses to one task). */
  def withGlobalRowNumber(df: DataFrame, orderBy: Seq[Column]): DataFrame =
    df.withColumn("row_number", row_number().over(Window.orderBy(orderBy: _*)))

  /** Distributed global row numbering — the scale path for M3 chunk
    * addressing. `repartitionByRange` gives a total order across partitions
    * (range exchange, fully parallel), `sortWithinPartitions` orders inside,
    * and a zipWithIndex-style two-pass (per-partition counts → offsets)
    * assigns contiguous 1-based ids with no single-partition stage. Ties in
    * `orderCols` get an arbitrary-but-stable order within equal keys (make
    * the ordering total for full determinism). */
  def withDistributedRowNumber(df: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema
    // .copy(): toRdd yields buffer-reused UnsafeRows
    val rdd = sorted.queryExecution.toRdd.map(_.copy()).zipWithIndex()
      .map { case (row, idx) =>
        val out = new Array[Any](schema.length + 1)
        var i = 0
        while (i < schema.length) { out(i) = row.get(i, schema(i).dataType); i += 1 }
        out(schema.length) = idx + 1
        org.apache.spark.sql.catalyst.InternalRow.fromSeq(out.toIndexedSeq)
      }
    val outSchema = schema.add("row_number", org.apache.spark.sql.types.LongType,
      nullable = false)
    org.apache.spark.sql.graft.ColumnBridge.internalCreateDataFrame(
      df.sparkSession, rdd, outSchema)
  }

  def chunkSlice(numbered: DataFrame, lo: Long, hi: Long): DataFrame =
    numbered.where(col("row_number") > lo && col("row_number") <= hi)
}
