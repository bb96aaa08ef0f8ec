package graft.sources

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{DailyPartition, HashPartition, PartitionHint}

/** Versioned sinks. The reference writes every transformation run into a NEW
  * timestamped subdirectory (immutable versioned outputs —
  * offline_store_spark_runner.py:896-909) and resolves "latest" by
  * lexicographically-max dirname; we keep the identical scheme (no Delta jars
  * in this environment, and the scheme is format-agnostic + rename-atomic per
  * run directory).
  */
object Writers {

  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss-SSSSSS").withZone(ZoneOffset.UTC)

  def newVersion(): String = fmt.format(Instant.now())

  /** K1: parquet write into a fresh timestamped version dir; returns the dir. */
  def writeVersioned(df: DataFrame, baseDir: String,
                     partition: Option[PartitionHint] = None): String = {
    val out = s"$baseDir/${newVersion()}"
    // An EMPTY frame under partitionBy writes NO data files, leaving a
    // version directory whose read-back cannot infer a schema. Write the
    // empty frame flat instead (one schema-bearing empty part file) — the
    // empty-input robustness contract; the limit-1 probe is trivial next
    // to the write itself.
    if (df.isEmpty) {
      val flat = partition match {
        case Some(DailyPartition(col0)) =>
          df.withColumn("__date", date_format(col(col0), "yyyy-MM-dd"))
        case _ => df
      }
      flat.write.mode(SaveMode.ErrorIfExists).parquet(out)
      return out
    }
    val w = partition match {
      case Some(HashPartition(col0, buckets)) =>
        df.repartition(buckets, col(col0)).write
      case Some(DailyPartition(col0)) =>
        // K5: derive a date partition column, sort within partitions by ts
        // (offline_store_spark_runner.py:1064-1073). The repartition on the
        // partition key is load-bearing at scale: without it every task
        // writes one file per date it happens to hold — days × tasks tiny
        // files (measured 138 s vs ~8 s at sf0.1 locally; at 100 TB it's
        // millions of files and a dead name-node). One shuffle → one file
        // per date. Skewed days would get a salt column added to the
        // repartition key (Skew.saltedJoin pattern). The partition count is
        // passed EXPLICITLY: `repartition(col)` alone lets AQE coalesce a
        // small shuffle to a single task, which then opens every per-date
        // parquet writer serially (measured 6.9 s → 2.0 s for a 90-day
        // write); an explicit count pins the write parallelism and the
        // file-per-date layout is unchanged either way (a date hashes to
        // exactly one partition in both forms).
        val parts = df.sparkSession.sessionState.conf.numShufflePartitions
        df.withColumn("__date", date_format(col(col0), "yyyy-MM-dd"))
          .repartition(parts, col("__date"))
          .sortWithinPartitions(col(col0))
          .write.partitionBy("__date")
      case None => df.write
    }
    w.mode(SaveMode.ErrorIfExists).parquet(out)
    out
  }

  /** Latest committed version dir under baseDir (lexicographic max — the dir
    * names are zero-padded UTC timestamps so this is chronological). */
  def latestVersion(spark: SparkSession, baseDir: String): Option[String] = {
    val p = new Path(baseDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      // strip the fs scheme so returned paths match what writeVersioned returns
      val dirs = fs.listStatus(p).filter(_.isDirectory)
        .map(_.getPath.toUri.getPath)
      if (dirs.isEmpty) None else Some(dirs.max)
    }
  }

  def readLatest(spark: SparkSession, baseDir: String): DataFrame =
    latestVersion(spark, baseDir) match {
      case Some(dir) => spark.read.parquet(dir)
      case None => throw new IllegalStateException(s"no versions under $baseDir")
    }

  /** Bucketed table write — the co-located-join primitive at cluster scale:
    * two tables bucketed by the same key into the same bucket count join
    * with NO shuffle exchange (the bucket layout IS the hash partitioning,
    * persisted; Spark's FileSourceScanExec reports it as outputPartitioning).
    * Bucketing metadata only survives through the session catalog, so this
    * is a `saveAsTable` with an explicit path; read back via
    * `spark.table(name)`. sortCols pre-sorts within buckets (sort-merge
    * joins skip their sort too). */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
                    bucketCol: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Small-file compaction: rewrite the latest version of a versioned table
    * into `targetFiles` files as a NEW version (readers of old versions are
    * unaffected; readLatest flips atomically with the directory listing).
    * The incremental writers naturally accrete one file per micro-batch /
    * delta — at 100 TB uncompacted version dirs kill both the name-node and
    * scan planning, so this runs as periodic housekeeping (a TaskRunner
    * schedule). Pass the table's `partition` hint so compaction PRESERVES
    * the partitioned layout (a DailyPartition table compacted without it
    * would silently flatten into an unpartitioned dir and lose partition
    * pruning; the discovered `__date` column is dropped and re-derived so
    * it stays a partition directory, not a data column). Returns the new
    * version dir. */
  def compact(spark: SparkSession, baseDir: String, targetFiles: Int = 1,
              partition: Option[PartitionHint] = None): String = {
    val df0 = readLatest(spark, baseDir)
    partition match {
      case Some(_: DailyPartition) =>
        val df = if (df0.columns.contains("__date")) df0.drop("__date") else df0
        writeVersioned(df, baseDir, partition) // repartitions on __date inside
      case Some(_: HashPartition) =>
        writeVersioned(df0, baseDir, partition) // bucket count = file count
      case None =>
        writeVersioned(df0.repartition(targetFiles), baseDir)
    }
  }

  /** K2: CSV write with/without header. */
  def writeCsv(df: DataFrame, dir: String, header: Boolean = true): String = {
    val out = s"$dir/${newVersion()}"
    df.write.option("header", header.toString).mode(SaveMode.ErrorIfExists).csv(out)
    out
  }

  /** ORC write into a fresh version dir (zlib default) — the columnar
    * sibling of [[writeVersioned]] for ORC-reading consumers. */
  def writeOrc(df: DataFrame, dir: String): String = {
    val out = s"$dir/${newVersion()}"
    df.write.mode(SaveMode.ErrorIfExists).orc(out)
    out
  }

  /** T7: atomic replace — write to a new version then flip a LATEST pointer
    * file (single-file rename is atomic on HDFS-like stores; the reference's
    * temp-table + swap, provider/sql.go:2011-2031). */
  def atomicReplace(spark: SparkSession, df: DataFrame, baseDir: String): String = {
    val out = writeVersioned(df, baseDir)
    flipPointer(spark, baseDir, out)
    out
  }

  private def flipPointer(spark: SparkSession, baseDir: String,
                          target: String): Unit = {
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$baseDir/.LATEST.tmp")
    val ptr = new Path(s"$baseDir/LATEST")
    val os = fs.create(tmp, true)
    os.write(target.getBytes("UTF-8")); os.close()
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
  }

  /** Right-to-erasure for an immutable versioned table: write a NEW
    * version WITHOUT the rows matching `where` (the versioned analogue of
    * `DELETE WHERE`). Old versions still hold the data by design —
    * [[gcVersions]] is the half that physically drops them; run both for
    * an actual erasure obligation. Returns the new version dir.
    *
    * SQL DELETE semantics: only rows where the predicate is TRUE are
    * removed — a NULL predicate KEEPS the row (matching the Delta/Iceberg
    * `DELETE FROM ... WHERE` bindings; a bare `!where` would drop
    * NULL-predicate rows because NOT NULL filters as non-true).
    *
    * If the table is pointer-managed (a LATEST file from [[atomicReplace]]
    * exists), the pointer is flipped to the scrubbed version too —
    * otherwise pointer-following readers keep serving the unscrubbed
    * version and [[gcVersions]] pins it past retention. */
  def scrubLatest(spark: SparkSession, baseDir: String,
                  where: org.apache.spark.sql.Column): String = {
    val out = writeVersioned(
      readLatest(spark, baseDir).where(!coalesce(where, lit(false))), baseDir)
    val fs = new Path(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$baseDir/LATEST")))
      flipPointer(spark, baseDir, out)
    out
  }

  /** Version retention: physically delete all but the newest `keepLast`
    * version dirs (plus the LATEST pointer's target, if a pointer exists
    * and points older — a reader following the pointer must never 404).
    * The deletion order is oldest-first, so a concurrent reader that
    * already resolved a surviving dir is unaffected; one that resolved a
    * dying dir races exactly as it would with any retention policy.
    * Returns the deleted version names. */
  def gcVersions(spark: SparkSession, baseDir: String,
                 keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val p = new Path(baseDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val dirs = fs.listStatus(p).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
    val ptr = new Path(s"$baseDir/LATEST")
    val pinned: Set[String] =
      if (!fs.exists(ptr)) Set.empty
      else {
        val len = fs.getFileStatus(ptr).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(ptr)
        try in.readFully(0, buf) finally in.close()
        Set(new String(buf, "UTF-8").trim.split('/').last)
      }
    val doomed = dirs.dropRight(keepLast).filterNot(pinned)
    doomed.foreach(d => fs.delete(new Path(s"$baseDir/$d"), true))
    doomed
  }

  /** S5: row-level change feed between two committed versions — the
    * version-dir analogue of Delta's `table_changes()` / Iceberg's
    * changelog scan (reference offline_store_spark_runner.py:385-407 reads
    * CDF for incremental sources; the version-dir store derives it by
    * diffing): keyed full-outer join classifying each key as `insert`,
    * `delete`, or `update_postimage` (unchanged rows are dropped). Deletes
    * carry the pre-image values, everything else the post-image.
    *
    * Scale: one equi-join on the key — SMJ/shuffle-hash over the two
    * version scans, no window, no driver state; change detection is a
    * per-row hash of the non-key columns computed in the scan stage. */
  def versionDiff(spark: SparkSession, prevDir: String, curDir: String,
                  keyCol: String): DataFrame = {
    val prev = spark.read.parquet(prevDir)
    val cur = spark.read.parquet(curDir)
    require(prev.columns.sameElements(cur.columns),
      "versionDiff expects identical schemas; use mergeUpsertWide for evolution")
    val nonKey = prev.columns.filterNot(_ == keyCol).toSeq
    // NULLs become a sentinel BEFORE concat_ws (which would silently skip
    // them, making (null, x) and (x, null) hash identically)
    def rh(df: DataFrame, as: String) = df.withColumn(as,
      md5(concat_ws("\u0001",
        nonKey.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)))
    val p = rh(prev, "__rhp").select(
      col(keyCol).as("__k") +: col("__rhp") +:
        nonKey.map(c => col(c).as(s"__p_$c")): _*)
    val c = rh(cur, "__rhc")
    val joined = c.join(p, col(keyCol) === col("__k"), "full_outer")
    val changeType = when(col("__k").isNull, lit("insert"))
      .when(col(keyCol).isNull, lit("delete"))
      .when(col("__rhc") =!= col("__rhp"), lit("update_postimage"))
    joined.withColumn("change_type", changeType)
      .where(col("change_type").isNotNull)
      .select(coalesce(col(keyCol), col("__k")).as(keyCol) +:
        col("change_type") +:
        nonKey.map(cn => when(col("change_type") === "delete",
          col(s"__p_$cn")).otherwise(col(cn)).as(cn)): _*)
  }

  /** JSONL training-data export — the text format tokenizer pipelines
    * consume. Rows shard deterministically by the 63-bit md5 of the id
    * (`shard = md5(id) % shards`, the stratified-sampling hash bridge, so
    * shard membership is stable across runs and engines); `partitionBy`
    * lays one `shard=N/` directory per shard, and the pre-write
    * `repartition` on the shard key makes each directory a small number
    * of whole files — the layout a downstream loader streams shard-by-
    * shard. Readers recover `shard` as a partition column.
    *
    * 100 TB design: the repartition is the one shuffle and it IS the
    * export contract (co-locate a shard's rows); JSON encoding is
    * scan-stage. More shards than executors just means multiple dirs per
    * task — shards need not fit anywhere. */
  def exportJsonl(df: DataFrame, outDir: String, idCol: String,
                  shards: Int): Unit = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.withColumn("shard",
        pmod(graft.functions.expressions.Md5Long(col(idCol).cast("string"))
          .bitwiseAND(lit(Long.MaxValue)), lit(shards.toLong)))
      .repartition(col("shard"))
      .write.partitionBy("shard").mode("overwrite").json(outDir)
  }

  /** Read a JSONL export back with an explicit schema (inference would
    * type-drift: int64 vs double on empty shards). `shard` comes back as
    * the partition column. */
  def readJsonl(spark: SparkSession, dir: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("basePath", dir).json(dir)
}
