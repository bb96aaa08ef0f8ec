package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.PartitionHint

/** Table-format seam — one interface over "a versioned table with MERGE
  * and a change feed", with two bindings:
  *
  *  - [[VersionDirFormat]] (always available): the immutable
  *    timestamped-version-dir scheme of [[Writers]] — the reference's own
  *    layout (offline_store_spark_runner.py:896-909) — with the change
  *    feed derived by [[Writers.versionDiff]] and MERGE as
  *    read-latest → keyed merge → new version.
  *  - [[DeltaFormat]] (available iff a Delta Lake jar is on the
  *    classpath): real transaction-log versions, `MERGE INTO`, and
  *    `readChangeFeed` — the ACID/concurrent-writer/time-travel contract
  *    the version-dir scheme only approximates (reference Delta CDF
  *    reads: offline_store_spark_runner.py:1076-1136). Implemented
  *    entirely through the stringly-typed public DataSource/SQL surface
  *    (`format("delta")`, `MERGE INTO delta.`path``, `DESCRIBE
  *    HISTORY`), so this file compiles with no Delta dependency; the
  *    classpath probe gates activation at runtime.
  *
  * Resolution: `spark.graft.tableFormat` = `auto` (default — Delta when
  * present, else version dirs) | `delta` | `versiondir`. Both bindings
  * expose the SAME taxonomy: `changes` returns rows tagged
  * `change_type ∈ {insert, delete, update_postimage}` (pre-images
  * dropped), `versions` ascends chronologically, and `mergeUpsert` is
  * keyed UPDATE SET * / INSERT * semantics — the suites parameterize over
  * every available binding so a Delta-enabled cluster certifies both.
  */
trait TableFormat {
  def name: String

  /** Write `df` as a NEW version of the table; returns the version token. */
  def write(spark: SparkSession, df: DataFrame, table: String,
            partition: Option[PartitionHint] = None): String

  /** Latest committed version's rows. */
  def readLatest(spark: SparkSession, table: String): DataFrame

  /** Rows as of one version token. */
  def readVersion(spark: SparkSession, table: String, version: String): DataFrame

  /** All committed version tokens, chronologically ascending. */
  def versions(spark: SparkSession, table: String): Seq[String]

  /** Row-level changes AFTER `fromVersion` up to and including
    * `toVersion`, keyed on `keyCol`: columns of the table plus
    * `change_type` (insert / delete / update_postimage; deletes carry
    * pre-image values). */
  def changes(spark: SparkSession, table: String, fromVersion: String,
              toVersion: String, keyCol: String): DataFrame

  /** Keyed MERGE: matched rows updated to the incoming row, unmatched
    * inserted; commits one new version. */
  def mergeUpsert(spark: SparkSession, table: String, updates: DataFrame,
                  keyCol: String): Unit

  /** Retention maintenance: make versions older than the newest
    * `keepLast` unreachable/physically reclaimed, binding-natively —
    * version-dir deletion, Delta VACUUM, Iceberg expire_snapshots. After
    * this, `readVersion` on an expired token may fail; `readLatest` and
    * the newest `keepLast` tokens always survive. */
  def expireVersions(spark: SparkSession, table: String,
                     keepLast: Int): Unit

  /** Row deletion by SQL predicate — the offline right-to-erasure write,
    * binding-natively: `DELETE FROM` where the format supports it,
    * filter-into-a-new-version on the version-dir scheme. The deleted
    * rows remain in HISTORY until [[expireVersions]] reclaims it; run
    * both for an erasure obligation. */
  def deleteWhere(spark: SparkSession, table: String,
                  condition: String): Unit
}

object TableFormat {

  /** True iff a Delta Lake jar is on the classpath (the seam's gate). */
  def deltaAvailable: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.DeltaLog"); true }
    catch {
      case _: ClassNotFoundException =>
        try { Class.forName("io.delta.tables.DeltaTable"); true }
        catch { case _: ClassNotFoundException => false }
    }

  /** True iff an Iceberg Spark-runtime jar is on the classpath. */
  def icebergJarPresent: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: ClassNotFoundException => false }

  /** Iceberg usable in THIS session: jar + a configured Iceberg catalog
    * name in `spark.graft.icebergCatalog` (the catalog itself is the
    * user's `spark.sql.catalog.<name>` wiring). */
  def icebergAvailable(spark: SparkSession): Boolean =
    icebergJarPresent &&
      spark.conf.getOption("spark.graft.icebergCatalog").exists(_.nonEmpty)

  /** Bindings usable in this session — what the suites parameterize over. */
  def available(spark: SparkSession): Seq[TableFormat] =
    Seq(VersionDirFormat) ++
      (if (deltaAvailable) Seq(DeltaFormat) else Nil) ++
      (if (icebergAvailable(spark))
        Seq(new IcebergFormat(spark.conf.get("spark.graft.icebergCatalog")))
      else Nil)

  /** Resolve per `spark.graft.tableFormat`
    * (auto | delta | iceberg | versiondir). */
  def resolve(spark: SparkSession): TableFormat =
    spark.conf.get("spark.graft.tableFormat", "auto") match {
      case "versiondir" => VersionDirFormat
      case "delta" =>
        require(deltaAvailable, "spark.graft.tableFormat=delta but no " +
          "Delta Lake jar on the classpath")
        DeltaFormat
      case "iceberg" =>
        require(icebergAvailable(spark), "spark.graft.tableFormat=iceberg " +
          "needs an Iceberg Spark-runtime jar on the classpath and " +
          "spark.graft.icebergCatalog set to a configured catalog name")
        new IcebergFormat(spark.conf.get("spark.graft.icebergCatalog"))
      case _ =>
        if (deltaAvailable) DeltaFormat
        else if (icebergAvailable(spark))
          new IcebergFormat(spark.conf.get("spark.graft.icebergCatalog"))
        else VersionDirFormat
    }
}

/** The always-available binding: [[Writers]]' immutable version dirs. */
object VersionDirFormat extends TableFormat {
  def name: String = "versiondir"

  def write(spark: SparkSession, df: DataFrame, table: String,
            partition: Option[PartitionHint]): String =
    Writers.writeVersioned(df, table, partition).split('/').last

  def readLatest(spark: SparkSession, table: String): DataFrame =
    Writers.readLatest(spark, table)

  def readVersion(spark: SparkSession, table: String, version: String): DataFrame =
    spark.read.parquet(s"$table/$version")

  def versions(spark: SparkSession, table: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(table)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
  }

  def changes(spark: SparkSession, table: String, fromVersion: String,
              toVersion: String, keyCol: String): DataFrame =
    Writers.versionDiff(spark, s"$table/$fromVersion", s"$table/$toVersion",
      keyCol)

  def expireVersions(spark: SparkSession, table: String,
                     keepLast: Int): Unit =
    Writers.gcVersions(spark, table, keepLast)

  def deleteWhere(spark: SparkSession, table: String,
                  condition: String): Unit =
    Writers.scrubLatest(spark, table, expr(condition))

  def mergeUpsert(spark: SparkSession, table: String, updates: DataFrame,
                  keyCol: String): Unit = {
    val cur = readLatest(spark, table)
    require(cur.columns.sorted.sameElements(updates.columns.sorted),
      "mergeUpsert expects identical schemas")
    // Name match alone would let unionByName widen a mismatched type
    // (double vs decimal) and silently rewrite the table schema — which
    // also breaks versionDiff's string-cast row hashes. Require the full
    // (name, dataType) signature.
    val curTypes = cur.schema.map(f => f.name -> f.dataType).sortBy(_._1)
    val updTypes = updates.schema.map(f => f.name -> f.dataType).sortBy(_._1)
    require(curTypes == updTypes,
      s"mergeUpsert expects identical column types; table has $curTypes, " +
        s"updates have $updTypes")
    val upd = updates.select(cur.columns.map(col): _*)
    // updates win on key collision (UPDATE SET *); one anti-join + union —
    // the same shuffle budget as the merge itself
    val merged = cur.join(upd.select(col(keyCol)).distinct()
        .withColumnRenamed(keyCol, "__mk"),
        col(keyCol) === col("__mk"), "left_anti")
      .unionByName(upd)
    Writers.writeVersioned(merged, table)
  }
}

/** The Delta Lake binding — every call rides the public stringly-typed
  * surface, so it compiles jar-free and activates behind
  * [[TableFormat.deltaAvailable]]. */
object DeltaFormat extends TableFormat {
  def name: String = "delta"

  private[sources] def ident(table: String) = s"delta.`$table`"

  // The statement/option surface, exposed as pure functions so
  // DeltaFormatContractSpec can pin exactly what a Delta-enabled cluster
  // will execute even where no jar exists to execute it.
  private[sources] val cdfKey =
    "spark.databricks.delta.properties.defaults.enableChangeDataFeed"
  private[sources] def historySql(table: String): String =
    s"DESCRIBE HISTORY ${ident(table)}"
  private[sources] def changeFeedOptions(fromVersion: String,
                                         toVersion: String): Map[String, String] =
    Map("readChangeFeed" -> "true",
      // Delta's startingVersion is inclusive; our contract is "after from"
      "startingVersion" -> (fromVersion.toLong + 1).toString,
      "endingVersion" -> toVersion)
  private[sources] def mergeSql(table: String, keyCol: String,
                                srcView: String): String =
    s"""MERGE INTO ${ident(table)} t USING $srcView s
       |ON t.`$keyCol` = s.`$keyCol`
       |WHEN MATCHED THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin
  private[sources] def vacuumSql(table: String, retainHours: Long): String =
    s"VACUUM ${ident(table)} RETAIN $retainHours HOURS"
  private[sources] def deleteSql(table: String, condition: String): String =
    s"DELETE FROM ${ident(table)} WHERE $condition"

  def write(spark: SparkSession, df: DataFrame, table: String,
            partition: Option[PartitionHint]): String = {
    // layout hints mirror the version-dir writer: DailyPartition derives a
    // date partition directory (K5); HashPartition pre-shuffles into
    // `buckets` files (bucket-count layout, NOT partitionBy — one dir per
    // hash value would be the small-file anti-pattern)
    val (data, partCols) = partition match {
      case Some(graft.catalog.DailyPartition(c)) =>
        (df.withColumn("__date", date_format(col(c), "yyyy-MM-dd"))
          .repartition(col("__date")).sortWithinPartitions(col(c)),
          Seq("__date"))
      case Some(graft.catalog.HashPartition(c, buckets)) =>
        (df.repartition(buckets, col(c)), Nil)
      case None => (df, Nil)
    }
    // CDF must be ON for `changes`; the session default is the
    // documented writer-independent switch (a `delta.`-prefixed writer
    // option is not reliably applied as a table property across Delta
    // versions). Scope it to this write — leaking it session-wide would
    // silently enable CDF on every later Delta table, graft's or not.
    val prior = spark.conf.getOption(cdfKey)
    spark.conf.set(cdfKey, "true")
    try {
      val w = data.write.format("delta").mode("overwrite")
        .option("overwriteSchema", "true")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).save(table)
    } finally prior match {
      case Some(v) => spark.conf.set(cdfKey, v)
      case None => spark.conf.unset(cdfKey)
    }
    versions(spark, table).last
  }

  def readLatest(spark: SparkSession, table: String): DataFrame =
    spark.read.format("delta").load(table)

  def readVersion(spark: SparkSession, table: String, version: String): DataFrame =
    spark.read.format("delta").option("versionAsOf", version).load(table)

  def versions(spark: SparkSession, table: String): Seq[String] =
    spark.sql(historySql(table))
      .select(col("version").cast("long")).orderBy(col("version"))
      .collect().map(_.getLong(0).toString).toSeq

  def changes(spark: SparkSession, table: String, fromVersion: String,
              toVersion: String, keyCol: String): DataFrame =
    // "changes AFTER fromVersion": an empty interval must yield an empty
    // feed (VersionDirFormat does the same) — Delta errors on
    // startingVersion > endingVersion rather than returning zero rows
    if (fromVersion.toLong >= toVersion.toLong)
      readVersion(spark, table, toVersion).limit(0)
        .withColumn("change_type", lit(""))
    else
      spark.read.format("delta")
        .options(changeFeedOptions(fromVersion, toVersion))
        .load(table)
        .where(col("_change_type") =!= "update_preimage")
        .withColumnRenamed("_change_type", "change_type")
        .drop("_commit_version", "_commit_timestamp")

  def mergeUpsert(spark: SparkSession, table: String, updates: DataFrame,
                  keyCol: String): Unit = {
    val src = s"__graft_merge_src_${System.nanoTime()}"
    updates.createOrReplaceTempView(src)
    try spark.sql(mergeSql(table, keyCol, src))
    finally spark.catalog.dropTempView(src)
  }

  def deleteWhere(spark: SparkSession, table: String,
                  condition: String): Unit =
    spark.sql(deleteSql(table, condition))

  /** Delta retention is TIME-based (VACUUM RETAIN n HOURS over the
    * transaction log), not count-based: compute the retention horizon
    * from the (keepLast)-th-newest commit's timestamp so at least the
    * newest `keepLast` versions survive, then VACUUM to that horizon.
    * (Log entries themselves expire via delta.logRetentionDuration.)
    *
    * Two safety rules, both pinned by DeltaFormatContractSpec:
    *  - hours are CEILED, never floored — flooring a <1h-old horizon to
    *    `RETAIN 0 HOURS` would reclaim every file outside the latest
    *    snapshot, destroying exactly the versions the contract keeps;
    *  - the retain value never drops below Delta's 168h default minimum
    *    unless the operator opts in with `spark.graft.deltaVacuumUnsafe=
    *    true` (Delta's retentionDurationCheck otherwise throws on a real
    *    cluster; with the opt-in we scope the check override to this one
    *    statement instead of leaking it session-wide). Keeping MORE hours
    *    than asked only errs on the side of retaining history. */
  def expireVersions(spark: SparkSession, table: String,
                     keepLast: Int): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val commits = spark.sql(historySql(table))
      .select(col("version").cast("long"), col("timestamp").cast("long"))
      .orderBy(col("version").desc).limit(keepLast)
      .collect()
    val horizonMs = commits.lastOption
      .map(_.getLong(1) * 1000L).getOrElse(0L)
    val unsafe = spark.conf
      .getOption("spark.graft.deltaVacuumUnsafe").contains("true")
    val hours =
      retainHours(System.currentTimeMillis(), horizonMs, allowUnsafe = unsafe)
    if (unsafe && hours < DeltaMinRetainHours) {
      val checkKey = "spark.databricks.delta.retentionDurationCheck.enabled"
      val prior = spark.conf.getOption(checkKey)
      spark.conf.set(checkKey, "false")
      try spark.sql(vacuumSql(table, hours))
      finally prior match {
        case Some(v) => spark.conf.set(checkKey, v)
        case None => spark.conf.unset(checkKey)
      }
    } else spark.sql(vacuumSql(table, hours))
  }

  /** Delta's default minimum VACUUM retention (deletedFileRetentionDuration
    * / retentionDurationCheck floor): 7 days. */
  private[sources] val DeltaMinRetainHours = 168L

  /** Pure horizon→hours rule (contract-pinned): elapsed time CEILED to
    * whole hours, floored at [[DeltaMinRetainHours]] unless explicitly
    * opted out — and NEVER below 1 even then: a horizon at/after `nowMs`
    * (another writer's clock seconds ahead — Delta history timestamps are
    * coarse) would otherwise emit `VACUUM ... RETAIN 0 HOURS`, which
    * reclaims every file outside the latest snapshot — the exact loss the
    * keepLast contract exists to prevent. */
  private[sources] def retainHours(nowMs: Long, horizonMs: Long,
                                   allowUnsafe: Boolean): Long = {
    val elapsed = math.max(0L, nowMs - horizonMs)
    val ceiled = (elapsed + 3599999L) / 3600000L
    if (allowUnsafe) math.max(ceiled, 1L)
    else math.max(ceiled, DeltaMinRetainHours)
  }
}

/** The Iceberg binding — catalog tables through the public SQL /
  * DataFrameWriterV2 surface (`writeTo(...).createOrReplace()`,
  * `VERSION AS OF`, the `system.create_changelog_view` procedure), the
  * reference's first-class Iceberg path
  * (offline_store_spark_runner.py:193-208, 965-980;
  * streamer/iceberg_streamer.py:22-106). Compiles with no Iceberg
  * dependency; activation is jar-gated behind
  * [[TableFormat.icebergAvailable]] plus a user-configured
  * `spark.sql.catalog.<name>` (named by `spark.graft.icebergCatalog`).
  *
  * Version tokens are SNAPSHOT IDs, ordered by commit time. The seam's
  * `table` strings are paths, so the binding maps each one to a stable
  * identifier `<catalog>.graft.t_<md5-8>` — deterministic per path, safe
  * for any characters, and isolated under the `graft` namespace. */
final class IcebergFormat(catalog: String) extends TableFormat {
  def name: String = "iceberg"

  private[sources] def ident(table: String): String = {
    val base = table.split('/').filter(_.nonEmpty).lastOption.getOrElse("t")
      .replaceAll("[^A-Za-z0-9_]", "_").take(40)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(table.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"$catalog.graft.${base}_$md"
  }

  private def ensureNamespace(spark: SparkSession): Unit =
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $catalog.graft")

  def write(spark: SparkSession, df: DataFrame, table: String,
            partition: Option[PartitionHint]): String = {
    ensureNamespace(spark)
    // layout hints mirror the other bindings: DailyPartition uses
    // Iceberg's native days() transform (no derived column needed);
    // HashPartition pre-shuffles into `buckets` files
    val w = partition match {
      case Some(graft.catalog.DailyPartition(c)) =>
        df.sortWithinPartitions(col(c)).writeTo(ident(table))
          .partitionedBy(expr(s"days(`$c`)"))
      case Some(graft.catalog.HashPartition(c, buckets)) =>
        df.repartition(buckets, col(c)).writeTo(ident(table))
      case None => df.writeTo(ident(table))
    }
    w.using("iceberg").createOrReplace()
    versions(spark, table).last
  }

  def readLatest(spark: SparkSession, table: String): DataFrame =
    spark.table(ident(table))

  def readVersion(spark: SparkSession, table: String, version: String): DataFrame =
    spark.sql(s"SELECT * FROM ${ident(table)} VERSION AS OF $version")

  def versions(spark: SparkSession, table: String): Seq[String] =
    spark.sql(s"SELECT snapshot_id FROM ${ident(table)}.snapshots " +
        "ORDER BY committed_at, snapshot_id")
      .collect().map(_.getLong(0).toString).toSeq

  def changes(spark: SparkSession, table: String, fromVersion: String,
              toVersion: String, keyCol: String): DataFrame =
    // Iceberg's changelog start-snapshot-id is EXCLUSIVE — exactly the
    // "changes AFTER fromVersion" contract; empty interval short-circuits
    // like the other bindings
    if (fromVersion == toVersion)
      readVersion(spark, table, toVersion).limit(0)
        .withColumn("change_type", lit(""))
    else {
      val view = s"__graft_changes_${math.abs(table.hashCode).toString}"
      val tbl = ident(table).split('.').drop(1).mkString(".") // strip catalog
      spark.sql(changelogViewSql(tbl, fromVersion, toVersion, view))
      spark.table(view)
        .where(col("_change_type") =!= "UPDATE_BEFORE")
        .withColumn("change_type",
          when(col("_change_type") === "INSERT", "insert")
            .when(col("_change_type") === "DELETE", "delete")
            .otherwise("update_postimage"))
        .drop("_change_type", "_change_ordinal", "_commit_snapshot_id")
    }

  def mergeUpsert(spark: SparkSession, table: String, updates: DataFrame,
                  keyCol: String): Unit = {
    val src = s"__graft_merge_src_${System.nanoTime()}"
    updates.createOrReplaceTempView(src)
    try spark.sql(mergeSql(table, keyCol, src))
    finally spark.catalog.dropTempView(src)
  }

  def deleteWhere(spark: SparkSession, table: String,
                  condition: String): Unit =
    spark.sql(deleteSql(table, condition))

  // The statement surface, exposed as pure functions so
  // IcebergFormatContractSpec can pin exactly what an Iceberg-enabled
  // cluster will execute (argument order, identifier quoting, the
  // changelog option keys) even where no jar exists to execute it —
  // same convention as DeltaFormat's.
  private[sources] def mergeSql(table: String, keyCol: String,
                                srcView: String): String =
    s"""MERGE INTO ${ident(table)} t USING $srcView s
       |ON t.`$keyCol` = s.`$keyCol`
       |WHEN MATCHED THEN UPDATE SET *
       |WHEN NOT MATCHED THEN INSERT *""".stripMargin

  private[sources] def deleteSql(table: String, condition: String): String =
    s"DELETE FROM ${ident(table)} WHERE $condition"

  private[sources] def changelogViewSql(tbl: String, fromVersion: String,
                                        toVersion: String,
                                        view: String): String =
    s"""CALL $catalog.system.create_changelog_view(
       |  table => '$tbl',
       |  options => map('start-snapshot-id', '$fromVersion',
       |                 'end-snapshot-id', '$toVersion'),
       |  changelog_view => '$view')""".stripMargin

  /** Iceberg maps count-based retention natively: `expire_snapshots`
    * with `retain_last` (older_than pushed to "now" so the count bound,
    * not the default 5-day age bound, decides). */
  def expireVersions(spark: SparkSession, table: String,
                     keepLast: Int): Unit = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val tbl = ident(table).split('.').drop(1).mkString(".")
    // Zone-suffixed literal: a bare TIMESTAMP 'yyyy-MM-dd HH:mm:ss' parses
    // in the SESSION timezone, so in a UTC+X session the horizon would
    // land X hours in the past and snapshots newer than that would never
    // expire regardless of retain_last. The '+00:00' offset makes the
    // horizon timezone-independent.
    val now = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))
    spark.sql(expireSnapshotsSql(tbl, now, keepLast))
  }

  private[sources] def expireSnapshotsSql(tbl: String, nowUtc: String,
                                          keepLast: Int): String =
    s"""CALL $catalog.system.expire_snapshots(
       |  table => '$tbl',
       |  older_than => TIMESTAMP '$nowUtc+00:00',
       |  retain_last => $keepLast)""".stripMargin
}
