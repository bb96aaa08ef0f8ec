package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.ops.Materialize
import graft.sources.Writers

/** T5/M6 end-to-end: incremental refresh of a latest-value feature snapshot
  * from an append-only versioned event dir (reference `is_incremental`
  * transformations + Delta-CDF reads, offline_store_spark_runner.py:1076-1136,
  * re-expressed over the version-dir scheme: "new data" = version dirs after
  * the last processed one).
  *
  * Each refresh reads ONLY the new version dirs, folds them into the current
  * snapshot with [[Materialize.upsert]] (one entity-key shuffle over
  * |snapshot| + |delta|, not the full history), writes the result as a new
  * snapshot version, and records the processing watermark. Crash-safe:
  * the watermark file is committed after the snapshot write, so a crash
  * between the two replays the same delta into an idempotent upsert.
  */
object IncrementalRunner {

  private def stateFile(snapshotDir: String) = new Path(s"$snapshotDir/.PROCESSED")

  def lastProcessed(spark: SparkSession, snapshotDir: String): Option[String] = {
    val p = stateFile(snapshotDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim).filter(_.nonEmpty)
      finally in.close()
    }
  }

  private def writeState(spark: SparkSession, snapshotDir: String, v: String): Unit = {
    val fs = stateFile(snapshotDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$snapshotDir/.PROCESSED.tmp")
    val os = fs.create(tmp, true)
    os.write(v.getBytes("UTF-8")); os.close()
    fs.delete(stateFile(snapshotDir), false)
    fs.rename(tmp, stateFile(snapshotDir))
  }

  /** Refresh the snapshot under `snapshotDir` from new triple version dirs
    * under `eventsDir`. Returns the new snapshot version dir, or None if
    * there was nothing new. */
  def refreshLatest(spark: SparkSession, eventsDir: String,
                    snapshotDir: String): Option[String] = {
    val (newDirs, deltaOpt) =
      StreamingLatest.incrementalRead(spark, eventsDir, lastProcessed(spark, snapshotDir))
    deltaOpt.map { delta =>
      val refreshed = Writers.latestVersion(spark, snapshotDir) match {
        case Some(_) =>
          Materialize.upsert(Writers.readLatest(spark, snapshotDir), delta)
        case None => Materialize.latestTriple(delta)
      }
      val out = Writers.atomicReplace(spark, refreshed, snapshotDir)
      writeState(spark, snapshotDir, newDirs.max)
      out
    }
  }
}
