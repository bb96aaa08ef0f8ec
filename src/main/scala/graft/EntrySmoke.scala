package graft

import org.apache.spark.sql.SparkSession

/** Replicates the driver's flagship smoke: `SparkEntry.entry` on a PLAIN
  * session — no extensions, no tuned confs — must return rows. Keeping
  * this as a standing main (it kept being re-added ad hoc per round)
  * catches any accidental dependency of the entry path on
  * GraftExtensions/session config. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"""{"metric":"entry_smoke","rows":$n,"ok":${n > 0}}""")
    spark.stop()
    if (n == 0) sys.exit(1)
  }
}
