package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // results are bit-identical without the extension (plain-session
      // smoke covers that); running verify WITH it proves the rewrites
      // preserve every oracle hash
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Queries are independent jobs — run them concurrently so the wall clock
    // is bounded by the slowest few, not the sum (Spark's scheduler
    // interleaves stages across job groups; local[32] has the slots).
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }.toSeq
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(selected.size, 1)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futures = selected.map { case (name, fn) =>
      scala.concurrent.Future {
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Record which queries this run SELECTED, so the oracle compare can
    // distinguish "intentionally-subset run" from "query crashed and left no
    // dump" — a missing dump for a selected query must fail the gate.
    // Written BESIDE outDir, not inside it: the driver's compare walks the
    // dump dir, and round 7's empty CORRECTNESS artifact coincided exactly
    // with this manifest first appearing inside it — keep the dump dir's
    // contents limited to result dirs + oracle_sql.json (the r1-r6 shape
    // the driver demonstrably handles).
    Files.writeString(
      Paths.get(s"${outDir.stripSuffix("/")}.queries_run.json"),
      selected.map(s => q(s._1)).sorted.mkString("[", ",", "]"))
    // Loud, grep-able evidence of EXACTLY what the downstream compare will
    // see (rounds 7-8's driver correctness record arrived empty while the
    // dump was demonstrably complete — this line pins the repo-side state
    // in the driver's own log).
    val entries = new java.io.File(outDir).listFiles()
    System.err.println(s"[verify] DUMP_DIR $outDir entries=${entries.length} " +
      s"result_dirs=${entries.count(_.isDirectory)} " +
      s"oracle_sql=${entries.exists(_.getName == "oracle_sql.json")} " +
      s"queries_selected=${selected.size}")
    spark.stop()
  }
}
