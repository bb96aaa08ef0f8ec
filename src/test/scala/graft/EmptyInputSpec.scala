package graft

import org.apache.spark.sql.functions._

/** Robustness sweep: EVERY driver query must run (possibly to an empty
  * result) against empty copies of the input tables — the empty-table /
  * empty-partition edge a production lake hits routinely (new tenant,
  * freshly-truncated staging, partition-pruned-to-nothing reads).
  * Crashing on empty input is a correctness bug at any scale. */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf001/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query survives fully-empty inputs") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        fn(spark, emptyDir).queryExecution.toRdd.count()
      } catch {
        case e: Throwable =>
          failures += ((name, Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.take(1).mkString))
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries crash on empty input:\n" +
        failures.map { case (n, m) => s"  $n: $m" }.mkString("\n"))
  }
}
