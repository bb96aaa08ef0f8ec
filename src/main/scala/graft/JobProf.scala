package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (guide §1): per-JOB and per-STAGE time/shuffle attribution for
  * one query, via a SparkListener — the stage-level evidence the Spark UI
  * would show, printed to stdout (the bench session runs with the UI off).
  *
  * For each Spark job the query triggers: wall time, stage count, and per
  * stage the task count, summed task time, shuffle read/write bytes and
  * spill. Queries here are multi-job programs (probes, barriers,
  * iterations, temp writes), so job attribution is the first question —
  * "which pass is slow" — before any operator tuning.
  *
  * Usage: runMain graft.JobProf <sfDir> <q1,q2,...> [reps]
  * Reps > 1 re-run each query after cache-clear + GC (TimeQ isolation);
  * only the LAST rep's jobs are printed (steady state, JIT paid).
  */
object JobProf {
  private case class StageAgg(name: String, var tasks: Int = 0,
      var taskMs: Long = 0, var shufReadB: Long = 0, var shufWriteB: Long = 0,
      var spillB: Long = 0, var inputB: Long = 0)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-jobprof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobStart = mutable.Map.empty[Int, Long]
    val jobWall = mutable.LinkedHashMap.empty[Int, Long]
    val jobStages = mutable.Map.empty[Int, Seq[Int]]
    val stages = mutable.Map.empty[Int, StageAgg]
    var collecting = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (collecting) {
          jobStart(e.jobId) = e.time
          jobStages(e.jobId) = e.stageIds
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        if (collecting && jobStart.contains(e.jobId))
          jobWall(e.jobId) = e.time - jobStart(e.jobId)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = e.stageInfo
          // keyed by stageId with the LAST attempt winning (assignment,
          // not +=): a retried stage attempt would otherwise double-count
          // its tasks/metrics in the aggregate
          stages(si.stageId) = StageAgg(
            si.name.takeWhile(_ != '\n').take(90),
            tasks = si.numTasks,
            taskMs = si.taskMetrics.executorRunTime,
            shufReadB = si.taskMetrics.shuffleReadMetrics.totalBytesRead,
            shufWriteB = si.taskMetrics.shuffleWriteMetrics.bytesWritten,
            spillB = si.taskMetrics.diskBytesSpilled,
            inputB = si.taskMetrics.inputMetrics.bytesRead)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      jobStart.clear(); jobWall.clear(); jobStages.clear(); stages.clear()
      for (r <- 1 to reps) {
        val last = r == reps
        collecting = last
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[jobprof] rep=$r $name $dt%7.2f s")
        if (!last) {
          spark.catalog.clearCache()
          System.gc()
        }
      }
      // drain the async listener bus before reading the aggregates: poll
      // until the aggregates are quiescent for two consecutive checks
      // (a fixed sleep under-reported on slow runs; the bus drain API is
      // private[spark])
      var snap = (-1, -1, 0L)
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(100); waited += 100
        val now = (jobWall.size, stages.size, stages.valuesIterator.map(_.taskMs).sum)
        if (now == snap) stable += 1 else { stable = 0; snap = now }
      }
      collecting = false
      println(f"${"job"}%5s ${"wall_ms"}%8s  stages")
      jobWall.toSeq.sortBy(_._1).foreach { case (id, w) =>
        println(f"$id%5d $w%8d  ${jobStages(id).sorted.mkString(",")}")
      }
      println(f"${"stage"}%6s ${"tasks"}%5s ${"taskMs"}%8s ${"inMB"}%7s " +
        f"${"shRdMB"}%7s ${"shWrMB"}%7s ${"spillMB"}%7s  name")
      stages.toSeq.sortBy(_._1).foreach { case (id, a) =>
        println(f"$id%6d ${a.tasks}%5d ${a.taskMs}%8d " +
          f"${a.inputB / 1e6}%7.1f ${a.shufReadB / 1e6}%7.1f " +
          f"${a.shufWriteB / 1e6}%7.1f ${a.spillB / 1e6}%7.1f  ${a.name}")
      }
      val totWall = jobWall.values.sum
      println(f"[jobprof] $name jobs=${jobWall.size} " +
        f"sum_job_wall=${totWall / 1e3}%.2f s")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
