package graft

import org.apache.spark.sql.SparkSession

/** Scheduler-plane envelope — quantifies the two round-12 scale claims
  * instead of asserting them:
  *
  *  1. LEDGER APPEND COST IS FLAT (the O(1) java.io append rework): time
  *     append batches at a growing ledger (2k → 20k records) and report
  *     appends/sec per decade — the old read+rewrite slowed linearly with
  *     ledger size (O(n²) total), so a flat curve IS the fix's evidence.
  *  2. DAEMON DRAIN THROUGHPUT: N wire-shape `created` runs executed by
  *     the polling daemon (claim + RUNNING marker + attempt record +
  *     scheduler-id log per run) — the registration→execution pipeline's
  *     runs/sec, and the latest-run index read rate underneath it.
  *
  * One JSON line → BENCH_sched_r12.json. */
object SchedBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sched._

    // ---- 1. append-cost curve: appends/sec per 2k batch as the ledger
    //      grows to 20k records (old rewrite: each decade ~linearly slower)
    val dir1 = java.nio.file.Files.createTempDirectory("graft_schedbench").toString
    val runner1 = new TaskRunner(spark, dir1, backoffMs = 1)
    val batch = 2000
    val decades = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var total = 0
    for (d <- 1 to 10) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < batch) {
        runner1.record(TaskRun("append_probe", s"k$total", 1, "success",
          0L, 0L, None))
        total += 1; i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      decades += (s"at_${(d - 1) * batch}" -> batch / sec)
    }
    val rates = decades.values.toSeq
    val flatness = rates.last / rates.head // ~1.0 = flat; old code: ~1/10
    // index read rate at the 20k ledger (the Tasks service's per-RPC cost)
    val tIdx = System.nanoTime()
    var reads = 0
    while (reads < 2000) { runner1.latestRun("append_probe", "k1"); reads += 1 }
    val idxReadsPerSec = 2000 / ((System.nanoTime() - tIdx) / 1e9)

    // ---- 2. daemon drain: N created runs → all success via the poll loop
    val dir2 = java.nio.file.Files.createTempDirectory("graft_schedbench2").toString
    val runner2 = new TaskRunner(spark, dir2, backoffMs = 1)
    val n = 500
    (0 until n).foreach(i => runner2.record(
      TaskRun("drain", s"r$i", 0, "created", System.currentTimeMillis(), 0L, None)))
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val daemon = new Scheduler(runner2, "bench",
      t => if (t == "drain") Some(() => done.incrementAndGet()) else None,
      pollIntervalMs = 10L, maxConcurrent = 8).start()
    val t1 = System.nanoTime()
    val deadline = System.currentTimeMillis() + 300000L
    while (done.get() < n && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    daemon.stop()
    val drainSec = (System.nanoTime() - t1) / 1e9
    require(done.get() == n, s"daemon drained ${done.get()} of $n")
    val finals = runner2.latestRuns().filter(_.task == "drain")
    require(finals.size == n && finals.forall(_.status == "success"),
      "every drained run must read back success")

    val decJson = decades.map { case (k, v) => s""""$k":${f"$v%.0f"}""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"scheduler_envelope","ledger_records":$total,""" +
        s""""append_rate_per_sec":$decJson,""" +
        f""""append_flatness_last_over_first":$flatness%.2f,""" +
        f""""index_reads_per_sec":$idxReadsPerSec%.0f,""" +
        s""""daemon_drain":{"runs":$n,"sec":${f"$drainSec%.2f"},""" +
        f""""runs_per_sec":${n / drainSec}%.1f}}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/BENCH_sched_r12.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
