package graft.sched

import java.util.concurrent.atomic.AtomicInteger
import graft.SparkSpec

class TaskRunnerSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_sched").toString

  test("retry with recorded attempts, then success") {
    val runner = new TaskRunner(spark, freshDir(), maxAttempts = 3, backoffMs = 1)
    val calls = new AtomicInteger(0)
    val (rec, out) = runner.run("mat", "v1") {
      if (calls.incrementAndGet() < 3) sys.error("flaky")
      42
    }
    assert(out.contains(42) && rec.status == "success" && rec.attempt == 3)
    val runs = runner.runs().filter(r => r.task == "mat" && r.runKey == "v1")
    assert(runs.map(_.status) == Seq("failed", "failed", "success"))
  }

  test("resume skips a completed (task, runKey); failures exhaust attempts") {
    val dir = freshDir()
    val runner = new TaskRunner(spark, dir, maxAttempts = 2, backoffMs = 1)
    assert(runner.run("t", "k") { 1 }._1.status == "success")
    // same key: skipped without executing the body
    val calls = new AtomicInteger(0)
    val (rec, out) = runner.run("t", "k") { calls.incrementAndGet() }
    assert(rec.status == "skipped" && out.isEmpty && calls.get() == 0)
    // records survive a "restart" (fresh runner over the same state dir)
    val runner2 = new TaskRunner(spark, dir, maxAttempts = 2, backoffMs = 1)
    assert(runner2.succeeded("t", "k"))
    val (fr, fo) = runner2.run("always_fails", "k") { sys.error("nope") }
    assert(fr.status == "failed" && fr.attempt == 2 && fo.isEmpty)
  }

  test("ledger shape is deterministic: never a duplicate success row") {
    // the driver's task_runs fixture, repeated — guards the 7-vs-6 regression
    // (CORRECTNESS_r04: a resumed run recorded an extra success)
    for (_ <- 1 to 25) {
      val runner = new TaskRunner(spark, freshDir(), maxAttempts = 3, backoffMs = 1)
      val calls = new AtomicInteger(0)
      runner.run("materialize", "v1") {
        if (calls.incrementAndGet() < 3) sys.error("flaky"); 1L
      }
      runner.run("materialize", "v1") { 0L } // resumed → skipped, not recorded
      runner.run("doomed", "v1") { sys.error("always") }
      val rows = runner.runs().map(r => (r.task, r.attempt, r.status))
      assert(rows == Seq(
        ("materialize", 1, "failed"), ("materialize", 2, "failed"),
        ("materialize", 3, "success"),
        ("doomed", 1, "failed"), ("doomed", 2, "failed"), ("doomed", 3, "failed")))
    }
  }

  test("maxJobDuration cancels the job group and records timeout") {
    val runner = new TaskRunner(spark, freshDir(), maxAttempts = 1,
      maxJobDuration = java.time.Duration.ofMillis(800))
    val (rec, out) = runner.run("slow", "k") {
      // a genuinely long Spark job (driver-side sleep per partition)
      spark.range(0, 64, 1, 8).rdd.foreach(_ => Thread.sleep(2000))
    }
    assert(rec.status == "timeout" && out.isEmpty)
  }

  test("dag: topo order is deterministic; failure cascades; resume " +
    "re-runs only the incomplete tail") {
    val dir = freshDir()
    val runner = new TaskRunner(spark, dir, maxAttempts = 2, backoffMs = 1)
    var cleanTries = 0
    def tasks(cleanFails: Boolean): Map[String, () => Any] = Map(
      "ingest" -> (() => 1L),
      "clean" -> (() => {
        cleanTries += 1
        if (cleanFails) sys.error("boom") else 2L
      }),
      "features" -> (() => 3L),
      "train" -> (() => 4L))
    val deps = Map("clean" -> Seq("ingest"), "features" -> Seq("ingest"),
      "train" -> Seq("clean", "features"))
    assert(Dag.topoOrder(tasks(true).keys.toSeq.sorted, deps) ===
      Seq("ingest", "clean", "features", "train"))
    val r1 = Dag.run(runner, "k", tasks(cleanFails = true), deps)
    assert(r1.map(r => r.task -> r.status) === Seq(
      "ingest" -> "success", "clean" -> "failed",
      "features" -> "success", "train" -> "upstream_failed"))
    assert(cleanTries === 2) // both attempts burned
    // resume: ingest/features skip (already succeeded), clean now passes,
    // train finally runs
    val r2 = Dag.run(runner, "k", tasks(cleanFails = false), deps)
    assert(r2.map(r => r.task -> r.status) === Seq(
      "ingest" -> "skipped", "clean" -> "success",
      "features" -> "skipped", "train" -> "success"))
  }

  test("dag: cycles and unknown dependencies are rejected") {
    intercept[RuntimeException] {
      Dag.topoOrder(Seq("a", "b"), Map("a" -> Seq("b"), "b" -> Seq("a")))
    }
    intercept[IllegalArgumentException] {
      Dag.topoOrder(Seq("a"), Map("a" -> Seq("ghost")))
    }
  }

  test("torn ledger tail (writer crashed mid-append) is dropped; earlier " +
       "corruption fails loudly; appends continue past a torn tail") {
    val dir = freshDir()
    val runner = new TaskRunner(spark, dir, backoffMs = 1)
    runner.run("a", "k1") { 1 }
    runner.run("b", "k1") { 2 }
    // simulate a crash mid-append: half a JSON object at EOF
    val ledger = java.nio.file.Paths.get(dir, "task_runs.jsonl")
    java.nio.file.Files.write(ledger,
      """{"task":"c","runKey":"k1","att""".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.APPEND)
    val runner2 = new TaskRunner(spark, dir, backoffMs = 1)
    // the torn record is lost exactly like a crash before the write
    assert(runner2.runs().map(_.task) == Seq("a", "b"))
    assert(!runner2.succeeded("c", "k1"))
    // the next append HEALS the tail (truncates the fragment) rather than
    // fusing with it — the re-run of c must land as a clean, readable row
    runner2.run("c", "k1") { 3 }
    val after = new TaskRunner(spark, dir, backoffMs = 1).runs()
    assert(after.exists(r => r.task == "c" && r.status == "success"))
    // corruption NOT at the tail is a real error, never silently dropped
    val lines = new String(java.nio.file.Files.readAllBytes(ledger), "UTF-8")
    java.nio.file.Files.write(ledger,
      ("{broken}\n" + lines).getBytes("UTF-8"))
    intercept[Exception] { new TaskRunner(spark, dir, backoffMs = 1).runs() }
  }

  test("schedule due-time evaluation") {
    val s = Schedule(everyMs = 1000, offsetMs = 500)
    assert(s.lastDue(400).isEmpty)
    assert(s.lastDue(500).contains(500L) && s.lastDue(1499).contains(500L))
    assert(s.lastDue(2600).contains(2500L))
    assert(s.isDue(1600, None))
    assert(s.isDue(1600, Some(500L)))      // new tick at 1500
    assert(!s.isDue(1600, Some(1500L)))    // already ran this tick
  }
}
