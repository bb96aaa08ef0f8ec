package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class PitWindowAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("half-open boundaries, bucket crossing, zero-event and dup labels") {
    // window 100 s; label at t=1000 covers [900, 1000)
    val labels = Seq(
      (1L, ts(1000)), (1L, ts(1000)),         // duplicate label collapses
      (2L, ts(1000)),                          // no events at all
      (3L, ts(150))).toDF("entity", "ts")      // window [50,150) crosses bucket
    val events = Seq(
      (1L, 1.0, ts(900)),    // == ts-W -> included (closed start)
      (1L, 2.0, ts(999)),    // inside
      (1L, 4.0, ts(1000)),   // == label ts -> EXCLUDED (open end)
      (1L, 8.0, ts(899)),    // before window
      (3L, 16.0, ts(50)),    // window start, previous bucket
      (3L, 32.0, ts(149)),   // window end - 1, label's own bucket
      (3L, 64.0, ts(150))).toDF("entity", "value", "ts")
    val out = PitWindowAgg.trailingAgg(labels, events, "entity", "ts", "ts",
        "value", windowSec = 100L)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      (1L, 1000000L) -> ((2L, 3.0)),
      (2L, 1000000L) -> ((0L, 0.0)),
      (3L, 150000L)  -> ((2L, 48.0))))
  }

  test("prefix-sum path equals the bucket join, boundaries included") {
    val labels = Seq((1L, ts(1000)), (2L, ts(1000)), (3L, ts(150)))
      .toDF("entity", "ts")
    val events = Seq(
      (1L, 1.0, ts(900)), (1L, 2.0, ts(999)), (1L, 4.0, ts(1000)),
      (1L, 8.0, ts(899)), (3L, 16.0, ts(50)), (3L, 32.0, ts(149)),
      (3L, 64.0, ts(150))).toDF("entity", "value", "ts")
    val a = PitWindowAgg.trailingAgg(labels, events, "entity", "ts", "ts",
      "value", 100L).as[(Long, Long, Long, Double)].collect().toSet
    val b = PitWindowAgg.trailingAggPrefix(labels, events, "entity", "ts",
      "ts", "value", 100L).as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b && a.nonEmpty)
    // and on real data
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val l2 = ev.filter($"event_type" === "purchase")
    val c2 = ev.filter($"event_type" === "click")
    val fast = PitWindowAgg.trailingAgg(l2, c2, "user_id", "ts", "ts",
      "value", 7200L).as[(Long, Long, Long, Double)].collect().toSet
    val pre = PitWindowAgg.trailingAggPrefix(l2, c2, "user_id", "ts", "ts",
      "value", 7200L).as[(Long, Long, Long, Double)].collect().toSet
    assert(fast == pre)
  }

  test("ladder rungs equal independent single-window runs") {
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val labels = ev.filter($"event_type" === "purchase")
    val clicks = ev.filter($"event_type" === "click")
    val ladder = PitWindowAgg.trailingAggLadder(labels, clicks, "user_id",
        "ts", "ts", "value", Seq(1800L, 7200L))
      .as[(Long, Long, Long, Double, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    for (w <- Seq(1800L, 7200L)) {
      val single = PitWindowAgg.trailingAgg(labels, clicks, "user_id", "ts",
          "ts", "value", w)
        .as[(Long, Long, Long, Double)].collect()
      assert(single.nonEmpty)
      single.foreach { case (e, t, n, sum) =>
        val l = ladder((e, t))
        if (w == 1800L) assert((l._3, l._4) == ((n, sum)))
        else assert((l._5, l._6) == ((n, sum)))
      }
    }
  }

  test("agrees with the brute-force range join on real events") {
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val labels = ev.filter($"event_type" === "purchase")
    val clicks = ev.filter($"event_type" === "click")
    val fast = PitWindowAgg.trailingAgg(labels, clicks, "user_id", "ts",
        "ts", "value", windowSec = 7200L)
      .as[(Long, Long, Long, Double)].collect().toSet
    val l = labels.select($"user_id".as("lu"), $"ts".as("lts")).distinct()
    val c = clicks.select($"user_id".as("cu"), $"ts".as("cts"),
      $"value".as("cv"))
    val brute = l.join(c,
        $"cu" === $"lu" &&
          $"cts" >= ($"lts" - expr("INTERVAL 2 HOURS")) &&
          $"cts" < $"lts", "left")
      .groupBy($"lu", $"lts")
      .agg(count($"cu").as("n"),
        coalesce(sum($"cv".cast("decimal(18,2)")).cast("double"),
          lit(0.0)).as("s"))
      .select($"lu", unix_millis($"lts"), $"n", $"s")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(fast == brute && fast.nonEmpty)
  }
}
