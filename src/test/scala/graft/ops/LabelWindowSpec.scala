package graft.ops

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("strict start, inclusive end, bucket crossing, zero-outcome anchors") {
    // horizon 100 s; anchor at t=1000 covers (1000, 1100]
    val anchors = Seq(
      (1L, ts(1000)), (1L, ts(1000)),        // duplicate anchor collapses
      (2L, ts(1000)),                         // no outcomes at all
      (3L, ts(50))).toDF("entity", "ts")      // (50, 150] crosses bucket edge
    val outcomes = Seq(
      (1L, 1.0, ts(1000)),   // == anchor ts -> EXCLUDED (strict start)
      (1L, 2.0, ts(1001)),   // first inside
      (1L, 4.0, ts(1100)),   // == anchor + H -> included (closed end)
      (1L, 8.0, ts(1101)),   // past horizon
      (3L, 16.0, ts(99)),    // anchor's own bucket
      (3L, 32.0, ts(150)),   // next bucket, == end
      (3L, 64.0, ts(151))).toDF("entity", "value", "ts")
    val out = LabelWindow.forwardLabel(anchors, outcomes, "entity", "ts",
        "ts", "value", horizonSec = 100L)
      .as[(Long, Long, Long, Long, Double, Option[Long])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out == Map(
      (1L, 1000000L) -> ((1L, 2L, 6.0, Some(1001000L))),
      (2L, 1000000L) -> ((0L, 0L, 0.0, None)),
      (3L, 50000L)   -> ((1L, 2L, 48.0, Some(99000L)))))
  }

  test("forward labels mirror a reversed trailing aggregate on real data") {
    // forwardLabel(anchor, H) counts outcomes in (t, t+H]; trailingAgg at
    // label time t+H counts events in [t, t+H) — not directly comparable,
    // so cross-check against a plain join replay instead.
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val a = ev.filter($"event_type" === "click")
    val o = ev.filter($"event_type" === "purchase")
    val got = LabelWindow.forwardLabel(a, o, "user_id", "ts", "ts",
      "value", 3600L).as[(Long, Long, Long, Long, Double, Option[Long])]
      .collect().toSet
    val ak = a.select($"user_id", unix_micros($"ts").as("at")).distinct()
    val ok = o.select($"user_id".as("ou"), unix_micros($"ts").as("ot"),
      $"value".cast("decimal(18,2)").as("v"))
    val want = ak.join(ok, $"user_id" === $"ou" &&
        $"ot" > $"at" && $"ot" <= $"at" + 3600L * 1000000L, "left")
      .groupBy($"user_id", $"at")
      .agg(count($"ou").as("n"), sum($"v").as("s"), min($"ot").as("f"))
      .select($"user_id", expr("at div 1000"),
        when($"n" > 0, 1L).otherwise(0L), $"n",
        coalesce($"s".cast("double"), lit(0.0)), expr("f div 1000"))
      .as[(Long, Long, Long, Long, Double, Option[Long])].collect().toSet
    assert(got == want && got.exists(_._3 == 1L) && got.exists(_._3 == 0L))
  }
}
