package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Behavioral-analytics ops: event funnel (windowFunnel rule), cohort
  * retention, SCD2 interval build — hand-computed expectations. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel: greedy chain, horizon bound, pre-anchor events ignored") {
    // A completes; B stalls after click (purchase outside horizon);
    // C clicked BEFORE the first view (no chain); D never views.
    val ev = Seq(
      ("A", "view", ts(0), 1L), ("A", "click", ts(10), 2L),
      ("A", "purchase", ts(20), 3L),
      ("B", "view", ts(0), 4L), ("B", "click", ts(30), 5L),
      ("B", "purchase", ts(200), 6L),
      ("C", "click", ts(0), 7L), ("C", "view", ts(10), 8L),
      ("D", "click", ts(0), 9L), ("D", "purchase", ts(5), 10L)
    ).toDF("u", "typ", "t", "eid")
    val out = EventFunnel.funnel(ev, "u", "t", "typ",
        Seq("view", "click", "purchase"), horizonSeconds = 3600)
      .orderBy("step_idx").collect()
    assert(out.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("view", 3L), ("click", 2L), ("purchase", 1L)))
    val depth = EventFunnel.funnelDepth(ev, "u", "t", "typ",
        Seq("view", "click", "purchase"), 3600)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(depth === Map("A" -> 3, "B" -> 2, "C" -> 1))
  }

  test("funnel: simultaneous events do not advance the chain") {
    val ev = Seq(("A", "view", ts(0), 1L), ("A", "click", ts(0), 2L))
      .toDF("u", "typ", "t", "eid")
    val out = EventFunnel.funnel(ev, "u", "t", "typ",
        Seq("view", "click"), 3600).orderBy("step_idx").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 0L))
  }

  test("retention: daily cohorts and offsets") {
    def day(d: Int, h: Int = 9) = Timestamp.valueOf(f"2024-01-0$d $h%02d:00:00")
    val ev = Seq(
      ("u1", day(1)), ("u1", day(1, 23)), ("u1", day(3)),
      ("u2", day(1)), ("u2", day(2)),
      ("u3", day(2)), ("u3", day(4))
    ).toDF("u", "t")
    val out = Cohorts.retention(ev, "u", "t", bucket = "day")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val d1 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val d2 = Timestamp.valueOf("2024-01-02 00:00:00").getTime
    // cohort day1: u1+u2 at offset0; u2 at offset1; u1 at offset2
    assert(out === Map((d1, 0) -> 2L, (d1, 1) -> 1L, (d1, 2) -> 1L,
      (d2, 0) -> 1L, (d2, 2) -> 1L))
  }

  test("scd2: run-length compression, interval chaining, open tail") {
    val ev = Seq(
      (1L, "A", ts(0), 1L), (1L, "A", ts(10), 2L), (1L, "B", ts(20), 3L),
      (1L, "A", ts(30), 4L),
      (2L, "X", ts(5), 5L)
    ).toDF("k", "attr", "t", "eid")
    val out = Scd2.build(ev, "k", Seq("attr"), "t", "eid")
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, "A", ts(0), Some(ts(20)), false),
      (1L, "B", ts(20), Some(ts(30)), false),
      (1L, "A", ts(30), None, true),
      (2L, "X", ts(5), None, true)))
  }

  test("scd2: intervals tile each key's history (no gaps, no overlaps)") {
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val iv = Scd2.build(ev, "user_id", Seq("event_type"), "ts", "event_id")
    // each interval's valid_to equals the NEXT interval's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val bad = iv.withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .where((col("valid_to").isNull && col("nxt").isNotNull) ||
        (col("valid_to").isNotNull && !(col("valid_to") <=> col("nxt"))))
    assert(bad.count() === 0)
    // exactly one open (current) interval per key
    val open = iv.where(col("is_current")).groupBy("user_id")
      .agg(count(lit(1)).as("n")).where(col("n") =!= 1)
    assert(open.count() === 0)
  }
}
