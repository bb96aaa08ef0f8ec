package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkPoints(ts: Seq[Long]) =
    ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("pid", "us").select($"pid", timestamp_micros($"us").as("ts"))

  private def mkIntervals(iv: Seq[(Long, Long)]) =
    iv.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("iid", "a", "b")
      .select($"iid", timestamp_micros($"a").as("w_start"),
        timestamp_micros($"b").as("w_end"))

  test("bucketized join matches the brute-force cross join, half-open ends") {
    val rnd = new scala.util.Random(7)
    val pts = mkPoints(Seq.fill(300)(rnd.nextLong(1000000L) * 60L))
    val ivs = mkIntervals(Seq.fill(40) {
      val a = rnd.nextLong(950000L) * 60L
      (a, a + (rnd.nextLong(80000L) + 1L) * 60L)
    })
    val got = RangeJoin.pointsInIntervals(pts, "ts", ivs, "w_start", "w_end",
        bucketMicros = 5000000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.crossJoin(ivs)
      .where($"ts" >= $"w_start" && $"ts" < $"w_end")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("boundary semantics: start inclusive, end exclusive, any bucket phase") {
    for (width <- Seq(10L, 60L, 1000L)) {
      val pts = mkPoints(Seq(100L, 159L, 160L, 99L))
      val ivs = mkIntervals(Seq((100L, 160L)))
      val got = RangeJoin.pointsInIntervals(pts, "ts", ivs,
          "w_start", "w_end", bucketMicros = width)
        .select("pid").as[Long].collect().toSet
      assert(got == Set(0L, 1L), s"width=$width")
    }
  }

  test("no nested-loop or cartesian operator in the bucketized plan") {
    val pts = mkPoints(Seq(1L, 2L))
    val ivs = mkIntervals(Seq((0L, 10L)))
    val plan = RangeJoin.pointsInIntervals(pts, "ts", ivs,
        "w_start", "w_end", bucketMicros = 5L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("keyed variant agrees with the filtered equi-join") {
    val pts = Seq((1L, 5L), (1L, 25L), (2L, 5L)).toDF("k", "us")
      .select($"k", timestamp_micros($"us").as("ts"))
    val ivs = Seq((1L, 0L, 10L), (2L, 20L, 30L)).toDF("k", "a", "b")
      .select($"k", timestamp_micros($"a").as("w_start"),
        timestamp_micros($"b").as("w_end"))
    val got = RangeJoin.pointsInIntervalsKeyed(pts, "ts", "k", ivs,
      "w_start", "w_end").select($"k", unix_micros($"ts"))
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 5L)))
  }
}
