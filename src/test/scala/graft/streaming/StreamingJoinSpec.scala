package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("interval join emits exactly the in-window pairs, half-open end") {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(Long, Double, Timestamp)]
    val rIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingJoin.intervalJoin(
      lIn.toDF().toDF("entity", "value", "ts"),
      rIn.toDF().toDF("entity", "value", "ts"),
      delayThreshold = "1 hour", lenSeconds = 600L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out").start()
    try {
      // left @100; rights at 100 (in), 105 (in), 110 (boundary: OUT —
      // half-open), 95 (before: out), different entity (out)
      lIn.addData((1L, 1.0, ts(100)))
      rIn.addData((1L, 10.0, ts(100)), (1L, 20.0, ts(105)),
        (1L, 30.0, ts(110)), (1L, 40.0, ts(95)), (2L, 50.0, ts(101)))
      q.processAllAvailable()
      val got = spark.table("ij_out")
        .select("entity", "r_value").as[(Long, Double)].collect().toSet
      assert(got == Set((1L, 10.0), (1L, 20.0)))
      // out-of-order left arriving later still joins (inside watermark)
      lIn.addData((2L, 2.0, ts(96)))
      q.processAllAvailable()
      val got2 = spark.table("ij_out")
        .select("entity", "r_value").as[(Long, Double)].collect().toSet
      assert(got2 == Set((1L, 10.0), (1L, 20.0), (2L, 50.0)))
    } finally q.stop()
  }

  test("left-outer: unmatched left emits NULLs only after the watermark proves it") {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(Long, Double, Timestamp)]
    val rIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingJoin.intervalJoin(
      lIn.toDF().toDF("entity", "value", "ts"),
      rIn.toDF().toDF("entity", "value", "ts"),
      delayThreshold = "10 minutes", lenSeconds = 600L,
      joinType = "leftOuter")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ijo_out").start()
    try {
      // left @100 with a match; left @200 with none
      lIn.addData((1L, 1.0, ts(100)), (1L, 2.0, ts(200)))
      rIn.addData((1L, 10.0, ts(105)))
      q.processAllAvailable()
      // the unmatched row must NOT have emitted yet: watermark still below
      // 200 + 10min + delay
      val early = spark.table("ijo_out")
        .filter($"l_value" === 2.0).count()
      assert(early == 0, "outer null emitted before the watermark allowed it")
      // push the watermark far past l.ts + len on BOTH streams
      lIn.addData((99L, 0.0, ts(1000)))
      rIn.addData((99L, 0.0, ts(1000)))
      q.processAllAvailable()
      val got = spark.table("ijo_out").filter($"entity" === 1L)
        .select("l_value", "r_value").as[(Double, Option[Double])]
        .collect().toSet
      assert(got == Set((1.0, Some(10.0)), (2.0, None)))
    } finally q.stop()
  }

  test("every pair emits once across multi-batch replay (no dup, no loss)") {
    implicit val sq = spark.sqlContext
    val lIn = MemoryStream[(Long, Double, Timestamp)]
    val rIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingJoin.intervalJoin(
      lIn.toDF().toDF("entity", "value", "ts"),
      rIn.toDF().toDF("entity", "value", "ts"),
      delayThreshold = "10 hours", lenSeconds = 3600L)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ij_out2").start()
    try {
      for (b <- 0 until 3) {
        lIn.addData((1L, b.toDouble, ts(100 + b * 10)))
        rIn.addData((1L, 100.0 + b, ts(105 + b * 10)))
        q.processAllAvailable()
      }
      // batch oracle: all (l, r) with r.ts in [l.ts, l.ts+60min)
      val ls = Seq(0 -> 100L, 1 -> 110L, 2 -> 120L)
      val rs = Seq(100.0 -> 105L, 101.0 -> 115L, 102.0 -> 125L)
      val want = (for {
        (lv, lt) <- ls; (rv, rt) <- rs
        if rt >= lt && rt < lt + 60
      } yield (lv.toDouble, rv)).toSet
      val got = spark.table("ij_out2")
        .select("l_value", "r_value").as[(Double, Double)].collect()
      assert(got.length == got.toSet.size, "duplicate pairs emitted")
      assert(got.toSet == want)
    } finally q.stop()
  }
}
