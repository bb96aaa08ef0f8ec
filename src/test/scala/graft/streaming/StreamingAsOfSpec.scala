package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The global watermark is the MIN across both input streams, so every test
  * advances BOTH streams (sentinel rows on entity 99 / Long.MaxValue) to
  * flush pending labels, and the replay test feeds each stream in event-time
  * order (two ordered chunks) so nothing is watermark-late — matching the
  * no-late-data batch oracle. */
class StreamingAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("stream-stream as-of is event-time correct across out-of-order batches") {
    implicit val sq = spark.sqlContext
    val featIn = MemoryStream[(Long, Double, Timestamp)]
    val lblIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingAsOf.asOfStream(spark,
      lblIn.toDF().toDF("entity", "value", "ts"),
      featIn.toDF().toDF("entity", "value", "ts"), "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      // batch 1: a label at t=100 and an EARLIER feature at t=90; the label
      // must NOT emit yet — a late feature inside the watermark could still
      // precede it.
      featIn.addData((1L, 10.0, ts(90)))
      lblIn.addData((1L, 5.0, ts(100)))
      q.processAllAvailable()
      assert(spark.table("asof_out").filter($"entity" === 1L).count() == 0)
      // batch 2: the late-but-in-watermark feature at t=95 arrives, plus
      // far-future sentinels on BOTH streams to push the min-watermark past
      // the label. The label must join to t=95 (event time), not t=90
      // (arrival order).
      featIn.addData((1L, 20.0, ts(95)), (99L, 0.0, ts(1000)))
      lblIn.addData((99L, 0.0, ts(1000)))
      q.processAllAvailable()
      // event-time timeout flush needs the watermark to advance once more
      featIn.addData((99L, 0.0, ts(1100)))
      lblIn.addData((99L, 0.0, ts(1100)))
      q.processAllAvailable()
      val got = spark.table("asof_out").filter($"entity" === 1L)
        .select("entity", "label", "feature").as[(Long, Double, Option[Double])]
        .collect().toSet
      assert(got == Set((1L, 5.0, Some(20.0))))
    } finally q.stop()
  }

  test("labels with no preceding feature emit NULL feature") {
    implicit val sq = spark.sqlContext
    val featIn = MemoryStream[(Long, Double, Timestamp)]
    val lblIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingAsOf.asOfStream(spark,
      lblIn.toDF().toDF("entity", "value", "ts"),
      featIn.toDF().toDF("entity", "value", "ts"), "10 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_out2").start()
    try {
      lblIn.addData((1L, 1.0, ts(10)))          // no feature before it
      featIn.addData((1L, 7.0, ts(50)))         // after that label
      lblIn.addData((1L, 2.0, ts(60)))          // joins to the t=50 feature
      q.processAllAvailable()
      featIn.addData((99L, 0.0, ts(200)))       // watermark push, both streams
      lblIn.addData((99L, 0.0, ts(200)))
      q.processAllAvailable()
      featIn.addData((99L, 0.0, ts(300)))       // timeout flush trigger
      lblIn.addData((99L, 0.0, ts(300)))
      q.processAllAvailable()
      val got = spark.table("asof_out2").filter($"entity" === 1L)
        .select("label", "feature").as[(Double, Option[Double])].collect().toSet
      assert(got == Set((1.0, None), (2.0, Some(7.0))))
    } finally q.stop()
  }

  test("streaming as-of equals the batch as-of join on replayed event data") {
    implicit val sq = spark.sqlContext
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
    val feats = ev.filter($"event_type" === "click")
      .select($"user_id".as("entity"), $"value", $"ts")
      .as[(Long, Double, Timestamp)].collect().sortBy(_._3.getTime)
    val lbls = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("entity"), $"value", $"ts")
      .as[(Long, Double, Timestamp)].collect().sortBy(_._3.getTime)
    val maxTs = (feats ++ lbls).map(_._3.getTime).max

    val featIn = MemoryStream[(Long, Double, Timestamp)]
    val lblIn = MemoryStream[(Long, Double, Timestamp)]
    val joined = StreamingAsOf.asOfStream(spark,
      lblIn.toDF().toDF("entity", "value", "ts"),
      featIn.toDF().toDF("entity", "value", "ts"), "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("asof_out3").start()
    try {
      // event-time-ordered halves per stream: nothing is watermark-late
      val (f1, f2) = feats.splitAt(feats.length / 2)
      val (l1, l2) = lbls.splitAt(lbls.length / 2)
      featIn.addData(f1.toSeq); lblIn.addData(l1.toSeq)
      q.processAllAvailable()
      featIn.addData(f2.toSeq); lblIn.addData(l2.toSeq)
      q.processAllAvailable()
      featIn.addData((Long.MaxValue, 0.0, new Timestamp(maxTs + 3600_000L)))
      lblIn.addData((Long.MaxValue, 0.0, new Timestamp(maxTs + 3600_000L)))
      q.processAllAvailable()
      featIn.addData((Long.MaxValue, 0.0, new Timestamp(maxTs + 7200_000L)))
      lblIn.addData((Long.MaxValue, 0.0, new Timestamp(maxTs + 7200_000L)))
      q.processAllAvailable()

      val streamed = spark.table("asof_out3")
        .filter($"entity" =!= Long.MaxValue)
        .select($"entity", $"ts", $"label", $"feature")
        .as[(Long, Timestamp, Double, Option[Double])].collect()
        .map { case (e, t, l, f) => (e, t.getTime, l, f) }
      // batch oracle: latest click at-or-before each purchase (ts DESC, value DESC)
      val featByEntity = feats.groupBy(_._1)
      val expected = lbls.map { case (e, lval, lts) =>
        val best = featByEntity.getOrElse(e, Array.empty)
          .filter(_._3.getTime <= lts.getTime)
          .sortBy { case (_, v, t) => (-t.getTime, -v) }.headOption
        (e, lts.getTime, lval, best.map(_._2))
      }
      assert(streamed.sorted.toSeq == expected.sorted.toSeq)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
