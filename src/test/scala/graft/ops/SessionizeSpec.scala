package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("boundary rule: an event at exactly prev+gap EXTENDS the session") {
    // events at 0, +30min exactly, +30min+1us, +90min (gap = 30min):
    // touching sessions merge, so the first three share one session
    val df = Seq(0L, 1800000000L, 1800000001L, 5400000000L)
      .map(us => (1L, us, 1.0)).toDF("user_id", "us", "value")
      .withColumn("ts", expr("timestamp_micros(us)"))
    val out = Sessionize.sessionStats(df, "user_id", "ts", "value", "30 minutes")
      .orderBy("session_start_ms")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((0L, 3L), (5400000L, 1L)))
  }

  test("matches a hand gaps-and-islands fold on real events") {
    val ev = graft.sources.Readers.eventsNormalized(spark, sf001)
      .select(col("user_id"), col("ts"), col("value"))
    val got = Sessionize.sessionStats(ev, "user_id", "ts", "value", "30 minutes")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference fold
    val rows = ev.select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ref = rows.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.map(_._2).sorted
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (acc, t) if acc.nonEmpty && t - acc.head.head <= 1800000000L =>
          (t :: acc.head) :: acc.tail
        case (acc, t) => List(t) :: acc
      }
      sessions.map(s => (u, s.min / 1000) -> s.length.toLong)
    }.toMap
    assert(got == ref)
  }
}
