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

  test("sessionExport: ordered paths, gap break, touching event merges") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val gap = 1800L
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(10), 2L, "click"),
      (1L, ts(10 + gap), 3L, "cart"),        // exactly gap later: merges
      (1L, ts(10 + gap + gap + 1), 4L, "purchase")) // gap+1: breaks
      .toDF("u", "ts", "id", "e")
    val out = Sessionize.sessionExport(rows, "u", "ts", "id", "e", gap)
      .orderBy("session_start_ms").collect()
    assert(out.length === 2)
    assert(out(0).getAs[String]("path") === "view->click->cart")
    assert(out(0).getAs[Long]("n_events") === 3L)
    assert(out(0).getAs[Long]("duration_ms") === (10 + gap) * 1000L)
    assert(out(1).getAs[String]("path") === "purchase")
    assert(out(1).getAs[Long]("duration_ms") === 0L)
  }
}
