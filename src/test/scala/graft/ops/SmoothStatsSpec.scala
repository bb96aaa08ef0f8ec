package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SmoothStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("ewma is the exact left fold in (ts, id) order, per key") {
    val df = Seq(
      (1L, ts(3), 3L, 8.0), (1L, ts(1), 1L, 4.0), (1L, ts(2), 2L, 0.0),
      (2L, ts(1), 4L, 2.0)
    ).toDF("k", "ts", "id", "v")
    val out = Smooth.ewma(df, "k", "ts", "id", "v", alpha = 0.25)
      .orderBy("key").collect()
    // key 1 ordered values: 4, 0, 8 → e = 4; .25*0+.75*4 = 3; .25*8+.75*3 = 4.25
    assert(out(0).getLong(1) == 3L && out(0).getDouble(2) == 4.25)
    assert(out(1).getLong(1) == 1L && out(1).getDouble(2) == 2.0)
  }

  test("ewma handles many keys across partitions deterministically") {
    val df = (1L to 500L).flatMap(k =>
      Seq((k, ts(1), 1L, 1.0), (k, ts(2), 2L, 3.0)))
      .toDF("k", "ts", "id", "v")
    val out = Smooth.ewma(df, "k", "ts", "id", "v", alpha = 0.25)
    assert(out.count() == 500)
    // every key: .25*3 + .75*1 = 1.5
    assert(out.filter(col("ewma") =!= 1.5).count() == 0)
  }

  test("changePoint: level shift found at the exact split day") {
    // key a: days 1-3 have 1 event, days 4-6 have 9 → split after day 3
    val rows = (1 to 3).flatMap(d => Seq((("a"), ts(d * 86400L)))) ++
      (4 to 6).flatMap(d => Seq.fill(9)((("a"), ts(d * 86400L))))
    val out = Smooth.changePoint(rows.toDF("k", "ts"), "k", "ts")
      .collect()(0)
    assert(out.getAs[Long]("n_days") === 6L)
    assert(out.getAs[Double]("left_mean") === 1.0)
    assert(out.getAs[Double]("right_mean") === 9.0)
    assert(out.getAs[Double]("gap") === 8.0)
    assert(out.getAs[java.sql.Date]("split_day").toString ===
      new java.sql.Date(3 * 86400L * 1000L).toString)
  }

  test("changePoint: flat series picks the earliest split with gap 0") {
    val rows = (1 to 4).map(d => ("a", ts(d * 86400L)))
    val out = Smooth.changePoint(rows.toDF("k", "ts"), "k", "ts")
      .collect()(0)
    assert(out.getAs[Double]("gap") === 0.0)
    assert(out.getAs[java.sql.Date]("split_day").toString ===
      new java.sql.Date(86400L * 1000L).toString)
  }

  test("holt: hand fold — level tracks, trend learns the slope") {
    // key 1 values 1, 2, 3 in order; α=β=1/4, l1=1, b1=0:
    // l2=.25*2+.75*1=1.25 ; b2=.25*(1.25-1)=0.0625
    // l3=.25*3+.75*(1.25+.0625)=1.734375 ; b3=.25*(1.734375-1.25)+.75*.0625=0.16796875
    val df = Seq((1L, ts(1), 1L, 1.0), (1L, ts(2), 2L, 2.0),
      (1L, ts(3), 3L, 3.0)).toDF("k", "ts", "id", "v")
    val r = Smooth.holt(df, "k", "ts", "id", "v").collect()(0)
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 1.734375)
    assert(r.getDouble(3) === 0.167969) // rounded 6
    assert(r.getDouble(4) === 1.902344) // l + b rounded 6
  }

  test("holt: rising series forecasts above a plain ewma's level") {
    val df = (1 to 20).map(i => (1L, ts(i.toLong), i.toLong, i.toDouble))
      .toDF("k", "ts", "id", "v")
    val h = Smooth.holt(df, "k", "ts", "id", "v").collect()(0)
    val e = Smooth.ewma(df, "k", "ts", "id", "v").collect()(0)
    assert(h.getDouble(3) > 0)                 // learned positive trend
    assert(h.getDouble(4) > e.getDouble(2))    // forecast > lagging ewma
  }

  test("cusum: accumulation, alarm + reset, first-alarm time, peak stat") {
    // target+slack = 10; h = 15. xs: 20 (s=10), 18 (s=18 > 15 → alarm,
    // reset), 5 (s=0), 30 (s=20 > 15 → alarm), 2 (s=0) ⇒ 2 alarms,
    // first at the SECOND event (ts=2s), peak 20
    val df = Seq(
      (1L, ts(1), 1L, 20.0), (1L, ts(2), 2L, 18.0), (1L, ts(3), 3L, 5.0),
      (1L, ts(4), 4L, 30.0), (1L, ts(5), 5L, 2.0),
      (2L, ts(1), 6L, 1.0)
    ).toDF("k", "ts", "id", "v")
    val out = Smooth.cusum(df, "k", "ts", "id", "v",
        target = 8.0, slack = 2.0, h = 15.0)
      .orderBy("key").collect()
    val r1 = out(0)
    assert(r1.getLong(1) == 5L && r1.getLong(2) == 2L)
    assert(r1.getLong(3) == 2000L) // second event's ts in ms
    assert(r1.getDouble(4) == 20.0)
    val r2 = out(1)
    assert(r2.getLong(2) == 0L && r2.isNullAt(3) && r2.getDouble(4) == 0.0)
  }

  test("ols2 recovers exact coefficients on noise-free linear data, r2 = 1") {
    val rows = for { x1 <- 1 to 20; x2 <- 1 to 5 }
      yield (x1.toDouble, x2.toDouble, 3.0 + 2.0 * x1 - 4.0 * x2)
    val df = rows.toDF("x1", "x2", "y")
    val r = Stats.ols2(df, "y", "x1", "x2").collect()(0)
    assert(r.getLong(0) == 100L)
    assert(r.getDouble(1) == 3.0 && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == -4.0 && r.getDouble(4) == 1.0)
  }

  test("ols2 degenerate design (constant predictor) yields NULL coefficients") {
    val df = Seq((1.0, 2.0, 3.0), (2.0, 2.0, 5.0), (3.0, 2.0, 7.0))
      .toDF("x1", "x2", "y")
    val r = Stats.ols2(df, "y", "x1", "x2").collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(4))
  }
}
