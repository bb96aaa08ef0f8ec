package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Kaplan–Meier estimation and the Pearson correlation matrix. */
class SurvivalStatsSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")

  test("durations: first start to first later event; censoring") {
    val ev = Seq(
      (1L, "signup", day(1)), (1L, "purchase", day(3)),
      (1L, "purchase", day(5)), // later purchase ignored
      (2L, "signup", day(2)), // never converts -> censored
      (3L, "purchase", day(1)), (3L, "signup", day(2)), // pre-start ignored
      (3L, "purchase", day(4)))
      .toDF("u", "typ", "t")
    val out = Survival.durations(ev, "u", "t", "typ", "signup", "purchase",
        lit("2024-01-10 00:00:00").cast("timestamp"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(out === Map(1L -> ((2L, true)), 2L -> ((8L, false)),
      3L -> ((2L, true))))
  }

  test("kaplanMeier: textbook small case incl. the absorbing zero") {
    // durations: deaths at t=1 (1 of 4) and t=3 (1 of 2); censor at t=2;
    // final death at t=5 takes the last at-risk subject -> km hits 0
    val dur = Seq((1L, true), (2L, false), (3L, true), (5L, true))
      .map { case (t, o) => (t, o) }.toDF("duration", "observed")
    val out = Survival.kaplanMeier(dur)
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // t=1: n=4, d=1 -> 0.75 ; t=3: n=2, d=1 -> 0.375 ; t=5: n=1, d=1 -> 0
    assert(out.map(x => (x._1, x._2, x._3)).toSeq ===
      Seq((1L, 1L, 4L), (3L, 1L, 2L), (5L, 1L, 1L)))
    assert(math.abs(out(0)._4 - 0.75) < 1e-6)
    assert(math.abs(out(1)._4 - 0.375) < 1e-6)
    assert(out(2)._4 === 0.0)
  }

  test("corrMatrix: perfect, inverse, and zero-variance columns") {
    val df = (1 to 10).map(i =>
      (i.toDouble, 2.0 * i + 1, -3.0 * i, 7.0)).toDF("a", "b", "c", "d")
    val out = Stats.corrMatrix(df, Seq("a", "b", "c", "d"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(("a", "b")) === Some(1.0))
    assert(out(("a", "c")) === Some(-1.0))
    assert(out(("a", "d")) === None) // zero variance -> NULL, no blow-up
    assert(out.size === 6)
  }

  test("corrMatrix is partitioning-independent (decimal sums)") {
    val li = graft.sources.Readers.parquet(spark, s"$sf001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val a = Stats.corrMatrix(li.repartition(1), cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.get(3)).toMap
    val b = Stats.corrMatrix(li.repartition(7), cols).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.get(3)).toMap
    assert(a === b)
  }
}
