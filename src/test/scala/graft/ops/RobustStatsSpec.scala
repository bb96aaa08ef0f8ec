package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Winsorization, MAD outliers, and RFM segmentation. */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize: nearest-rank p5/p95 bounds clamp the tails only") {
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp", "v")
    val out = Normalize.winsorize(df, "id", "grp", col("v"), 5, 95)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // rank ceil(100*5/100)=5 -> lo=5 ; ceil(100*95/100)=95 -> hi=95
    assert(out(1L) === ((1.0, 5.0, 95.0, 5.0)))
    assert(out(100L) === ((100.0, 5.0, 95.0, 95.0)))
    assert(out(50L) === ((50.0, 5.0, 95.0, 50.0)))
    assert(out(5L) === ((5.0, 5.0, 95.0, 5.0)))   // boundary kept
    assert(out(95L) === ((95.0, 5.0, 95.0, 95.0)))
  }

  test("winsorize: singleton group clamps to itself") {
    val df = Seq((1L, "g", 42.0)).toDF("id", "grp", "v")
    val r = Normalize.winsorize(df, "id", "grp", col("v"), 5, 95)
      .collect()(0)
    assert((r.getDouble(3), r.getDouble(4), r.getDouble(5)) ===
      ((42.0, 42.0, 42.0)))
  }

  test("madOutliers: hand case — only the far point flags") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 100.0))
      .map { case (id, v) => ("g", id, v) }.toDF("grp", "id", "v")
    val out = Outliers.madOutliers(df, "grp", "id", col("v"), k = 6)
      .collect()
    // med = 3 (rank 3 of 5); devs sorted [0,1,1,2,97] -> mad = 1
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 5L)
    assert((r.getDouble(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5)) === ((100.0, 3.0, 1.0, 97.0)))
  }

  test("madOutliers: zero MAD suppresses flags (majority-constant group)") {
    val df = Seq(5.0, 5.0, 5.0, 5.0, 9.0).zipWithIndex
      .map { case (v, i) => ("g", i.toLong, v) }.toDF("grp", "id", "v")
    assert(Outliers.madOutliers(df, "grp", "id", col("v"), k = 6)
      .count() === 0L)
  }

  private def rfmFixture = {
    val rows = for {
      (cust, k) <- Seq("A" -> 1, "B" -> 2, "C" -> 3, "D" -> 4, "E" -> 5)
      i <- 1 to k
    } yield (cust, s"2020-01-0$i 00:00:00", 10.0 * k / k, k * 10.0 / k)
    rows.map { case (c, ts, _, _) =>
      (c, ts, 10.0) }.toDF("cust", "tss", "amount")
      .withColumn("ts", to_timestamp(col("tss")))
  }

  test("rfm: quintile scores and inverted recency on a hand ladder") {
    // cust A..E: k orders, last day 2020-01-0k, amount 10 each
    val out = Behavior.rfm(rfmFixture, "cust", "ts", col("amount"), 5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
      .toMap
    // asOf = 2020-01-05; recency A=4 .. E=0; freq/monetary ladder up
    assert(out("A") === ((4L, 1L, 10.0, 1L, 1L, 1L, "111")))
    assert(out("C") === ((2L, 3L, 30.0, 3L, 3L, 3L, "333")))
    assert(out("E") === ((0L, 5L, 50.0, 5L, 5L, 5L, "555")))
  }

  test("rfm: partitioning-independent") {
    val a = Behavior.rfm(rfmFixture, "cust", "ts", col("amount"), 5)
      .orderBy("cust").collect().toSeq
    val b = Behavior.rfm(rfmFixture.repartition(7), "cust", "ts",
      col("amount"), 5).orderBy("cust").collect().toSeq
    assert(a === b)
  }
}
