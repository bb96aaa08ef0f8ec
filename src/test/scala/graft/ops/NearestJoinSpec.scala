package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NearestJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("nearest picks the time-closest right row in either direction") {
    val left = Seq((1L, ts(100), 10L, 1.0), (1L, ts(200), 11L, 2.0))
      .toDF("k", "ts", "id", "v")
    val right = Seq((1L, ts(95), 5.0), (1L, ts(198), 6.0), (1L, ts(201), 7.0))
      .toDF("k", "ts", "v")
    val out = NearestJoin.nearest(left, right, "k", "ts", "id", "v", "v")
      .orderBy("left_id").collect()
    // label@100: back=95 (d=5), fwd=198 (d=98) → back
    assert(out(0).getAs[java.sql.Timestamp]("near_ts") == ts(95)
      && out(0).getAs[String]("near_dir") == "b")
    // label@200: back=198 (d=2), fwd=201 (d=1) → fwd
    assert(out(1).getAs[java.sql.Timestamp]("near_ts") == ts(201)
      && out(1).getAs[Double]("near_value") == 7.0
      && out(1).getAs[String]("near_dir") == "f")
  }

  test("equal distance prefers backward; same-ts right row is backward d=0") {
    val left = Seq((1L, ts(100), 1L, 0.0), (2L, ts(50), 2L, 0.0))
      .toDF("k", "ts", "id", "v")
    val right = Seq((1L, ts(90), 1.0), (1L, ts(110), 2.0), (2L, ts(50), 3.0))
      .toDF("k", "ts", "v")
    val out = NearestJoin.nearest(left, right, "k", "ts", "id", "v", "v")
      .orderBy("left_id").collect()
    assert(out(0).getAs[java.sql.Timestamp]("near_ts") == ts(90)
      && out(0).getAs[String]("near_dir") == "b")
    assert(out(1).getAs[java.sql.Timestamp]("near_ts") == ts(50)
      && out(1).getAs[String]("near_dir") == "b")
  }

  test("a key with no right rows yields NULL match; others unaffected") {
    val left = Seq((1L, ts(10), 1L, 0.0), (9L, ts(10), 2L, 0.0))
      .toDF("k", "ts", "id", "v")
    val right = Seq((1L, ts(11), 4.0)).toDF("k", "ts", "v")
    val out = NearestJoin.nearest(left, right, "k", "ts", "id", "v", "v")
      .orderBy("left_id").collect()
    assert(out(0).getAs[String]("near_dir") == "f")
    assert(out(1).isNullAt(out(1).fieldIndex("near_ts"))
      && out(1).isNullAt(out(1).fieldIndex("near_dir")))
  }

  test("tied right rows at one timestamp resolve to the max value both directions") {
    val left = Seq((1L, ts(100), 1L, 0.0), (2L, ts(100), 2L, 0.0))
      .toDF("k", "ts", "id", "v")
    val right = Seq((1L, ts(90), 1.0), (1L, ts(90), 9.0),
      (2L, ts(110), 2.0), (2L, ts(110), 8.0)).toDF("k", "ts", "v")
    val out = NearestJoin.nearest(left, right, "k", "ts", "id", "v", "v")
      .orderBy("left_id").collect()
    assert(out(0).getAs[Double]("near_value") == 9.0)
    assert(out(1).getAs[Double]("near_value") == 8.0)
  }
}
