package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: rows, nulls, exact NDV, min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(20))
    ).toDF("id", "s", "n")
    val p = Profile.columnProfile(df, Seq("id", "s", "n")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("n") == ((4L, 1L, 2L, "10", "20")))
  }

  test("output order follows the requested column order") {
    val df = Seq((1, 2)).toDF("x", "y")
    val names = Profile.columnProfile(df, Seq("y", "x")).collect().map(_.getString(0))
    assert(names.toSeq == Seq("y", "x"))
  }

  test("numericProfile: nearest-rank percentiles per group") {
    import org.apache.spark.sql.functions._
    // group g: values 1..100 → rank ceil(q·100): p25=25, p50=50, p90=90, p99=99
    val df = (1 to 100).map(i => ("g", i)).toDF("grp0", "v0")
      .select(col("grp0"), col("v0").cast("decimal(18,2)").as("v"))
    val r = Profile.numericProfile(df, "grp0", "v").collect().head
    assert(r.getString(0) == "g")
    assert(r.getLong(1) == 100L)
    assert(r.getDouble(2) == 1.0)   // min
    assert(r.getDouble(3) == 25.0)  // p25
    assert(r.getDouble(4) == 50.0)  // p50
    assert(r.getDouble(5) == 90.0)  // p90
    assert(r.getDouble(6) == 99.0)  // p99
    assert(r.getDouble(7) == 100.0) // max
  }

  test("numericProfile: singleton group collapses every percentile to it") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", 7)).toDF("grp0", "v0")
      .select(col("grp0"), col("v0").cast("decimal(18,2)").as("v"))
    val r = Profile.numericProfile(df, "grp0", "v").collect().head
    assert((2 to 7).forall(i => r.getDouble(i) == 7.0))
  }

  test("freshnessProfile: staleness ranks against the table's own as-of") {
    import org.apache.spark.sql.functions._
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // as-of = minute 100; latest per entity: a1@100 (0m), a2@40 (60m),
    // a3@10 (90m); entity a1 has an older event that must not count
    val df = Seq(("f", 1L, ts(100)), ("f", 1L, ts(5)), ("f", 2L, ts(40)),
      ("f", 3L, ts(10))).toDF("g", "e", "ts")
    val r = Profile.freshnessProfile(df, "g", "e", "ts").collect()(0)
    assert(r.getAs[Long]("n_entities") === 3L)
    // ranks over staleness [0, 60, 90]: p50 rank 2 → 60, p90 rank 3 → 90
    assert(r.getAs[Long]("p50_stale_min") === 60L)
    assert(r.getAs[Long]("p90_stale_min") === 90L)
  }

  test("weightedMedian: heavy weight drags the median; unit weights " +
    "reduce to the lower median") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "a", 1.0, 1.0), (2L, "a", 2.0, 1.0),
      (3L, "a", 3.0, 1.0), (4L, "a", 4.0, 10.0)).toDF("id", "g", "v", "w")
    val r = Profile.weightedMedian(df, "g", col("v"), col("w"), "id")
      .collect()(0)
    // W = 13: cum 1,2,3,13 → first 2·cum ≥ 13 is v = 4
    assert(r.getAs[Double]("wmedian") === 4.0)
    assert(r.getAs[Double]("total_w") === 13.0)
    val unit = Seq((1L, "a", 10.0, 1.0), (2L, "a", 20.0, 1.0),
      (3L, "a", 30.0, 1.0), (4L, "a", 40.0, 1.0)).toDF("id", "g", "v", "w")
    // even n: lower median = value at 2·cum ≥ 4 → 20
    assert(Profile.weightedMedian(unit, "g", col("v"), col("w"), "id")
      .collect()(0).getAs[Double]("wmedian") === 20.0)
  }
}
