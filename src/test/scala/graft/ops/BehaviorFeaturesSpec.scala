package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hour profiles, activity trends, and posting-list builds. */
class BehaviorFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def at(day: Int, h: Int) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("hourProfile: histogram, entropy, night share") {
    val ev = Seq((1L, at(1, 0)), (1L, at(1, 0)), (1L, at(2, 12)),
      (1L, at(3, 12)), (2L, at(1, 23))).toDF("u", "t")
    val out = Behavior.hourProfile(ev, "u", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val (n1, csv1, ent1, night1) = out(1L)
    assert(n1 === 4L)
    assert(csv1.split(",").map(_.toLong).toSeq ===
      (Seq(2L) ++ Seq.fill(11)(0L) ++ Seq(2L) ++ Seq.fill(11)(0L)))
    assert(math.abs(ent1 - math.log(2)) < 1e-6) // 2 hours, equal mass
    assert(night1 === 0.5) // the two 00:00 events
    val (n2, _, ent2, night2) = out(2L)
    assert((n2, ent2, night2) === ((1L, 0.0, 0.0)))
  }

  test("activityTrend: exact OLS slope; single-day entity is NULL") {
    // u1: counts 1,2,3 on consecutive days -> slope exactly 1
    val ev = (Seq((1L, at(1, 9))) ++ Seq.fill(2)((1L, at(2, 9))) ++
      Seq.fill(3)((1L, at(3, 9))) ++ Seq((2L, at(5, 9)))).toDF("u", "t")
    val out = Behavior.activityTrend(ev, "u", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(out(1L) === ((3L, Some(1.0))))
    assert(out(2L) === ((1L, None))) // degenerate fit
  }

  test("postings: sorted ids, aligned tfs, df cap, bigram mode") {
    val docs = Seq(
      (3L, "alpha beta alpha beta"), (1L, "alpha beta gamma"),
      (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val uni = graft.functions.Postings.build(docs, "doc_id", "text",
        maxDf = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Long](3), r.getSeq[Long](4))).toMap
    // "alpha" (df 3) capped out; beta df 2 in docs 1 and 3
    assert(!uni.contains("alpha"))
    assert(uni("beta") === ((2L, Seq(1L, 3L), Seq(1L, 2L))))
    assert(uni("gamma") === ((1L, Seq(1L), Seq(1L))))
    val bi = graft.functions.Postings.build(docs, "doc_id", "text",
        maxDf = 10, ngram = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](3)).toMap
    assert(bi("alpha beta") === Seq(1L, 3L))
    assert(bi("beta alpha") === Seq(3L))
  }

  test("decayFeatures: half-life weights — today 1, one half-life 0.5") {
    import org.apache.spark.sql.functions.to_timestamp
    val df = Seq((1L, "2024-01-08 12:00:00", 10.0),
      (1L, "2024-01-01 09:00:00", 20.0))
      .toDF("u", "tss", "v")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = Behavior.decayFeatures(df, "u", "ts", col("v"),
      halfLifeDays = 7).collect()(0)
    assert(r.getAs[Long]("n_events") === 2L)
    assert(r.getAs[Double]("decayed_count") === 1.5)
    assert(r.getAs[Double]("decayed_value") === 20.0) // 10·1 + 20·0.5
  }

  test("seasonalDow: observed-day means and factors; dow 0 is Monday") {
    import org.apache.spark.sql.functions.to_timestamp
    // Mondays 2024-01-01 (2 ev) + 2024-01-08 (4 ev); Tuesday 01-02 (3 ev)
    val rows = Seq.fill(2)("2024-01-01 10:00:00") ++
      Seq.fill(4)("2024-01-08 11:00:00") ++
      Seq.fill(3)("2024-01-02 09:00:00")
    val df = rows.map(("a", _)).toDF("g", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Behavior.seasonalDow(df, "g", "ts")
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // dow 0 (Mon): 2 days, 6 events, mean 3; dow 1 (Tue): 1 day, 3, mean 3
    // overall mean over 3 observed days = 3 → factors 1.0
    assert(out(0L) === ((2L, 6L, 3.0, 1.0)))
    assert(out(1L) === ((1L, 3L, 3.0, 1.0)))
  }

  test("seasonalDow: a heavy weekday lifts its factor above 1") {
    import org.apache.spark.sql.functions.to_timestamp
    val rows = Seq.fill(9)("2024-01-01 10:00:00") ++ // Monday: 9
      Seq.fill(1)("2024-01-02 10:00:00") ++          // Tuesday: 1
      Seq.fill(2)("2024-01-03 10:00:00")             // Wednesday: 2
    val df = rows.map(("a", _)).toDF("g", "tss")
      .withColumn("ts", to_timestamp(col("tss")))
    val out = Behavior.seasonalDow(df, "g", "ts")
      .collect().map(r => r.getLong(1) -> r.getDouble(5)).toMap
    assert(out(0L) === 2.25)   // 9 / 4
    assert(out(1L) === 0.25)
    assert(out(2L) === 0.5)
  }
}
