package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Markov transitions, experiment readout, z-score outliers, and the
  * SCD2 interval lookup composition. */
class MarkovOutlierSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("transitions: hand-counted matrix, rows sum to n_from") {
    // user 1: A B A B ; user 2: A B B
    val ev = Seq((1L, ts(0), 1L, "A"), (1L, ts(1), 2L, "B"),
      (1L, ts(2), 3L, "A"), (1L, ts(3), 4L, "B"),
      (2L, ts(0), 5L, "A"), (2L, ts(1), 6L, "B"), (2L, ts(2), 7L, "B"))
      .toDF("u", "t", "eid", "st")
    val out = Markov.transitions(ev, "u", "t", "eid", "st")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // A->B x3; B->A x1; B->B x1
    assert(out(("A", "B")) === ((3L, 3L, 1.0)))
    assert(out(("B", "A")) === ((1L, 2L, 0.5)))
    assert(out(("B", "B")) === ((1L, 2L, 0.5)))
    assert(out.size === 3)
  }

  test("transitions: tie order broken by the tie column") {
    val ev = Seq((1L, ts(0), 2L, "B"), (1L, ts(0), 1L, "A"))
      .toDF("u", "t", "eid", "st")
    val out = Markov.transitions(ev, "u", "t", "eid", "st").collect()
    assert(out.length === 1)
    assert((out(0).getString(0), out(0).getString(1)) === (("A", "B")))
  }

  test("experiment: assignment is deterministic, partitions units, " +
    "readout sums exactly") {
    val df = (1 to 1000).map(i => (i.toLong, i * 1.0)).toDF("unit", "y")
    val arms = df.select(col("unit"),
      graft.functions.Experiment.armCol(col("unit"), "e1", 2).as("arm"))
    // same unit -> same arm on recompute
    val a2 = df.select(col("unit"),
      graft.functions.Experiment.armCol(col("unit"), "e1", 2).as("arm"))
    assert(arms.collect().toSeq === a2.collect().toSeq)
    // different experiment name reassigns
    val b = df.select(
      graft.functions.Experiment.armCol(col("unit"), "e2", 2).as("arm"))
    assert(arms.select("arm").collect().map(_.getInt(0)).toSeq !==
      b.collect().map(_.getInt(0)).toSeq)
    val out = graft.functions.Experiment.readout(df, "unit", col("y"), "e1")
      .collect()
    assert(out.map(_.getLong(1)).sum === 1000L) // every unit in one arm
    assert(out.map(_.getDouble(3)).sum === (1 to 1000).map(_ * 1.0).sum)
    // roughly balanced halves
    assert(out.forall(r => r.getLong(1) > 400 && r.getLong(1) < 600))
  }

  test("zscore: plants an outlier, leaves tight groups alone") {
    val base = (1 to 99).map(i => ("g1", i.toLong, 100.0 + (i % 3))) :+
      (("g1", 999L, 500.0)) // the planted spike
    val tight = (1 to 50).map(i => ("g2", 2000L + i, 7.0))
    val df = (base ++ tight).toDF("g", "id", "v")
    val out = Outliers.zscore(df, "g", "id", col("v"), zMax = 3.0)
      .collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(999L))
    // zero-variance g2 emitted nothing (sd = 0 guard)
    assert(!out.exists(_.getString(0) == "g2"))
  }

  test("scd2 lookup: purchase sees the state live at its timestamp") {
    val ev = Seq(
      (1L, "view", ts(0), 1L), (1L, "click", ts(10), 2L),
      (1L, "purchase", ts(15), 3L), (1L, "error", ts(20), 4L),
      (1L, "purchase", ts(25), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val iv = Scd2.build(ev.where(col("event_type") =!= "purchase"),
        "user_id", Seq("event_type"), "ts", "event_id")
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from"),
        coalesce(col("valid_to"),
          lit("9999-01-01 00:00:00").cast("timestamp")).as("vt"))
    val pts = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val out = RangeJoin.pointsInIntervalsKeyed(pts, "ts", "user_id",
        iv, "valid_from", "vt")
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("state")).toMap
    assert(out === Map(3L -> "click", 5L -> "error"))
  }

  test("ucb1: pinned mean plus exploration bonus; rare arm gets the " +
    "bigger bonus") {
    val df = (Seq.fill(90)(("a", 10.0)) ++ Seq.fill(10)(("b", 5.0)))
      .toDF("arm", "v")
    val out = graft.functions.Experiment.ucb1(df, "arm", col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val bonusA = math.sqrt(2.0 * math.log(100.0) / 90.0)
    val bonusB = math.sqrt(2.0 * math.log(100.0) / 10.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out("a") === ((90L, 10.0, r6(10.0 + bonusA))))
    assert(out("b") === ((10L, 5.0, r6(5.0 + bonusB))))
    assert(out("b")._3 - 5.0 > out("a")._3 - 10.0) // rare arm explores more
  }

  test("zipfSlope: exact two-point log-log fit has slope -1") {
    val docs = ((1 to 100).map(i => (i.toLong, "aa")) ++
      (101 to 150).map(i => (i.toLong, "bb"))).toDF("doc_id", "text")
    val r = Stats.zipfSlope(docs, "text", topK = 2).collect()(0)
    assert(r.getLong(0) === 2L)
    // freq 100 at rank 1, 50 at rank 2: slope = ln(50/100)/ln 2 = -1
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-5)
    assert(math.abs(r.getDouble(2) - math.log(100.0)) < 1e-5)
  }

  test("pathTrigrams: sliding trigrams per entity, counts and top-k order") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // two users both walk a→b→c→d; one also walks x→y→z
    val rows = Seq(
      (1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"), (1L, ts(3), 3L, "c"),
      (1L, ts(4), 4L, "d"),
      (2L, ts(1), 5L, "a"), (2L, ts(2), 6L, "b"), (2L, ts(3), 7L, "c"),
      (2L, ts(4), 8L, "d"),
      (3L, ts(1), 9L, "x"), (3L, ts(2), 10L, "y"), (3L, ts(3), 11L, "z"))
      .toDF("u", "ts", "id", "e")
    val out = Markov.pathTrigrams(rows.toDF(), "u", "ts", "id", "e", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // (a,b,c) and (b,c,d) twice each; k=2 keeps them in tie-break order
    assert(out.toSeq === Seq(("a", "b", "c", 2L), ("b", "c", "d", 2L)))
  }

  test("pathTrigrams: short sequences emit nothing; no cross-entity chains") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq((1L, ts(1), 1L, "a"), (1L, ts(2), 2L, "b"),
      (2L, ts(3), 3L, "c"))
      .toDF("u", "ts", "id", "e")
    assert(Markov.pathTrigrams(rows.toDF(), "u", "ts", "id", "e", 10)
      .count() === 0L)
  }
}
