package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K6 wide upsert with schema evolution + X3 split-serving protocol. */
class WideUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("upsertWide folds newer values and grows the schema for new features") {
    val snapTriples = Seq(
      (1L, "a", 10.0, ts(100)), (1L, "b", 20.0, ts(100)),
      (2L, "a", 30.0, ts(100)))
      .toDF("entity", "feature", "value", "ts")
    val snap = Materialize.wideSnapshot(snapTriples, Seq("a", "b"))
    assert(snap.columns.toSeq == Seq("entity", "a", "a__ts", "b", "b__ts"))

    val updates = Seq(
      (1L, "a", 11.0, ts(200)),  // newer → wins
      (2L, "a", 29.0, ts(50)),   // older → loses
      (2L, "c", 99.0, ts(150)),  // NEW feature → new column
      (3L, "b", 42.0, ts(100)))  // NEW entity
      .toDF("entity", "feature", "value", "ts")

    val out = Materialize.upsertWide(snap, updates)
    assert(out.columns.toSeq ==
      Seq("entity", "a", "a__ts", "b", "b__ts", "c", "c__ts"))
    val byEntity = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byEntity(1L).getDouble(1) == 11.0) // a updated
    assert(byEntity(1L).getDouble(3) == 20.0) // b kept
    assert(byEntity(2L).getDouble(1) == 30.0) // older update ignored
    assert(byEntity(2L).getDouble(5) == 99.0) // new feature cell
    assert(byEntity(3L).isNullAt(1) && byEntity(3L).getDouble(3) == 42.0)
  }

  test("meltWide inverts wideSnapshot (non-null cells)") {
    val triples = Seq((1L, "x", 1.0, ts(10)), (2L, "y", 2.0, ts(20)))
      .toDF("entity", "feature", "value", "ts")
    val back = Materialize.meltWide(Materialize.wideSnapshot(triples, Seq("x", "y")))
      .orderBy("entity").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "x", 1.0), (2L, "y", 2.0)))
  }

  test("SplitSession: paired iterators partition exactly and replay identically") {
    val df = spark.range(1000).select($"id", (rand(1) * 10).as("v"))
    val sess = new SplitSession(df, Seq("id"), testSize = 0.3, seed = 9L).initialize()
    try {
      val train1 = sess.train().map(_.getLong(0)).toSet
      val test1 = sess.test().map(_.getLong(0)).toSet
      assert(train1.intersect(test1).isEmpty)
      assert(train1.size + test1.size == 1000)
      assert(math.abs(test1.size / 1000.0 - 0.3) < 0.05)
      // deterministic replay
      assert(sess.train().map(_.getLong(0)).toSet == train1)
      assert(sess.test().map(_.getLong(0)).toSet == test1)
    } finally sess.close()
  }
}
