package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  test("union coverage merges overlaps and touching intervals; depth sweeps") {
    // key 1: [0,10) ∪ [5,20) ∪ [20,30) merge into one island [0,30);
    //        [40,50) separate. depth peaks at 2 (the 5..10 overlap).
    // key 2: three disjoint; depth 1.
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 20L, 30L), (1L, 40L, 50L),
      (2L, 0L, 1L), (2L, 2L, 3L), (2L, 4L, 5L)
    ).toDF("k", "s", "e")
    val out = Intervals.coverage(iv, "k", "s", "e")
      .orderBy("key").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSeq == Seq(
      (1L, 4L, 2L, 40L, 2L),   // covered = 30 + 10
      (2L, 3L, 3L, 3L, 1L)))
  }

  test("half-open semantics: an interval ending at t does not overlap one starting at t") {
    val iv = Seq((1L, 0L, 10L), (1L, 10L, 20L)).toDF("k", "s", "e")
    val r = Intervals.coverage(iv, "k", "s", "e").collect()(0)
    // touching merges for coverage (one island) but depth never reaches 2
    assert(r.getLong(3) == 20L && r.getLong(2) == 1L && r.getLong(4) == 1L)
  }

  test("identical intervals stack depth") {
    val iv = Seq((1L, 0L, 10L), (1L, 0L, 10L), (1L, 0L, 10L)).toDF("k", "s", "e")
    val r = Intervals.coverage(iv, "k", "s", "e").collect()(0)
    assert(r.getLong(3) == 10L && r.getLong(4) == 3L)
  }
}
