package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Profile

/** The mergeable quantile sketch: order-independent under any partitioning,
  * rank error within the DKW-style bound, exact when k >= group size. */
class BottomKSpec extends SparkSpec {
  import spark.implicits._

  private def skewedRows(n: Int) = Seq.tabulate(n) { i =>
    // deterministic long-tailed values: mostly small, occasional spikes
    val v = if (i % 97 == 0) 1000.0 + i % 13 else (i % 50) + (i % 7) * 0.1
    (i.toLong, if (i % 3 == 0) "a" else "b", v)
  }

  test("sketch quantiles land within the sample rank-error bound") {
    val df = skewedRows(50000).toDF("id", "grp", "v")
    val got = Profile.sketchQuantiles(df, "grp", "v", "id", k = 1024)
      .collect().map(r => r.getString(0) -> r).toMap
    // exact rank of the sketch's p50/p90 within each group must be near q
    for (g <- Seq("a", "b"); (q, name) <- Seq(0.5 -> "p50", 0.9 -> "p90")) {
      val vals = skewedRows(50000).filter(_._2 == g).map(_._3).sorted
      val pick = got(g).getDouble(got(g).fieldIndex(name))
      // rank range of `pick` in the exact data (ties make it a range)
      val lo = vals.count(_ < pick).toDouble / vals.size
      val hi = vals.count(_ <= pick).toDouble / vals.size
      assert(lo - 0.06 <= q && q <= hi + 0.06,
        s"group $g $name=$pick exact-rank [$lo,$hi] vs q=$q")
    }
    assert(got("a").getLong(got("a").fieldIndex("sample_n")) == 1024L)
  }

  test("sample is partitioning-independent (order-independent merge)") {
    val rows = skewedRows(20000)
    def run(parts: Int) =
      Profile.sketchQuantiles(rows.toDF("id", "grp", "v").repartition(parts),
        "grp", "v", "id", k = 512)
        .collect().map(r => (r.getString(0),
          (1 to 4).map(i => r.getDouble(r.fieldIndex(Seq("p25", "p50", "p90", "p99")(i - 1)))))).toMap
    assert(run(1) == run(13))
    assert(run(13) == run(32))
  }

  test("k >= n degrades to exact nearest-rank") {
    val df = Seq.tabulate(100)(i => (i.toLong, "g", i.toDouble))
      .toDF("id", "grp", "v")
    val got = Profile.sketchQuantiles(df, "grp", "v", "id", k = 1024)
      .collect().head
    // sample == full data: picks are the exact nearest-rank values
    assert(got.getLong(got.fieldIndex("sample_n")) == 100L)
    assert(got.getDouble(got.fieldIndex("p50")) == 49.0) // rank ceil(.5*100)=50 -> value 49
    assert(got.getDouble(got.fieldIndex("p99")) == 98.0)
  }
}
