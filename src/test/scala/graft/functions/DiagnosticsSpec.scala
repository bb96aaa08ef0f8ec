package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Join-size estimation, gram novelty, and the pre-flight diagnostics. */
class DiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  test("joinSizeEstimate never undercounts and is exact when width >> keys") {
    val a = (1L to 50L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k)).toDF("k")
    val b = (1L to 60L).flatMap(k => Seq.fill((k % 2 + 1).toInt)(k)).toDF("k")
    val exactJoin = a.join(b, "k").count()
    val r = CountMin.joinSizeEstimate(a, "k", b, "k", depth = 4, width = 4096)
      .collect()(0)
    assert(r.getAs[Long]("exact_rows") == exactJoin)
    assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_rows"))
    // 110 keys into 4096 buckets: collisions possible but the min over 4
    // independent rows is overwhelmingly exact on this fixture
    assert(r.getAs[Long]("cms_est") == r.getAs[Long]("exact_rows"))
    // narrow sketch must still never undercount
    val narrow = CountMin.joinSizeEstimate(a, "k", b, "k", depth = 2, width = 8)
      .collect()(0)
    assert(narrow.getAs[Long]("cms_est") >= exactJoin)
  }

  test("gramNovelty: clone pairs score 0, unique docs score 1") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // clone of 1
      (3L, "entirely different words appear in this one"),
      (4L, "hi")). // < 3 tokens → no grams
      toDF("doc_id", "text")
    val out = Decontam.gramNovelty(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 0.0 && out(2L)._4 == 0.0) // every gram shared
    assert(out(3L)._4 == 1.0)
    assert(out(4L) == ((4L, 0L, 0L, 0.0)))
    assert(out(1L)._2 == 7L) // 9 tokens → 7 trigrams
  }

  test("binary histogram bins partition the rows and cover min/max") {
    // mirror of the value_histogram query shape on a controlled fixture
    val df = (0 until 200).map(i => i * 0.5).toDF("v")
    val mm = df.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val bins = df.crossJoin(broadcast(mm))
      .select(least(floor((col("v") - col("lo")) /
        ((col("hi") - col("lo")) / 20.0)), lit(19.0)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins.values.sum == 200L)
    assert(bins.keySet == (0L to 19L).toSet)
    // top bin [94.525, 99.5] holds 95.0..99.5 — ten rows, with the max
    // row arriving via the bin-20 → 19 clamp
    assert(bins(19L) == 10L)
  }
}
