package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Quantile normalization and the privacy screens. */
class NormalizePrivacySpec extends SparkSpec {
  import spark.implicits._

  test("quantileNormalize: single stratum is the identity") {
    val df = Seq((1L, "s", 10L), (2L, "s", 30L), (3L, "s", 20L),
      (4L, "s", 40L)).toDF("id", "src", "v")
    val out = Normalize.quantileNormalize(df, "id", "src", col("v"), "id")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4)))
      .toMap
    out.foreach { case (_, (v, mapped)) => assert(v === mapped) }
  }

  test("quantileNormalize: strata map onto global quantiles") {
    // stratum a: 1,2,3,4 ; stratum b: 101,102,103,104
    val df = ((1 to 4).map(i => (i.toLong, "a", i.toLong)) ++
      (1 to 4).map(i => (i + 10L, "b", 100L + i))).toDF("id", "src", "v")
    val out = Normalize.quantileNormalize(df, "id", "src", col("v"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    val globalSorted = Seq(1L, 2L, 3L, 4L, 101L, 102L, 103L, 104L)
    // within-stratum pr = 0, 1/3, 2/3, 1 -> global ranks 1, 3, 6, 8
    val expect = Seq(globalSorted(0), globalSorted(2), globalSorted(5),
      globalSorted(7))
    assert((1 to 4).map(i => out(i.toLong)) === expect)
    assert((1 to 4).map(i => out(i + 10L)) === expect) // b maps identically
  }

  test("kAnonymity: flags exactly the sub-k groups; summary adds up") {
    val df = (Seq.fill(12)(("US", "A")) ++ Seq.fill(3)(("US", "B")) ++
      Seq.fill(10)(("DE", "A")) ++ Seq.fill(1)(("DE", "B")))
      .toDF("nation", "segment")
    val out = Privacy.kAnonymity(df, Seq("nation", "segment"), k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(("US", "A")) === ((12L, false)))
    assert(out(("US", "B")) === ((3L, true)))
    assert(out(("DE", "A")) === ((10L, false)))
    assert(out(("DE", "B")) === ((1L, true)))
    val s = Privacy.kAnonymitySummary(df, Seq("nation", "segment"), 10)
      .collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) ===
      ((4L, 2L, 4L, 1L)))
  }

  test("dpNoisyCounts: reproducible per seed, seed-sensitive, " +
    "counts intact") {
    val df = (Seq.fill(100)("x") ++ Seq.fill(50)("y")).toDF("k")
    val a = Privacy.dpNoisyCounts(df, "k", b = 2.0, seed = "s1").collect()
    val b = Privacy.dpNoisyCounts(df, "k", b = 2.0, seed = "s1").collect()
    assert(a.toSeq === b.toSeq)
    val c = Privacy.dpNoisyCounts(df, "k", b = 2.0, seed = "s2")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val am = a.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(am !== c)
    // raw counts ride beside the noisy release
    assert(a.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("x" -> 100L, "y" -> 50L))
    // noise is centered-ish: both releases stay within a plausible band
    am.values.zip(Map("x" -> 100L, "y" -> 50L).values).foreach {
      case (noisy, n) => assert(math.abs(noisy - n) < 30.0)
    }
  }
}
