package graft.ops

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("nearest-rank edges fill baseline deciles evenly; PSI terms >= 0") {
    val base = (1 to 10).map(_.toDouble).toDF("value")
    // edges at ranks ceil(k*10/5)=2,4,6,8 -> values 2,4,6,8; each bin gets 2
    val out = Drift.psi(base, base, "value", nBins = 5)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L until 5L))
    assert(out.forall(r => r._2 == 2L && r._3 == 2L))
    // identical distributions: every term is the smoothing epsilon only
    assert(out.forall(r => r._4 == 0.0))
  }

  test("a shifted current lands where it should and PSI grows") {
    val base = (1 to 100).map(_.toDouble).toDF("value")
    val same = Drift.psi(base, base, "value").as[(Long, Long, Long, Double)]
      .collect()
    val shifted = Drift.psi(base, (101 to 200).map(_.toDouble).toDF("value"),
      "value").as[(Long, Long, Long, Double)].collect()
    // everything above the baseline max -> all current mass in the top bin
    assert(shifted.filter(_._1 == 9L).head._3 == 100L)
    assert(shifted.filter(_._1 < 9L).forall(_._3 == 0L))
    // PSI terms are individually nonnegative and the drifted total dominates
    assert(shifted.forall(_._4 >= 0.0) && same.forall(_._4 >= 0.0))
    assert(shifted.map(_._4).sum > same.map(_._4).sum + 1.0)
  }

  test("categorical PSI: union of categories, one-sided categories smoothed") {
    val base = Seq("a", "a", "a", "b").toDF("cat")
    val cur = Seq("a", "b", "b", "c").toDF("cat")
    val out = Drift.psiCategorical(base, cur, "cat")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map("a" -> ((3L, 1L)), "b" -> ((1L, 2L)), "c" -> ((0L, 1L))))
    // hand-check one term: K=3, tb=tc=4 -> denom 5.5
    val pa = 3.5 / 5.5; val qa = 1.5 / 5.5
    val term = Drift.psiCategorical(base, cur, "cat")
      .filter($"category" === "a").as[(String, Long, Long, Double)]
      .collect().head._4
    assert(math.abs(term - (pa - qa) * math.log(pa / qa)) < 1e-6)
  }

  test("vocabJsDivergence: identical sources 0, disjoint sources high, symmetric grid") {
    val docs = Seq(
      ("a", 1L, "alpha beta gamma alpha beta"),
      ("b", 2L, "alpha beta gamma alpha beta"), // identical distribution
      ("c", 3L, "delta epsilon zeta delta epsilon zeta")) // disjoint
      .toDF("source", "doc_id", "text")
    val out = Drift.vocabJsDivergence(docs, "source", "text", topK = 10)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", "b")) == 0.0)
    // Laplace +1 over these tiny counts flattens both distributions, so
    // "high" is modest in absolute terms — but must clearly exceed 0
    assert(out(("a", "c")) > 0.05)
    assert(out(("b", "c")) == out(("a", "c"))) // a ≡ b ⇒ same divergence
    assert(out.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // JS with ln is bounded by ln 2
    assert(out.values.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-9))
  }

  test("empty bins from heavy ties stay deterministic") {
    // baseline is one repeated value: all edges equal, everything in bin 0
    val base = Seq.fill(20)(7.0).toDF("value")
    val cur = Seq(5.0, 7.0, 9.0).toDF("value")
    val out = Drift.psi(base, cur, "value", nBins = 4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.filter(_._1 == 0L).head._2 == 20L)
    // 5.0 and 7.0 are not > 7 -> bin 0; 9.0 beats all three edges -> bin 3
    assert(out.filter(_._1 == 0L).head._3 == 2L)
    assert(out.filter(_._1 == 3L).head._3 == 1L)
    assert(out.map(_._2).sum == 20L && out.map(_._3).sum == 3L)
  }
}
