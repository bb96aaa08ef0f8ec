package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Entropy / mutual-information profiling: closed-form references and the
  * decimal-pinning order-independence guarantee. */
class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  test("entropy: uniform = ln k, constant = 0, NULL is a category") {
    val df = Seq(
      ("a", "z", Some("p")), ("b", "z", Some("q")),
      ("c", "z", None), ("d", "z", Some("q")))
      .toDF("u4", "const1", "withnull")
    val out = InfoTheory.entropyProfile(df, Seq("u4", "const1", "withnull"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(out("u4")._1 === 4L)
    assert(math.abs(out("u4")._2 - math.log(4)) < 1e-6)
    assert(out("const1") === ((1L, 0.0)))
    // withnull: {p:1, q:2, __null__:1} -> H = ln4/2 + ln2/2
    assert(out("withnull")._1 === 3L)
    val h = 0.5 * math.log(4) + 0.5 * math.log(2)
    assert(math.abs(out("withnull")._2 - h) < 1e-6)
  }

  test("mutual info: independent -> 0, identical -> ln k") {
    val indep = (for { x <- Seq("a", "b"); y <- Seq("p", "q") }
      yield (x, y)).toDF("x", "y")
    val mi0 = InfoTheory.mutualInfoTotal(indep, "x", "y")
      .collect()(0).getDouble(2)
    assert(math.abs(mi0) < 1e-9)
    val dep = Seq(("a", "a"), ("b", "b"), ("c", "c")).toDF("x", "y")
    val mi1 = InfoTheory.mutualInfoTotal(dep, "x", "y")
      .collect()(0).getDouble(2)
    assert(math.abs(mi1 - math.log(3)) < 1e-6)
  }

  test("mutual info terms: marginals re-derived from the pair table") {
    val df = Seq(("a", "p"), ("a", "p"), ("a", "q"), ("b", "q"))
      .toDF("x", "y")
    val rows = InfoTheory.mutualInfo(df, "x", "y")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(("a", "p")) === ((2L, 3L, 2L)))
    assert(rows(("a", "q")) === ((1L, 3L, 2L)))
    assert(rows(("b", "q")) === ((1L, 1L, 2L)))
  }

  test("chi2Tokens: hand contingency — exclusive tokens score n, " +
    "balanced tokens score 0") {
    val docs = Seq(
      (1L, "apple apple", "en"), (2L, "apple banana", "en"),
      (3L, "cherry", "fr"), (4L, "banana cherry", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = InfoTheory.chi2Tokens(docs, "doc_id", "text", "lang",
        k = 10, minDf = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // apple: en-exclusive, df 2 → chi2 = 4·(2·2)²/(2·2·2·2) = 4
    assert(out(("en", "apple")) === ((2L, 2L, 4.0)))
    assert(out(("fr", "cherry")) === ((2L, 2L, 4.0)))
    // banana: one doc each side → AD − BC = 0
    assert(out(("en", "banana")) === ((2L, 1L, 0.0)))
    assert(out(("fr", "banana")) === ((2L, 1L, 0.0)))
    assert(out.size === 4) // duplicate tokens in a doc count once
  }

  test("chi2Tokens: minDf drops rare tokens; k caps each class") {
    val docs = Seq(
      (1L, "aa aa bb", "x"), (2L, "aa cc", "x"),
      (3L, "dd", "y"), (4L, "dd aa", "y"))
      .toDF("doc_id", "text", "lang")
    val out = InfoTheory.chi2Tokens(docs, "doc_id", "text", "lang",
      k = 1, minDf = 2L).collect()
    // bb/cc (df 1) gone; each class keeps exactly its top-1
    assert(out.length === 2)
    assert(out.map(_.getString(0)).toSet === Set("x", "y"))
    assert(out.forall(r => Set("aa", "dd").contains(r.getString(1))))
  }

  test("entropy is partitioning-independent (decimal-pinned sum)") {
    val docs = graft.sources.Readers.parquet(spark, s"$sf001/documents.parquet")
    val a = InfoTheory.entropyProfile(docs.repartition(1), Seq("lang", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val b = InfoTheory.entropyProfile(docs.repartition(7), Seq("lang", "source"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }
}
