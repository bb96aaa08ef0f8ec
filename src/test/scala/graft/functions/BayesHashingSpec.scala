package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BayesHashingSpec extends SparkSpec {
  import spark.implicits._

  test("naive Bayes separates two vocab-disjoint classes and ties break to the smaller class") {
    val docs = Seq(
      (1L, "alpha alpha beta", "en"),
      (2L, "alpha beta beta", "en"),
      (3L, "uno dos dos", "es"),
      (4L, "uno uno dos", "es"),
      // identical token sets across classes → score tie → pred "en" < "es"
      (5L, "shared", "en"),
      (6L, "shared", "es")
    ).toDF("doc_id", "text", "lang")
    val out = Bayes.classifySelf(docs, "doc_id", "text", "lang")
      .orderBy("id").collect()
    val pred = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pred(1L) == "en" && pred(2L) == "en")
    assert(pred(3L) == "es" && pred(4L) == "es")
    // docs 5/6: same tokens, same class sizes ⇒ symmetric scores; tie → "en"
    assert(pred(5L) == "en" && pred(6L) == "en")
    val hits = out.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(hits(1L) == 1L && hits(6L) == 0L)
  }

  test("hashing trick: fixed dim, integer counts, deterministic, sign from md5 bit") {
    val toks = Seq((1L, "alpha"), (1L, "alpha"), (1L, "beta"), (2L, "alpha"))
      .toDF("id", "tok")
    val out = Hashing.hashFeatures(toks, "id", "tok", 8)
      .orderBy("id").collect()
    assert(out.length == 2)
    val v1 = out(0).getSeq[Long](1)
    val v2 = out(1).getSeq[Long](1)
    assert(v1.length == 8 && v2.length == 8)
    // expected cells from the same md5 arithmetic the expression uses
    def bucket(t: String) =
      ((expressions.Md5Hash64.lower(t.getBytes("UTF-8"), 0,
        t.getBytes("UTF-8").length) & Long.MaxValue) % 8).toInt
    def sign(t: String) = {
      val s = t + "|s"
      if ((expressions.Md5Hash64.lower(s.getBytes("UTF-8"), 0,
        s.getBytes("UTF-8").length) & 1L) == 1L) 1L else -1L
    }
    val exp1 = Array.fill(8)(0L)
    exp1(bucket("alpha")) += 2L * sign("alpha")
    exp1(bucket("beta")) += sign("beta")
    assert(v1 == exp1.toSeq)
    // id 2 has exactly one token
    assert(v2.map(math.abs).sum == 1L)
  }
}
