package graft.functions

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join join shuffle"),
    (2L, "vector index scan"),
    (3L, "join vector join join spark"),
    (4L, "filter filter filter"),
    (5L, "JOIN Spark")
  ).toDF("doc_id", "text")

  test("matches a hand-rolled BM25 on a tiny corpus") {
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("join", "vector"), k = 10)
      .as[(Long, Double)].collect().toMap

    // reference computation, same fixed-shape arithmetic
    val docs = Map(
      1L -> Seq("spark", "join", "join", "shuffle"),
      2L -> Seq("vector", "index", "scan"),
      3L -> Seq("join", "vector", "join", "join", "spark"),
      4L -> Seq("filter", "filter", "filter"),
      5L -> Seq("join", "spark"))
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def score(toks: Seq[String]): Double = {
      val contribs = Seq("join", "vector").map { term =>
        val tf = toks.count(_ == term).toDouble
        val df = docs.values.count(_.contains(term))
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val norm = 0.25 + 0.75 * (toks.size.toDouble / avgdl)
        idf * (tf * 2.2) / (tf + 1.2 * norm)
      }
      BigDecimal(contribs.reduceLeft(_ + _))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = docs.collect {
      case (id, toks) if toks.contains("join") || toks.contains("vector") =>
        id -> score(toks)
    }
    assert(got == want)
    assert(!got.contains(4L)) // no query term -> excluded
  }

  test("tfidfKeywords: hand-checked scores, rare terms outrank common") {
    val got = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .as[(Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(-_._5).map(_._2).toSeq).toMap
    // d1: shuffle (1*ln5=1.609) > join (2*ln(5/3)=1.022) > spark (0.511)
    assert(got(1L) == Seq("shuffle", "join"))
    // d4 has a single distinct token
    assert(got(4L) == Seq("filter"))
    // d2: index/scan tie at ln5 -> token ASC breaks: index before scan
    assert(got(2L) == Seq("index", "scan"))
    val d1 = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 5)
      .as[(Long, String, Long, Long, Double)].collect()
      .filter(r => r._1 == 1L && r._2 == "join").head
    assert(d1._3 == 2L && d1._4 == 3L &&
      math.abs(d1._5 - 2.0 * math.log(5.0 / 3.0)) < 1e-6)
  }

  test("rankingMetrics: perfect ranking gives ndcg 1, mrr 1; miss gives 0") {
    // query "vector": relevant docs {2, 3} (contain it); bm25 must rank
    // them in the top-10, so dcg == idcg → ndcg exactly 1.0
    val out = Retrieval.rankingMetrics(corpus, "doc_id", "text",
      Seq(Seq("vector"), Seq("absent_term")), k = 10)
      .as[(String, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(out("vector") == ((2L, 1.0, 1.0)))
    assert(out("absent_term") == ((0L, 0.0, 0.0)))
  }

  test("rankingMetrics: single relevant doc bounds ndcg by its rank discount") {
    // "join vector": only doc 3 has BOTH; n_rel = 1 so idcg = gain(1) = 1
    // and ndcg = round(1/log2(rank+1)) for doc 3's rank; mrr = 1/rank
    val out = Retrieval.rankingMetrics(corpus, "doc_id", "text",
      Seq(Seq("join", "vector")), k = 10)
      .as[(String, Long, Double, Double)].collect()(0)
    assert(out._2 == 1L)
    assert(out._3 > 0.0 && out._3 <= 1.0)
    assert(out._4 > 0.0 && out._4 <= 1.0)
  }

  test("tfidfKeywords plans the rank filter as WindowGroupLimit") {
    val plan = Retrieval.tfidfKeywords(corpus, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("k truncates by (score desc, doc_id) deterministically") {
    val top = Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("join"), k = 2).as[(Long, Double)].collect()
    assert(top.length == 2)
    assert(top.map(_._2).sorted.reverse.toSeq == top.map(_._2).toSeq)
  }

  test("top-k plans as TakeOrderedAndProject, stats join broadcast") {
    // k must stay below the folded LocalRelation's maxRows (3 'join' docs),
    // or EliminateLimits removes the limit before planning
    val df = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("join"), k = 2)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("rankStability: a ranking against itself is tau 1, jaccard 1") {
    import spark.implicits._
    val corpus = (1L to 30L)
      .map(i => (i, ("join " * (i.toInt % 5 + 1)) + "filler words here"))
      .toDF("doc_id", "text")
    val r = Retrieval.rankStability(corpus, "doc_id", "text",
      Seq("join"), k = 10, 1.2, 0.75, 1.2, 0.75).collect()(0)
    assert(r.getAs[Double]("jaccard") === 1.0)
    assert(r.getAs[Double]("kendall_tau") === 1.0)
    assert(r.getAs[Long]("n_common") === 10L)
  }

  test("rankStability: b = 0 vs b = 1 reorders length-confounded docs") {
    import spark.implicits._
    // same tf, lengths DECREASE with id: b=0 ties → id order; b=1 ranks
    // short (high-id) docs first → the common set reverses, tau = -1
    val corpus = (1L to 20L).map(i =>
      (i, "join " + ("pad " * ((21 - i.toInt) * 10)))).toDF("doc_id", "text")
    val r = Retrieval.rankStability(corpus, "doc_id", "text",
      Seq("join"), k = 10, 1.2, 0.0, 1.2, 1.0).collect()(0)
    assert(r.getAs[Long]("n_a") === 10L)
    // b=0 keeps ids 1-10 (tf ties → id order), b=1 keeps the short docs
    // 11-20: the sets disagree outright, and with no common docs the tau
    // is honestly NULL rather than a fabricated number
    assert(r.getAs[Double]("jaccard") < 0.5)
    assert(r.getAs[Long]("n_common") >= 2L || r.isNullAt(4))
  }
}
