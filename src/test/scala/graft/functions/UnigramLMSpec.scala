package graft.functions

import graft.SparkSpec

class UnigramLMSpec extends SparkSpec {

  test("bigramScore counts the doc's bigram multiset against the corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),     // bigrams: "a b", "b c"
      (2L, "a b a b"),   // "a b", "b a", "a b"
      (3L, "x")          // sub-2 tokens: no bigrams, absent from output
    ).toDF("doc_id", "text")
    val out = UnigramLM.bigramScore(docs, "doc_id", "text", rareBelow = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // corpus freqs: "a b"=3, "b c"=1, "b a"=1
    assert(out(1L) == ((2L, 4L, 1L)))  // 3+1, one rare ("b c")
    assert(out(2L) == ((3L, 7L, 1L)))  // 3+1+3, one rare ("b a")
    assert(!out.contains(3L))
  }
  import spark.implicits._

  // corpus frequencies: the=3, cat=2, sat=1, dog=1, ran=1
  private def docs = Seq(
    (1L, "the cat sat"),
    (2L, "The cat"),
    (3L, "the dog ran")
  ).toDF("doc_id", "text")

  test("tokenFrequencies counts lowercased whitespace tokens") {
    val f = UnigramLM.tokenFrequencies(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f == Map("the" -> 3L, "cat" -> 2L, "sat" -> 1L, "dog" -> 1L, "ran" -> 1L))
  }

  test("corpusFreqScore sums the doc's token-multiset frequencies") {
    val s = UnigramLM.corpusFreqScore(docs, "doc_id", "text", rareBelow = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    // doc 1: the(3)+cat(2)+sat(1)=6, one rare (sat)
    assert(s(1L) == ((3L, 6L, 1L, 2.0, 0.333333)))
    // doc 2: the(3)+cat(2)=5, none rare
    assert(s(2L) == ((2L, 5L, 0L, 2.5, 0.0)))
    // doc 3: the(3)+dog(1)+ran(1)=5, two rare
    assert(s(3L) == ((3L, 5L, 2L, 1.666667, 0.666667)))
  }

  test("surprisal matches a hand fold within tolerance") {
    val total = 8.0 // 3+2+1+1+1
    def lg(p: Double) = math.log(p) / math.log(2)
    val expected1 = -(lg(3 / total) + lg(2 / total) + lg(1 / total)) / 3
    val got = UnigramLM.surprisal(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - expected1) < 1e-9)
  }

  test("vocab ranks by frequency with token tie-break and dense ids") {
    val v = UnigramLM.vocab(docs, "text", topK = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(v.toSeq == Seq((0L, "the", 3L), (1L, "cat", 2L), (2L, "dog", 1L)))
  }

  test("pmiCollocations: hand-checked PMI, minCount gates the noise") {
    val docs = Seq(
      (1L, "new york new york"),
      (2L, "new car"),
      (3L, "york minster")).toDF("doc_id", "text")
    val out = UnigramLM.pmiCollocations(docs, "text", minCount = 2L, k = 5)
      .as[(String, Long, Long, Long, Double)].collect()
    // only "new york" survives minCount=2: fab=2, f_new=3, f_york=3, T=8
    assert(out.length == 1)
    val (bg, fab, f1, f2, pmi) = out.head
    assert(bg == "new york" && fab == 2L && f1 == 3L && f2 == 3L)
    assert(math.abs(pmi - math.log(16.0 / 9.0)) < 1e-6)
  }

  test("minCount truncation drops the tail") {
    val f = UnigramLM.tokenFrequencies(docs, "text", minCount = 2).collect()
      .map(_.getString(0)).toSet
    assert(f == Set("the", "cat"))
  }

  test("stupidBackoff: seen bigrams never back off; all log-scores " +
    "non-positive; partitioning-independent") {
    import spark.implicits._
    val same = (1L to 120L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val out = UnigramLM.stupidBackoff(same, "doc_id", "text").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") === 3L)
      assert(r.getAs[Long]("n_backoff") === 0L) // every bigram trained
      assert(r.getAs[Double]("avg_logscore") <= 0.0)
    }
    val varied = (1L to 100L).map(i =>
      (i, s"tok${i % 7} tok${(i * 3) % 11} tok${(i * 5) % 13}"))
      .toDF("doc_id", "text")
    val a = UnigramLM.stupidBackoff(varied.repartition(1), "doc_id",
      "text").orderBy("doc_id").collect().toSeq
    val b = UnigramLM.stupidBackoff(varied.repartition(13), "doc_id",
      "text").orderBy("doc_id").collect().toSeq
    assert(a === b)
    // a varied corpus must exercise the backoff branch somewhere
    assert(a.map(_.getAs[Long]("n_backoff")).sum > 0L)
  }

  test("heldoutPerplexity: a one-token language has perplexity ~1; " +
    "partitioning-independent") {
    import spark.implicits._
    val uni = (1L to 200L).map(i => (i, "a a a a")).toDF("doc_id", "text")
    val r = UnigramLM.heldoutPerplexity(uni, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("vocab") === 1L)
    assert(r.getAs[Double]("perplexity") < 1.1)
    val mixed = (1L to 200L)
      .map(i => (i, if (i % 2 == 0) "a b c d" else "e f g h"))
      .toDF("doc_id", "text")
    val a = UnigramLM.heldoutPerplexity(mixed.repartition(1), "doc_id",
      "text").collect()(0)
    val b = UnigramLM.heldoutPerplexity(mixed.repartition(13), "doc_id",
      "text").collect()(0)
    assert(a === b)
    // held-out half drawn from a different 4-token alphabet: every eval
    // token is OOV-or-rare, so perplexity must sit far above uniform-4
    assert(a.getAs[Double]("perplexity") > 4.0)
  }
}
