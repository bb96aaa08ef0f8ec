package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: space-joined, lowercased, short-doc-safe") {
    val g = Seq(Tuple1("The cat Sat on mats")).toDF("t")
      .select(Decontam.wordNgrams($"t", 3).as("g"))
      .as[Seq[String]].collect().head
    assert(g == Seq("the cat sat", "cat sat on", "sat on mats"))
    val short = Seq(Tuple1("too short")).toDF("t")
      .select(Decontam.wordNgrams($"t", 3).as("g"))
      .as[Seq[String]].collect().head
    assert(short.isEmpty)
  }

  test("contaminated flags exactly the overlapping docs with distinct counts") {
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares "alpha beta gamma" and "beta gamma delta" (two distinct 3-grams)
      (1L, "x alpha beta gamma delta y"),
      // repeats the same overlapping 3-gram twice -> still ONE distinct hit
      (2L, "alpha beta gamma z alpha beta gamma"),
      // no overlap
      (3L, "totally unrelated text here now")).toDF("doc_id", "text")
    val out = Decontam.contaminated(corpus, eval, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("the eval side is broadcast (no shuffle of the corpus text)") {
    val eval = Seq((0L, "a b c d e f g h")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val plan = Decontam.contaminated(corpus, eval, "text", "doc_id", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }
}

class BloomDecontamSpec extends SparkSpec {
  import spark.implicits._

  private val eval = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (200L, "one two three four five six")).toDF("doc_id", "text")
  private val corpus = Seq(
    (1L, "x alpha beta gamma delta y"),          // 2 distinct 3-gram hits
    (2L, "one two three q one two three"),       // 1 distinct hit, repeated
    (3L, "totally unrelated text here now"),     // clean
    (4L, "zz")).toDF("doc_id", "text")           // shorter than n: no grams

  test("bloom decontamination is a superset with per-doc counts >= exact") {
    val exact = Decontam.contaminated(corpus, eval, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontam.contaminatedBloom(
        corpus, eval, "text", "doc_id", n = 3, numProbes = 5, mBits = 1 << 20)
      .as[(Long, Long, Long)].collect()
      .map { case (id, b, e) => id -> (b, e) }.toMap
    // every exactly-contaminated doc is flagged, never undercounted,
    // and the exact column replays the exact path
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id lost by bloom")
      assert(bloom(id)._1 >= n, s"doc $id bloom ${bloom(id)._1} < exact $n")
      assert(bloom(id)._2 == n)
    }
    // any surplus doc is a pure false positive: exact count 0
    bloom.keySet.diff(exact.keySet).foreach(id => assert(bloom(id)._2 == 0L))
    // at 2^20 bits / a handful of grams the FP rate is ~0: exact equality
    assert(bloom.keySet == exact.keySet)
    assert(bloom(1L)._1 == 2L && bloom(2L)._1 == 1L)
  }

  test("a tiny overloaded filter stays one-sided: never loses a real hit") {
    // 63 bits / 5 probes / 11 eval grams: heavily loaded, false positives
    // likely — but every exact hit must survive with count >= exact
    val exact = Decontam.contaminated(corpus, eval, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    val out = Decontam.contaminatedBloom(
        corpus, eval, "text", "doc_id", n = 3, numProbes = 5, mBits = 63)
      .as[(Long, Long, Long)].collect()
      .map { case (id, b, e) => id -> (b, e) }.toMap
    exact.foreach { case (id, n) =>
      assert(out.contains(id) && out(id)._1 >= n, s"doc $id lost/undercounted")
    }
    assert(!out.contains(4L)) // shorter than n: no grams, not even a FP
  }

  test("bloom membership is partitioning-independent") {
    val base = Decontam.contaminatedBloom(
      corpus, eval, "text", "doc_id", n = 3, numProbes = 5, mBits = 1 << 20)
    val repart = Decontam.contaminatedBloom(
      corpus.repartition(7), eval.repartition(3), "text", "doc_id",
      n = 3, numProbes = 5, mBits = 1 << 20)
    assert(base.orderBy("doc_id").collect().toSeq ==
      repart.orderBy("doc_id").collect().toSeq)
  }

  test("the filter words match a direct single-threaded build") {
    val filt = Decontam.bloomFilter(eval, "text", n = 3, numProbes = 5,
      mBits = 1 << 12)
    val grams = eval.select(
        explode(Decontam.wordNgrams($"text", 3)).as("g"))
      .as[String].collect().distinct
    val expect = new Array[Long]((1 << 12) / 63 + 1)
    for (g <- grams; i <- 1 to 5) {
      val pos = (graft.functions.expressions.Md5Hash64.lower(g + "#" + i)
        & Long.MaxValue) % (1 << 12)
      expect((pos / 63).toInt) |= 1L << (pos % 63).toInt
    }
    assert(filt.toSeq == expect.toSeq)
  }
}
