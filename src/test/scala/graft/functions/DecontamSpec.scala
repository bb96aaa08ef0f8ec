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
