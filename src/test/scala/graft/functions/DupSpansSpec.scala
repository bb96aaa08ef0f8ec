package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-checked island semantics for Dedup.dupSpans (span-level exact
  * duplication). Merge rule under test: spans merge when start <= the
  * accumulated end (half-open intervals, adjacency merges). */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int) =
    Dedup.dupSpans(docs.toDF("doc_id", "text"), "text", "doc_id", n)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("shared grams make islands; unique docs are absent") {
    // "a b c" is the only gram in >=2 docs: docA at pos 0 and 6 (two
    // separated islands of 3 tokens each), docB at pos 2, docC untouched.
    val out = run(Seq(
      (1L, "a b c x y z a b c"),
      (2L, "q q a b c q q q"),
      (3L, "m n o p r s t u")), n = 3)
    assert(out == Map(
      1L -> ((2L, 6L, 9L, 0.666667)),
      2L -> ((1L, 3L, 8L, 0.375))))
  }

  test("overlapping hits merge into one island covering the union") {
    // all four 3-grams of "a b c d e f" are shared; hits at pos 0..3
    // overlap pairwise -> ONE island covering the whole 6 tokens.
    val out = run(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f x")), n = 3)
    assert(out == Map(
      1L -> ((1L, 6L, 6L, 1.0)),
      2L -> ((1L, 6L, 7L, 0.857143))))
  }

  test("adjacent spans (start == accumulated end) merge") {
    // docF: "a b" hits at pos 0 (covers [0,2)) and pos 2 -> start 2 ==
    // end 2 -> merged island [0,4). "b a" has df=1 and never fires.
    val out = run(Seq(
      (1L, "a b a b"),
      (2L, "z a b z z")), n = 2)
    assert(out == Map(
      1L -> ((1L, 4L, 4L, 1.0)),
      2L -> ((1L, 2L, 5L, 0.4))))
  }

  test("scrub cuts exactly the island tokens and keeps clean docs whole") {
    // same corpus as the first test: docA loses [0,3) and [6,9) (all 9
    // tokens gone -> ''), docB loses [2,5), docC is untouched.
    val out = Dedup.scrubDupSpans(Seq(
        (1L, "a b c x y z a b c"),
        (2L, "q q a b c q q q"),
        (3L, "m n o p r s t u")).toDF("doc_id", "text"),
        "text", "doc_id", n = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> (("x y z", 3L, 6L)),
      2L -> (("q q q q q", 5L, 3L)),
      3L -> (("m n o p r s t u", 8L, 0L))))
  }

  test("scrub lowercases via the TOKS contract and handles empty text") {
    val out = Dedup.scrubDupSpans(Seq(
        (1L, "  The   QUICK fox  "),
        (2L, "")).toDF("doc_id", "text"),
        "text", "doc_id", n = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> (("the quick fox", 3L, 0L)),
      2L -> (("", 0L, 0L))))
  }

  test("result is partitioning-independent") {
    val docs = (0L until 40L).map(i =>
      (i, if (i % 3 == 0) s"common boiler plate text here unique$i tail"
          else s"doc $i words only once ever written down"))
    val df = docs.toDF("doc_id", "text")
    val one = Dedup.dupSpans(df.coalesce(1), "text", "doc_id", n = 4)
      .orderBy("doc_id").collect().toSeq
    val many = Dedup.dupSpans(df.repartition(7), "text", "doc_id", n = 4)
      .orderBy("doc_id").collect().toSeq
    assert(one == many && one.nonEmpty)
  }
}
