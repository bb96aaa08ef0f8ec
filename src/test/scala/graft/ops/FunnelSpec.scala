package graft.ops

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val goodA =
    "the quick brown fox jumps over a lazy dog and it runs to the river " +
    "with many other friendly animals from nearby farms today"
  private val goodB =
    "a small bird is singing in the garden and the children are watching " +
    "it with joy from the old wooden bench this morning"

  test("every stage binned at the first failing rule, funnel arithmetic") {
    val docs = Seq(
      // fails quality: no alpha, punctuation-saturated, short
      1L -> "?? !! ?? !! ?? !! ?? !!",
      // passes quality (long, alphabetic) but language-ids as German
      2L -> ("der und ist von mit nicht auch werden im auf " +
        "wald berg fluss stadt haus baum licht stein weg " +
        "der und ist von mit nicht auch werden im auf " +
        "wald berg fluss stadt haus baum licht stein weg " +
        "der und ist von mit nicht auch werden im auf " +
        "wald berg fluss stadt haus baum licht stein weg"),
      // English and high quality, but two distinct tokens repeated 60x
      3L -> ("the cat " * 60).trim,
      10L -> goodA,
      11L -> goodA, // exact duplicate: higher id loses
      12L -> goodB
    ).toDF("doc_id", "text")
    val out = Funnel.filterFunnel(docs, "doc_id", "text",
        qualityMin = 0.5, lang = "en", maxDupFrac = 0.6)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("1_quality", 6L, 1L),
      ("2_language", 5L, 1L),
      ("3_repetition", 4L, 1L),
      ("4_exact_dup", 3L, 1L),
      ("5_kept", 2L, 0L)))
  }

  test("zero-drop stages still report; empty corpus gives an all-zero funnel") {
    val clean = Seq(10L -> goodA, 12L -> goodB).toDF("doc_id", "text")
    val out = Funnel.filterFunnel(clean, "doc_id", "text", 0.5, "en", 0.6)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("1_quality", 2L, 0L), ("2_language", 2L, 0L),
      ("3_repetition", 2L, 0L), ("4_exact_dup", 2L, 0L),
      ("5_kept", 2L, 0L)))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val zero = Funnel.filterFunnel(empty, "doc_id", "text", 0.5, "en", 0.6)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(zero.toSeq == Seq(
      ("1_quality", 0L, 0L), ("2_language", 0L, 0L),
      ("3_repetition", 0L, 0L), ("4_exact_dup", 0L, 0L),
      ("5_kept", 0L, 0L)))
  }
}
