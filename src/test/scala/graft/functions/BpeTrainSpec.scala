package graft.functions

import graft.SparkSpec

/** BPE training: hand-verifiable merges, left-to-right non-overlap, and
  * partitioning independence. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("learns the hand-computed merge sequence") {
    // corpus: "the the the that band and" → word freqs:
    //   the×3, that×1, band×1, and×1
    val docs = Seq(Tuple1("the the the that band and")).toDF("text")
    val got = BpeTrain.train(docs, "text", 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 1 pairs: (t,h)=4 [the×3 + that], (h,e)=3, (a,t)=1, (a,n)=2,
    //   (n,d)=2, (b,a)=1 → (t,h) wins
    assert(got(0) == (1L, "t", "h", 4L))
    // round 2: words now th|e ×3, th|a|t, b|a|n|d, a|n|d:
    //   (th,e)=3, (th,a)=1, (a,t)=1, (a,n)=2, (n,d)=2, (b,a)=1 → (th,e)
    assert(got(1) == (2L, "th", "e", 3L))
    // round 3: (a,n)=2 vs (n,d)=2 tie → lexicographic (a,n)
    assert(got(2) == (3L, "a", "n", 2L))
    // round 4: an|d ×2 → (an,d)=2
    assert(got(3) == (4L, "an", "d", 2L))
  }

  test("merges apply left-to-right non-overlapping") {
    // "aaaa" with (a,a) dominant: round 1 merges to aa|aa (2 occurrences,
    // count 3 = overlapping adjacencies); round 2 → aaaa
    val docs = Seq(Tuple1("aaaa aaaa")).toDF("text")
    val got = BpeTrain.train(docs, "text", 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got(0) == ("a", "a"))
    assert(got(1) == ("aa", "aa"))
  }

  test("training is partitioning-independent") {
    val docs = (0 until 200).map(i =>
      s"common words repeat across documents number $i of the corpus")
      .toDF("text")
    def run(parts: Int) = BpeTrain.train(docs.repartition(parts), "text", 6)
      .collect().toSeq
    assert(run(1) == run(7))
  }
}
