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

  test("trainBatched: greedy disjoint accept, batch apply, saturation stop") {
    // same corpus as the sequential test; round-1 pairs by (cnt desc,
    // lhs, rhs): (t,h)=4, (h,e)=3, (a,n)=2, (n,d)=2, (a,t)=1, (b,a)=1.
    // Greedy: accept (t,h); reject (h,e) [h used]; accept (a,n); reject
    // (n,d) [n used]; reject (a,t) [a,t used]; accept (b? b unused, a
    // used] → reject. Round-1 accepts: (t,h), (a,n).
    val docs = Seq(Tuple1("the the the that band and")).toDF("text")
    val got = BpeTrain.trainBatched(docs, "text", rounds = 10, batch = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got(0) == (1L, "t", "h", 4L))
    assert(got(1) == (2L, "a", "n", 2L))
    // round 2 over th|e ×3, th|a|t, b|an|d, an|d: (th,e)=3 accept;
    // (an,d)=2 accept; (th,a)=1 reject [th used]; (a,t) reject [t? t
    // unused but a used]; (b,an) reject [an used]
    assert(got(2) == (3L, "th", "e", 3L))
    assert(got(3) == (4L, "an", "d", 2L))
    // saturation: the tiny corpus fuses completely and the loop stops on
    // pair exhaustion well before 10 rounds — every word one symbol
    val withFreq = got.map(m => (m._2, m._3))
    assert(got.length < 20)
    val segs = Seq("the", "that", "band", "and").map { w =>
      withFreq.foldLeft(w.map(c => s"($c)").mkString) { case (acc, (a, b)) =>
        acc.replace(s"($a)($b)", s"($a$b)")
      }
    }
    assert(segs.forall(s => s.count(_ == '(') == 1))
  }

  test("trainScaled: driver closure agrees with the Spark loop merge-for-merge") {
    val docs = (0 until 50).map(i =>
      s"shared tokens appear here with variation v$i and more shared tokens")
      .toDF("text")
    val seqMerges = BpeTrain.train(docs, "text", 15).collect().toSeq
    val fastMerges = BpeTrain.trainScaled(docs, "text", 15).collect().toSeq
    assert(fastMerges == seqMerges)
  }

  test("trainScaled: saturates at the full closure and agrees there too") {
    val docs = Seq(Tuple1("the the the that band and")).toDF("text")
    // ask for far more merges than the closure holds: both trainers stop
    // at pair exhaustion with identical merge tables
    val seqM = BpeTrain.train(docs, "text", 500).collect().toSeq
    val fastM = BpeTrain.trainScaled(docs, "text", 500).collect().toSeq
    assert(fastM == seqM && fastM.nonEmpty && fastM.length < 500)
  }

  test("trainScaled: word-limit truncation keeps the top-frequency words") {
    // 3 words; limit 2 drops the rarest ("zed") — merges then never
    // contain z; determinism of the (freq desc, word asc) cut is pinned
    val docs = Seq(Tuple1("aloha aloha aloha botanic botanic zed")).toDF("text")
    val got = BpeTrain.trainScaled(docs, "text", 50, driverWordLimit = 2)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.nonEmpty)
    assert(!got.exists { case (a, b) => (a + b).contains("z") })
  }

  test("trainScaled + encode: end-to-end trainer/encoder agreement") {
    val docs = (0 until 30).map(i => (i.toLong,
      s"repeatable words compose documents number n$i in corpus"))
      .toDF("doc_id", "text")
    val merges = BpeTrain.trainScaled(docs, "text", 20)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = BpeTrain.encodeDigest(docs, "doc_id", "text", merges)
    // same merges through the sequential trainer → identical encodes
    val seqMerges = BpeTrain.train(docs, "text", 20)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges == seqMerges)
    val enc2 = BpeTrain.encodeDigest(docs, "doc_id", "text", seqMerges)
    assert(enc.except(enc2).isEmpty && enc2.except(enc).isEmpty)
  }

  test("encode applies the learned merges; counts and digests are exact") {
    // merges learned above: th, the(th+e), an, and(an+d)
    val train = Seq(Tuple1("the the the that band and")).toDF("text")
    val merges = BpeTrain.train(train, "text", 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val docs = Seq(
      (1L, "the band"),   // the→(the)=1 tok; band→(b)(an)(d)→(b)(and)=2
      (2L, "that and x9") // that→(th)(a)(t)=3; and→(and)=1; x9 OOV→1
    ).toDF("doc_id", "text")
    val got = BpeTrain.encodeDigest(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(got(1L)._1 == 3L)
    assert(got(2L)._1 == 5L)
    // digest = md5 of space-joined wrapped segmentations in word order
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L)._2 == md5hex("(the) (b)(and)"))
    assert(got(2L)._2 == md5hex("(th)(a)(t) (and) (x9)"))
  }
}
