package graft.functions

import graft.SparkSpec

/** The 100 TB skew guard: LSH/fingerprint self-joins must cap the document
  * frequency of bucket keys, or a boilerplate fingerprint shared by n docs
  * produces n² candidate rows (template-heavy web corpora reach millions of
  * docs per bucket). Adversarial corpora here prove the cap bounds candidate
  * generation and that capped runs still find the genuine near-duplicates.
  */
class HotBucketSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs sharing one long boilerplate sentence (one hot winnowing
  // fingerprint bucket), each with a long unique tail so no pair is a
  // genuine near-duplicate; plus one genuine duplicated document.
  private val boiler = "this exact boilerplate navigation footer appears on " +
    "every single page of the template heavy website corpus we crawled today"
  private def uniqueTail(i: Int): String =
    (0 until 12).map(j => s"unique${i}token${j}word${i * 31 + j}").mkString(" ")
  private lazy val docs = (
    (0 until 40).map(i => (i.toLong, s"$boiler ${uniqueTail(i)}")) ++
      Seq((100L, "an entirely separate document that is duplicated verbatim " +
        "for the genuine near duplicate pair to be found and kept intact"),
          (101L, "an entirely separate document that is duplicated verbatim " +
        "for the genuine near duplicate pair to be found and kept intact"))
    ).toDF("doc_id", "text")

  test("winnowNearDups: hot-fingerprint cap bounds the boilerplate blow-up") {
    // uncapped: the shared-substring bucket links all 40 boilerplate docs
    val uncapped = Dedup.winnowNearDups(docs, "text", "doc_id",
      shingleK = 20, window = 24, minShared = 1, maxFpFreq = 1000000)
    assert(uncapped.count() >= 40L * 39 / 2)
    // capped at 10: every fingerprint of the boilerplate span (40 docs) is
    // dropped; the genuine pair (frequency 2) survives untouched
    val capped = Dedup.winnowNearDups(docs, "text", "doc_id",
      shingleK = 20, window = 24, minShared = 1, maxFpFreq = 10)
    val got = capped.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)))
  }

  test("minhashNearDups: hot-band cap drops degenerate buckets, keeps real dups") {
    // exact copies of the SAME text → every band of every doc collides
    val clones = ((0 until 30).map(i => (i.toLong, s"$boiler $boiler")) ++
      Seq((100L, "an entirely separate document that is duplicated verbatim " +
        "kept intact"),
          (101L, "an entirely separate document that is duplicated verbatim " +
        "kept intact"))).toDF("doc_id", "text")
    val capped = Dedup.minhashNearDups(clones, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5,
      maxBandFreq = 10)
    val got = capped.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)))
    val uncapped = Dedup.minhashNearDups(clones, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5,
      maxBandFreq = 1000000)
    assert(uncapped.count() >= 30L * 29 / 2)
  }

  test("minhashNearDups: sub-shingle docs are not reported as duplicates") {
    // shorter than shingleK chars → no k-grams; the all-sentinel signature
    // must not band-collide distinct tiny docs into jaccard-1.0 "duplicates"
    val tiny = Seq((1L, "ab"), (2L, "cd"), (3L, "xy"),
      (10L, "a genuinely long duplicated document body shared by two rows"),
      (11L, "a genuinely long duplicated document body shared by two rows"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(tiny, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 11L)))
  }

  test("fuzzyLink: hot first-token block is dropped, distinct blocks survive") {
    // 30 names sharing a stop-word-ish first token (one hot block), each
    // pairwise dissimilar; plus a genuine variant pair in its own block
    val names = ((0 until 30).map(i =>
      (i.toLong, s"the ${uniqueTail(i)}")) ++
      Seq((100L, "zenith labs incorporated"),
          (101L, "zenith labs incorporatde"))).toDF("id", "name")
    // coarse 1-token opt-in: the cap mechanism is what's under test and
    // the fixture's hot block shares only its first token
    val capped = Dedup.fuzzyLink(names, "name", "id",
      minSim = 0.9, maxBlockFreq = 10, blockTokens = 1)
    val got = capped.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)))
    // the cap actually fired (logged-drop convention)
    assert(Dedup.capStats.get("fuzzyLink").exists(_._1 >= 1L))
  }

  test("cosineNearDups: hot-band cap bounds identical-vector floods") {
    val flood = ((0 until 30).map(i => (i.toLong, Array.fill(8)(1.0f))) ++
      Seq((100L, Array.tabulate(8)(j => if (j % 2 == 0) 0.9f else -1.0f)),
          (101L, Array.tabulate(8)(j => if (j % 2 == 0) 0.9f else -1.0f))))
      .toDF("vec_id", "embedding")
    val capped = Vectors.cosineNearDups(flood, "vec_id", "embedding",
      numPlanes = 16, threshold = 0.99, maxBandFreq = 10)
    val got = capped.select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)))
  }
}
