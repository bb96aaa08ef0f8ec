package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any =
    Seq(Tuple1(text)).toDF("t").select(colExpr).collect().head.get(0)

  test("tokenCount handles empties and runs of whitespace") {
    assert(one(TextFunctions.tokenCount($"t"), "a  b\tc\nd") == 4)
    assert(one(TextFunctions.tokenCount($"t"), "   ") == 0)
    assert(one(TextFunctions.tokenCount($"t"), "") == 0)
  }

  test("langId picks stopword-dominant language, CJK, und") {
    assert(one(TextFunctions.langId($"t"), "the cat sat on the mat with a hat") == "en")
    assert(one(TextFunctions.langId($"t"), "der Hund und die Katze sind im Haus") == "de")
    assert(one(TextFunctions.langId($"t"), "el perro y el gato en la casa por una") == "es")
    assert(one(TextFunctions.langId($"t"), "le chien et le chat dans les maisons pour") == "fr")
    assert(one(TextFunctions.langId($"t"), "你好世界这是中文文本") == "zh")
    assert(one(TextFunctions.langId($"t"), "xyzzy plugh") == "und")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one(TextFunctions.fingerprintMd5($"t"), "Hello   World")
    val b = one(TextFunctions.fingerprintMd5($"t"), "hello world")
    val c = one(TextFunctions.fingerprintMd5($"t"), "hello worlds")
    assert(a == b && a != c)
  }

  test("shingles produce distinct k-grams of the normalized text") {
    val got = one(TextFunctions.shingles($"t", 3), "abcabc")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got.toSet == Set("abc", "bca", "cab"))
    // sub-k text: EMPTY, not a descending-sequence artifact
    val tiny = one(TextFunctions.shingles($"t", 3), "ab")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(tiny.isEmpty)
  }

  test("chunkDocs: overlap windows, short last chunk, no covered fragment") {
    val df = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("id", "t")
    val got = TextFunctions.chunkDocs(df, "id", "t", size = 8, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == Set(
      (1L, 0L, 0L, "abcdefgh"),
      (1L, 1L, 4L, "efghij"), // short last chunk; chars 8-9 covered HERE
      (2L, 0L, 0L, "abc")))   // single sub-size chunk; empty doc -> none
  }

  test("qualityScore in [0,1], higher for clean prose than symbol soup") {
    val good = one(TextFunctions.qualityScore($"t"),
      "The quick brown fox jumps over the lazy dog and runs into the forest.")
      .asInstanceOf[Double]
    val bad = one(TextFunctions.qualityScore($"t"), "@@@!!! ### $$$ %%% ^^^ &&&")
      .asInstanceOf[Double]
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup keeps min-id doc per normalized text") {
    val docs = Seq((1L, "Hello World"), (2L, "hello   world"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("containmentPairs: a quoted substring scores ~1 where jaccard " +
    "stays low") {
    import org.apache.spark.sql.functions.{col, lit}
    val quote = "the quick brown fox jumps over the lazy dog again and again"
    val article = ("long filler sentence number one two three four five " +
      "six seven eight nine ten. ") * 8 + quote +
      (" more filler trailing content continues here for a while longer " +
        "and then some. ") * 8
    val docs = Seq((1L, quote), (2L, article),
      (3L, "completely unrelated text with different words entirely " +
        "nothing shared at all here"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "text", "doc_id",
        shingleK = 20, window = 24, minShared = 1, minContainment = 0.5)
      .collect()
    assert(out.length === 1)
    val r = out(0)
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L))) // small inside big
    assert(r.getDouble(3) >= 0.9, s"containment=${r.getDouble(3)}")
    // the symmetric measure misses it: the union is article-dominated
    val jac = docs.where(col("doc_id") === 1L)
      .crossJoin(docs.where(col("doc_id") === 2L)
        .select(col("text").as("t2")))
      .select(graft.functions.expressions.HashExprs.kgramJaccard(
        TextFunctions.normalizedText(col("text")),
        TextFunctions.normalizedText(col("t2")), 20).as("j"))
      .collect()(0).getDouble(0)
    assert(jac < 0.3, s"jaccard=$jac")
  }

  test("minhash near-dups finds the known near-duplicate pairs on testdata") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty)
    assert(pairs.contains((8L, 120L)), s"expected planted near-dup (8,120) in $pairs")
  }

  test("minhash jaccard estimates true jaccard on identical docs") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.99)
      .collect()
    assert(got.length == 1 && got.head.getDouble(2) == 1.0)
  }

  test("simhash: identical texts distance 0, unrelated texts far") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different subject matter entirely unrelated words")
    ).toDF("doc_id", "text")
    val h = df.select($"doc_id", Dedup.simhash64($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(1L) == h(2L))
    assert(java.lang.Long.bitCount(h(1L) ^ h(3L)) > 10)
  }

  test("winnowing: identical docs share all fingerprints, shared substrings overlap") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "a completely different sentence that still mentions the lazy dog near the river"),
      (4L, "zzz qqq xxx vvv www uuu ttt sss rrr")
    ).toDF("doc_id", "text")
    val fps = df.select($"doc_id", Dedup.winnowFingerprints($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L) && fps(1L).nonEmpty)
    assert((fps(1L) & fps(3L)).nonEmpty)   // shared "the lazy dog near the river"
    assert((fps(1L) & fps(4L)).isEmpty)
  }

  test("ngramJaccard computes exact overlap for explicit pairs") {
    val docs = Seq((1L, "abcdef"), (2L, "abcdef"), (3L, "zzzzzz")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("idA", "idB")
    val got = Dedup.ngramJaccard(docs, pairs, "text", "doc_id", k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
    // columns order: idB, idA after joins; use fieldIndex-safe access instead
    val byPair = Dedup.ngramJaccard(docs, pairs, "text", "doc_id", k = 3)
      .collect().map(r => (r.getAs[Long]("idA"), r.getAs[Long]("idB")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(byPair((1L, 2L)) == 1.0)
    assert(byPair((1L, 3L)) == 0.0)
  }
}

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0") {
    val df = Seq((Array(1.0f, 0f), Array(1.0f, 0f), Array(0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine($"a", $"b").as("same"),
      Vectors.cosine($"a", $"c").as("orth")).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("int8 quantization: range, exactness at extremes, error <= scale/2") {
    val df = Seq(
      Tuple1(Array(2.54f, -1.27f, 0f, 0.025f)),
      Tuple1(Array(0f, 0f, 0f, 0f))).toDF("e")
    val out = df.select(
      Vectors.int8Scale($"e").as("s"),
      Vectors.quantizeInt8($"e", Vectors.int8Scale($"e")).as("q")).collect()
    val (s0, q0) = (out(0).getDouble(0), out(0).getSeq[Long](1))
    assert(math.abs(s0 - 2.54 / 127) < 1e-9)
    assert(q0 == Seq(127L, -63L, 0L, 1L)) // -63.5 → floor(-63) = -63; 1.25 → 1
    assert(out(1).getDouble(0) == 0.0 && out(1).getSeq[Long](1).forall(_ == 0L))
    // reconstruction error bounded by half a quantization step
    val err = df.filter(size($"e") > 0).select(
      array_max(zip_with($"e",
        Vectors.dequantizeInt8(
          Vectors.quantizeInt8($"e", Vectors.int8Scale($"e")),
          Vectors.int8Scale($"e")),
        (a, b) => abs(a.cast("double") - b))).as("err"),
      Vectors.int8Scale($"e").as("s")).collect()
    err.foreach(r => assert(r.getDouble(0) <= r.getDouble(1) / 2 + 1e-9))
  }

  test("annTopK returns ranked neighbors excluding self") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val got = Vectors.annTopK(emb, "vec_id", "embedding",
      emb.filter($"vec_id" === 0), "vec_id", "embedding", k = 5).collect()
    assert(got.length == 4) // self is rank 1, excluded
    val sims = got.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(!got.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("hardNegatives: band gate excludes near-dups and distant vectors") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val full = Vectors.annTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 1000000).collect()
    val banded = Vectors.hardNegatives(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", lo = 0.0, hi = 0.3, k = 5).collect()
    // every mined negative's cosine is in [0, 0.3)
    banded.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= 0.0 && c < 0.3)
    }
    // and equals the top of the full ranking RESTRICTED to the band
    val expect = full
      .filter(r => r.getAs[Double]("cosine") >= 0.0 &&
        r.getAs[Double]("cosine") < 0.3)
      .groupBy(_.getAs[Long]("query_id"))
      .toSeq
      .flatMap { case (_, rs) =>
        rs.sortBy(r => (-r.getAs[Double]("cosine"),
          r.getAs[Long]("neighbor_id"))).take(5).toSeq
      }
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    assert(banded.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Long]("neighbor_id"))).toSet == expect)
  }

  test("LSH near-dups are a subset of exact near-dups (precision 1.0)") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val lsh = Vectors.cosineNearDups(emb, "vec_id", "embedding",
      numPlanes = 16, threshold = 0.4)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val exact = Vectors.cosineNearDupsExact(emb, "vec_id", "embedding", 0.4)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"lsh=$lsh exact=$exact")
    assert(lsh.nonEmpty)
  }
}

class IvfSpec extends graft.SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  test("IVF top-k: high recall vs exact brute force, correct ranking") {
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Vectors.annTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Vectors.annTopKIVF(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 10, nlist = 8, nprobe = 4)
      .collect()
    // per-query ranking is consistent
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
    val ivfPairs = ivf.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (ivfPairs & exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall") // nprobe=4 of nlist=8 -> ~half the corpus scanned
    assert(ivfPairs.subsetOf(ivfPairs)) // sanity
  }

  test("embeddingAudit flags planted bad-dim/zero/NaN vectors; median " +
    "norm is rank-selected") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, Array(3.0f, 4.0f)),        // norm 5
      ("a", 2L, Array(0.0f, 0.0f)),        // zero vector, norm 0
      ("a", 3L, Array(1.0f, 0.0f, 0.0f)),  // wrong dim, norm 1
      ("a", 4L, Array(Float.NaN, 1.0f)))   // non-finite
      .toDF("label", "vec_id", "embedding")
    val r = Vectors.embeddingAudit(rows, "vec_id", "embedding", "label",
      expectedDim = 2).collect()(0)
    assert(r.getAs[Long]("n_vectors") === 4L)
    assert(r.getAs[Long]("n_bad_dim") === 1L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("n_nonfinite") === 1L)
    // norms sorted: [0, 1, NaN?, 5] — rank (4+1) div 2 = 2 → second value
    assert(r.getAs[Double]("p50_norm") === 1.0)
  }
}
