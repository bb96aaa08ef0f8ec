package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** knnJoinIVF / knnJoinIncrement over random corpora:
  *  - single-cell IVF ≡ a driver brute-force top-k (rounded-cosine desc,
  *    id asc — the operator's documented rank key) on every corpus shape
  *    ScalaCheck produces;
  *  - the incremental fold ≡ a full recompute against the same frozen
  *    codebook for random old/batch splits and random (nlist, nprobe). */
class KnnJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Corpus = List[(Long, Array[Float])]

  // ids 0..14, dim 4, small integer-ish components; last component pinned
  // to 1 so no vector has zero norm (NaN cosines are out of contract)
  private val genCorpus: Gen[Corpus] =
    Gen.choose(2, 15).flatMap { n =>
      Gen.sequence[List[(Long, Array[Float])], (Long, Array[Float])](
        (0 until n).toList.map { i =>
          Gen.listOfN(3, Gen.choose(-3, 3)).map(cs =>
            (i.toLong, (cs.map(_.toFloat) :+ 1.0f).toArray))
        })
    }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver brute-force: per query the top-k neighbors by
    * (round(cos,6) desc, id asc), self excluded — the operator's key. */
  private def brute(rows: Corpus, k: Int): Set[(Long, Long, Double, Long)] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.flatMap { case (q, qv) =>
      rows.filter(_._1 != q)
        .map { case (nId, nv) => (nId, round6(cos(qv, nv))) }
        .sortBy { case (nId, c) => (-c, nId) }.take(k).zipWithIndex
        .map { case ((nId, c), i) => (q, nId, c, (i + 1).toLong) }
    }.toSet
  }

  test("single-cell IVF == driver brute-force top-k on random corpora") {
    val prop = Prop.forAll(genCorpus) { rows: Corpus =>
      val got = Vectors.knnJoinIVF(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 3, nlist = 1, nprobe = 1, iters = 0)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
      got == brute(rows, 3)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("incremental fold == full recompute for random splits and codebooks") {
    val gen = for {
      rows <- genCorpus
      nlist <- Gen.choose(1, 4)
      nprobe <- Gen.choose(1, 2)
      splitMod <- Gen.choose(2, 4)
    } yield (rows, nlist, nprobe, splitMod)
    val prop = Prop.forAll(gen) {
      case (rows: Corpus, nlist: Int, nprobe: Int, splitMod: Int) =>
        val df = rows.toDF("vec_id", "embedding")
        val old = df.filter($"vec_id" % splitMod =!= 0)
        val batch = df.filter($"vec_id" % splitMod === 0)
        val (_, cents) = Vectors.kmeansModel(old, "vec_id", "embedding",
          k = nlist, iters = 1)
        if (cents.isEmpty) true // empty old corpus: no codebook to freeze
        else {
          val prev = Vectors.knnJoinWithCodebook(old, "vec_id", "embedding",
            k = 2, nprobe = nprobe, cents = cents)
          val inc = Vectors.knnJoinIncrement(prev, old, batch,
            "vec_id", "embedding", k = 2, nprobe = nprobe, cents = cents)
            .collect().map(_.toSeq).toSet
          val full = Vectors.knnJoinWithCodebook(df, "vec_id", "embedding",
            k = 2, nprobe = nprobe, cents = cents)
            .collect().map(_.toSeq).toSet
          inc == full
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
