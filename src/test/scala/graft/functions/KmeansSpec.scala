package graft.functions

import graft.SparkSpec

/** Deterministic spherical k-means + diversity sampling: separable clusters
  * recovered, refinement improves cohesion, everything
  * partitioning-independent. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions with 20 noisy members each
  private def corpus: Seq[(Long, Array[Float])] = {
    val bases = Seq(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f, 0.0f))
    for {
      (b, ci) <- bases.zipWithIndex
      j <- 0 until 20
    } yield ((ci * 100 + j).toLong,
      b.zipWithIndex.map { case (x, i) =>
        x + 0.05f * (((ci * 100 + j) * 31 + i) % 7 - 3)
      })
  }

  test("recovers separable clusters; members co-assigned with their base") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Vectors.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 60)
    // every true cluster lands in ONE k-means cell
    (0 until 3).foreach { ci =>
      val cells = (0 until 20).map(j => got((ci * 100 + j).toLong)).distinct
      assert(cells.size == 1, s"true cluster $ci split across cells $cells")
    }
    // and the three cells are distinct
    assert((0 until 3).map(ci => got((ci * 100L))).distinct.size == 3)
  }

  test("assignment is partitioning-independent (integer-sum centroids)") {
    def run(parts: Int) = Vectors.kmeansAssign(
      corpus.toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(run(1) == run(13))
  }

  test("diversity sample: per-cluster quota, deterministic picks") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Vectors.diversitySample(df, "vec_id", "embedding",
      k = 3, iters = 1, perCluster = 4).collect()
    assert(got.length == 12)
    assert(got.groupBy(_.getLong(1)).forall(_._2.length == 4))
    val again = Vectors.diversitySample(df, "vec_id", "embedding",
      k = 3, iters = 1, perCluster = 4).collect()
    assert(got.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("semantic dedup: within-cell min-id survivor matches brute force") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Vectors.semanticDedup(df, "vec_id", "embedding",
      k = 3, iters = 1, threshold = 0.999)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 60)
    // brute-force replay: same cells, exact cosine, drop-if-smaller-id rule
    val cells = Vectors.kmeansAssign(df, "vec_id", "embedding", k = 3, iters = 1)
      .as[(Long, Long)].collect().toMap
    val vecs = corpus.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expectDropped = corpus.map(_._1).filter { id =>
      corpus.map(_._1).exists(o =>
        o < id && cells(o) == cells(id) && cos(vecs(o), vecs(id)) >= 0.999)
    }.toSet
    assert(got.filter(_._3 == 0L).map(_._1).toSet == expectDropped)
    assert(expectDropped.nonEmpty, "test corpus should contain semantic dups")
    // cells in the output agree with the assignment
    got.foreach { case (id, cell, _) => assert(cells(id) == cell) }
  }

  test("semantic dedup: a degenerate giant cell is exempted from pairing") {
    val df = corpus.toDF("vec_id", "embedding")
    // cap so low every cell exceeds it: nothing is ever paired or dropped
    val got = Vectors.semanticDedup(df, "vec_id", "embedding",
      k = 3, iters = 0, threshold = 0.0, maxCellPairs = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 60 && got.forall(_._3 == 1L))
  }

  test("assignToCentroids reproduces the trainer's own final assignment") {
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
    val (assignments, cents) = Vectors.kmeansModel(df, "vec_id",
      "embedding", k = 4, iters = 2)
    val replayed = Vectors.assignToCentroids(df, "vec_id", "embedding",
        cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trained = assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed === trained) // persisted-codebook path ≡ training path
  }
}
