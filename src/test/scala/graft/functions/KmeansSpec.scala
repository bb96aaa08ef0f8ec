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
}
