package graft.serving

import scala.util.Random
import graft.SparkSpec

class VectorIndexSpec extends SparkSpec {

  /** Clustered corpus — the workload ANN indexes exist for (on uniform
    * random vectors LSH/IVF recall degrades to the sampled fraction by
    * construction; real embedding spaces are clustered). 60 clusters ×
    * 10 points, tight noise. */
  private def clustered(): Array[(Long, Array[Float])] = {
    val rnd = new Random(42)
    val dim = 64
    (0 until 60).flatMap { c =>
      val center = Array.fill(dim)(rnd.nextGaussian().toFloat)
      (0 until 10).map { j =>
        val v = center.map(x => x + 0.05f * rnd.nextGaussian().toFloat)
        (c * 10L + j) -> v
      }
    }.toArray
  }

  test("indexed nearest ~= linear scan on clustered vectors, self-hit exact") {
    val store = new OnlineStore
    val all = clustered()
    import spark.implicits._
    val df = all.toSeq.map { case (id, v) => (id, v) }.toDF("entity", "vector")
    store.loadVectors("emb", df)
    val queries = all.take(30)
    val scanTop = queries.map { case (id, v) =>
      id -> store.nearest("emb", v, 10).map(_._1).toSet
    }.toMap
    store.buildIndex("emb")
    var hits = 0
    queries.foreach { case (id, v) =>
      val idxTop = store.nearest("emb", v, 10)
      assert(idxTop.head._1 == id && idxTop.head._2 > 0.999999) // self first
      hits += idxTop.map(_._1).count(scanTop(id).contains)
    }
    val recall = hits.toDouble / (queries.length * 10)
    assert(recall >= 0.9, s"recall $recall")
  }

  test("cluster members share buckets; index covers the corpus") {
    val all = clustered()
    val idx = new VectorIndex(16)
    all.foreach { case (id, v) => idx.add(id, v) }
    assert(idx.size == all.length)
    val sigs = all.map { case (_, v) => idx.signature(v) }
    // far fewer distinct signatures than points (clusters collapse), but
    // more than a handful (clusters separate)
    assert(sigs.toSet.size < all.length / 2 && sigs.toSet.size > 10)
    // members of one cluster overwhelmingly share their signature
    val within = all.groupBy(_._1 / 10).values.map { grp =>
      grp.map { case (_, v) => idx.signature(v) }.groupBy(identity)
        .values.map(_.length).max.toDouble / grp.length
    }
    assert(within.sum / within.size > 0.7)
  }
}
