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

  test("add() of an already-present id evicts the old entry (add ≡ upsert) " +
    "— no orphaned bucket entry serving the stale vector") {
    val idx = new VectorIndex(8)
    val oldV = Array.fill(16)(1.0f)
    val newV = Array.tabulate(16)(i => if (i == 0) -1.0f else 0.01f)
    idx.add(7L, oldV)
    idx.add(7L, newV) // direct re-add, NOT upsert — the r9 ADVICE hazard
    assert(idx.size == 1, "re-add must not append a second entry")
    // a query aligned with the OLD vector must not find id 7 at cosine ~1
    val hit = idx.nearest(oldV, 1).head
    assert(hit._1 == 7L && hit._2 < 0.5,
      s"stale vector still served: cosine ${hit._2}")
    // and remove() fully clears it
    assert(idx.remove(7L) && idx.size == 0)
    assert(idx.nearest(oldV, 1).isEmpty)
  }

  test("exact cosine ties order by NUMERIC id (2 before 10), matching the " +
    "oracle's ORDER BY neighbor_id, on both indexed and scan paths") {
    val v = Array.fill(8)(1.0f)
    val idx = new VectorIndex(8)
    Seq(10L, 2L, 33L).foreach(id => idx.add(id, v.clone()))
    assert(idx.nearest(v, 3).map(_._1) == Seq(2L, 10L, 33L))
    // scan path (no index built) through OnlineStore
    val store = new OnlineStore
    import spark.implicits._
    store.loadVectors("emb",
      Seq(10L, 2L, 33L).map(id => (id, v.toSeq)).toDF("entity", "vector"))
    assert(store.nearest("emb", v, 3).map(_._1.toString.toLong) ==
      Seq(2L, 10L, 33L))
    // non-numeric ids order lexically after numeric ones
    assert(VectorIndex.idTieKey("abc")._1 == 1 &&
      VectorIndex.idTieKey("42")._1 == 0)
  }
}
