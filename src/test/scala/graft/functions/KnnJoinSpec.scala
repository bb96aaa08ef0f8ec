package graft.functions

import graft.SparkSpec

/** Corpus-scale kNN self-join (Vectors.knnJoinIVF): exhaustive when the
  * codebook is one cell, high-recall on separable clusters, deterministic
  * and partitioning-independent, never a self pair, hot-cell cap bounded. */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated directions with 20 noisy members each (the
  // KmeansSpec corpus — neighbors live inside their own cluster)
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

  // driver-side brute-force top-k by (cosine desc, id asc), self excluded
  private def brute(rows: Seq[(Long, Array[Float])], k: Int)
      : Map[Long, Seq[Long]] = {
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
    rows.map { case (q, qv) =>
      q -> rows.filter(_._1 != q)
        .map { case (n, nv) => (n, cos(qv, nv)) }
        .sortBy { case (n, c) => (-c, n) }.take(k).map(_._1)
    }.toMap
  }

  test("one cell == exhaustive: matches brute-force top-k exactly") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 3, nlist = 1, nprobe = 1, iters = 0)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._3).map(_._2).toSeq
      }
    val want = brute(corpus, 3)
    assert(got.size == 60)
    got.foreach { case (q, ns) => assert(ns == want(q), s"query $q") }
  }

  test("no self pairs; ranks contiguous from 1; cosine rounded") {
    val df = corpus.toDF("vec_id", "embedding")
    val rows = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 4, nlist = 3, nprobe = 2, iters = 2).collect()
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    assert(rows.forall(r =>
      math.abs(r.getDouble(2) * 1e6 - math.round(r.getDouble(2) * 1e6)) < 1e-3))
  }

  test("separable clusters, refined codebook: recall >= 0.9 vs brute force") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 3, nlist = 3, nprobe = 1, iters = 2)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val want = brute(corpus, 3).flatMap { case (q, ns) => ns.map(q -> _) }.toSet
    val recall = got.intersect(want).size.toDouble / want.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("partitioning-independent") {
    def run(parts: Int) = Vectors.knnJoinIVF(
      corpus.toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", k = 3, nlist = 3, nprobe = 2, iters = 1)
      .collect().map(_.toSeq).toSet
    assert(run(1) == run(13))
  }

  test("empty corpus: schema-correct empty result") {
    val df = corpus.toDF("vec_id", "embedding").limit(0)
    val out = Vectors.knnJoinIVF(df, "vec_id", "embedding", k = 3)
    assert(out.columns.toSeq ==
      Seq("query_id", "neighbor_id", "cosine", "rank"))
    assert(out.count() == 0)
  }

  test("IVF-PQ self-join: shortlist+rerank recovers brute-force top-k on " +
    "the separable corpus; output contract holds") {
    val df = corpus.toDF("vec_id", "embedding")
    // dim 4 -> m=2 subspaces of 2; generous rerank makes SDC loss moot
    val got = Vectors.knnJoinIVFPQ(df, "vec_id", "embedding",
      k = 3, nlist = 3, nprobe = 3, iters = 1, m = 2, subDim = 2,
      codebookK = 4, pqIters = 1, rerank = 59)
      .collect()
    assert(got.forall(r => r.getLong(0) != r.getLong(1)))
    got.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // with nprobe = nlist (all cells) and rerank = n-1 (all candidates),
    // the exact rerank sees every pair -> equals brute force
    val gotMap = got.groupBy(_.getLong(0)).map { case (q, rs) =>
      q -> rs.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq }
    val want = brute(corpus, 3)
    gotMap.foreach { case (q, ns) => assert(ns == want(q), s"query $q") }
    // a TIGHT shortlist still beats chance by a wide margin (SDC ranking
    // quality sanity — an m=2, k=4 quantizer on dim-4 noise is COARSE by
    // construction; random in-cell picks would land ~0.32)
    val tight = Vectors.knnJoinIVFPQ(df, "vec_id", "embedding",
      k = 3, nlist = 3, nprobe = 1, iters = 2, m = 2, subDim = 2,
      codebookK = 4, pqIters = 1, rerank = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val wantPairs = want.flatMap { case (q, ns) => ns.map(q -> _) }.toSet
    val recall = tight.intersect(wantPairs).size.toDouble / wantPairs.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("IVF-PQ empty corpus: schema-correct empty result") {
    val out = Vectors.knnJoinIVFPQ(
      corpus.toDF("vec_id", "embedding").limit(0), "vec_id", "embedding",
      k = 3, m = 2, subDim = 2, rerank = 3)
    assert(out.columns.toSeq ==
      Seq("query_id", "neighbor_id", "cosine", "rank"))
    assert(out.count() == 0)
  }

  test("incremental fold == full recompute against the frozen codebook") {
    val df = corpus.toDF("vec_id", "embedding")
    val old = df.filter($"vec_id" % 4 =!= 0)
    val batch = df.filter($"vec_id" % 4 === 0)
    val (_, cents) = Vectors.kmeansModel(old, "vec_id", "embedding",
      k = 3, iters = 1)
    val prev = Vectors.knnJoinWithCodebook(old, "vec_id", "embedding",
      k = 3, nprobe = 2, cents = cents)
    val inc = Vectors.knnJoinIncrement(prev, old, batch,
      "vec_id", "embedding", k = 3, nprobe = 2, cents = cents)
      .collect().map(_.toSeq).toSet
    val full = Vectors.knnJoinWithCodebook(df, "vec_id", "embedding",
      k = 3, nprobe = 2, cents = cents)
      .collect().map(_.toSeq).toSet
    assert(inc == full)
    // non-vacuous: the batch displaced at least one old neighbor list
    val prevSet = prev.collect().map(_.toSeq).toSet
    assert(prevSet != full)
    // and new queries are present
    assert(inc.exists(r => r.head.asInstanceOf[Long] % 4 == 0))
  }

  test("incremental fold with an empty batch is the previous graph") {
    val df = corpus.toDF("vec_id", "embedding")
    val (_, cents) = Vectors.kmeansModel(df, "vec_id", "embedding",
      k = 3, iters = 1)
    val prev = Vectors.knnJoinWithCodebook(df, "vec_id", "embedding",
      k = 3, nprobe = 2, cents = cents)
    val inc = Vectors.knnJoinIncrement(prev, df, df.limit(0),
      "vec_id", "embedding", k = 3, nprobe = 2, cents = cents)
    assert(inc.collect().map(_.toSeq).toSet ==
      prev.collect().map(_.toSeq).toSet)
  }

  test("hot-cell cap bounds candidate work without failing the query") {
    val df = corpus.toDF("vec_id", "embedding")
    val capped = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 3, nlist = 1, nprobe = 1, iters = 0, maxCellFreq = 10)
    // the single 60-member cell is dropped entirely -> no candidates
    assert(capped.count() == 0)
    val uncapped = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 3, nlist = 1, nprobe = 1, iters = 0, maxCellFreq = 60)
    assert(uncapped.count() == 180)
  }

  test("auto variant applies the √n nlist rule and matches the explicit call") {
    assert(Vectors.nlistForCorpus(0) == 1)
    assert(Vectors.nlistForCorpus(100) == 10)
    assert(Vectors.nlistForCorpus(1000000) == 1000)
    assert(Vectors.nlistForCorpus(Long.MaxValue) == 4096) // clamp
    val df = corpus.toDF("vec_id", "embedding") // 60 rows → nlist 8
    assert(Vectors.nlistForCorpus(60) == 8)
    val auto = Vectors.knnJoinIVFAuto(df, "vec_id", "embedding",
      k = 3, nprobe = 2, iters = 1).collect().toSet
    val explicit = Vectors.knnJoinIVF(df, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 2, iters = 1).collect().toSet
    assert(auto == explicit)
  }
}
