package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("pq codes: m columns in [0,k), one row per vector") {
    val out = Vectors.pqCodes(emb, "vec_id", "embedding",
      m = 4, subDim = 16, k = 8, iters = 1)
    assert(out.columns.toSeq ==
      Seq("vec_id", "code0", "code1", "code2", "code3"))
    assert(out.count() == emb.count())
    for (c <- Seq("code0", "code1", "code2", "code3"))
      assert(out.filter(col(c) < 0 || col(c) >= 8).count() == 0)
  }

  test("each subspace code equals kmeansAssign on that slice (seeded)") {
    val out = Vectors.pqCodes(emb, "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1)
    val direct = Vectors.kmeansAssign(
      emb.select(col("vec_id"), slice(col("embedding"), 33, 32).as("__sub")),
      "vec_id", "__sub", 4, 1, seed = "pq1")
    val joined = out.select(col("vec_id"), col("code1"))
      .join(direct.withColumnRenamed("cell", "want"), "vec_id")
    assert(joined.filter(col("code1") =!= col("want")).count() == 0)
  }

  test("adc search: topK ranked rows per query, reasonable recall vs exact") {
    val qs = emb.filter(col("vec_id") % 100 === 0)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq.sortBy(_._1)
    val adc = Vectors.pqSearch(emb, "vec_id", "embedding",
      m = 8, subDim = 8, k = 16, iters = 3, queries = qs, topK = 10,
      rerank = 50)
      .collect()
    assert(adc.length == qs.size * 10)
    // ranks are 1..10 within each query
    val byQ = adc.groupBy(_.getLong(0))
    byQ.values.foreach(rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 10L)))
    // recall@10 vs exact cosine top-10 (excluding self to match annTopK)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = Vectors.annTopK(emb, "vec_id", "embedding",
      queries, "qid", "qv", k = 10).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = byQ.view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = qs.map { case (qid, _) =>
      (exact(qid) & got(qid)).size.toDouble / exact(qid).size
    }.sum / qs.size
    assert(recall >= 0.6, s"adc+rerank recall@10 = $recall")
  }

  test("partitioning-independent codes") {
    val a = Vectors.pqCodes(emb.repartition(1), "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1).orderBy("vec_id").collect()
    val b = Vectors.pqCodes(emb.repartition(7), "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1).orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
