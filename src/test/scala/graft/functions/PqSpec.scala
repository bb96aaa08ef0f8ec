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

  test("partitioning-independent codes") {
    val a = Vectors.pqCodes(emb.repartition(1), "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1).orderBy("vec_id").collect()
    val b = Vectors.pqCodes(emb.repartition(7), "vec_id", "embedding",
      m = 2, subDim = 32, k = 4, iters = 1).orderBy("vec_id").collect()
    assert(a.toSeq == b.toSeq)
  }
}
