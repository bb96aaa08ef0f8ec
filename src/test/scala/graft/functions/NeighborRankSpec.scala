package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TF-IDF cosine neighbors and percentile-rank transform. */
class NeighborRankSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfNeighbors: identical docs have cosine 1; common tokens " +
    "capped out; result is symmetric") {
    val docs = Seq(
      (1L, "alpha beta common"), (2L, "alpha beta common"),
      (3L, "gamma delta common"), (4L, "epsilon zeta common"))
      .toDF("doc_id", "text")
    // maxDf=3 drops "common" (df=4); alpha/beta bind 1 and 2 only
    val out = Retrieval.tfidfNeighbors(docs, "doc_id", "text",
        k = 3, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out.keySet === Set((1L, 2L), (2L, 1L))) // only the true pair
    assert(out((1L, 2L)) === 1.0) // identical weight vectors
    assert(out((2L, 1L)) === 1.0)
  }

  test("tfidfNeighbors: rarer shared vocabulary ranks higher") {
    val docs = Seq(
      (1L, "rare1 rare2 filler1"), (2L, "rare1 rare2 filler2"),
      (3L, "rare1 other1 other2"), (4L, "unrelated words here"),
      (5L, "rare1 more stuff"))
      .toDF("doc_id", "text")
    val out = Retrieval.tfidfNeighbors(docs, "doc_id", "text",
        k = 3, maxDf = 4)
      .where(col("id") === 1L).orderBy("rank")
      .collect().map(_.getLong(1))
    // doc 2 shares {rare1, rare2}, docs 3/5 only {rare1}
    assert(out.head === 2L)
    assert(out.toSet === Set(2L, 3L, 5L))
  }

  test("percentileRank: closed form with ties") {
    val df = Seq(("g", 1L, 10.0), ("g", 2L, 20.0), ("g", 3L, 20.0),
      ("g", 4L, 40.0), ("h", 5L, 7.0))
      .toDF("grp", "id", "v")
    val out = graft.ops.Profile.percentileRank(df, "grp", "id", col("v"))
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // g: n=4 -> pr = (rank-1)/3; ties at 20.0 share rank 2
    assert(out(1L) === 0.0)
    assert(out(2L) === out(3L))
    assert(math.abs(out(2L) - 1.0 / 3.0) < 1e-6)
    assert(out(4L) === 1.0)
    assert(out(5L) === 0.0) // singleton group: percent_rank = 0
  }
}
