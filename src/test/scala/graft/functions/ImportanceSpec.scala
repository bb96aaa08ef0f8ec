package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta alpha"),
    (2L, "gamma delta gamma delta"),
    (3L, "alpha beta gamma"),
    (4L, "epsilon zeta")
  ).toDF("doc_id", "text")

  test("weights rank target-like documents above off-target ones") {
    val target = corpus.where($"doc_id".isin(1L, 3L)) // alpha/beta docs
    val w = Importance.dsirWeights(corpus, target, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w.size == 4)
    // docs built from target grams score above the never-in-target doc
    assert(w(1L) > w(4L))
    assert(w(3L) > w(4L))
  }

  test("matches a hand-rolled hashed model, n_grams = 2·tokens - 1") {
    val target = corpus.where($"doc_id" === 1L)
    val got = Importance.dsirWeights(corpus, target, "text", "doc_id",
        buckets = 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    val docs = Map(
      1L -> "alpha beta alpha", 2L -> "gamma delta gamma delta",
      3L -> "alpha beta gamma", 4L -> "epsilon zeta")
    def gs(t: String): Seq[String] = {
      val toks = t.split("\\s+").toSeq
      toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    def bkt(g: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val lo = java.nio.ByteBuffer.wrap(d, 8, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      ((lo & Long.MaxValue) % 64).toInt
    }
    val rawCnt = docs.values.toSeq.flatMap(gs).groupBy(bkt)
      .map { case (k, v) => k -> v.size.toLong }
    val tgtCnt = gs(docs(1L)).groupBy(bkt)
      .map { case (k, v) => k -> v.size.toLong }
    val bigR = rawCnt.values.sum
    val bigT = tgtCnt.values.sum
    def lam(b: Int): BigDecimal = {
      val v = math.log((tgtCnt.getOrElse(b, 0L) + 1.0) / (bigT + 64)) -
        math.log((rawCnt(b) + 1.0) / (bigR + 64))
      // Spark's round(double, 9) goes through BigDecimal.valueOf (shortest
      // decimal repr), not the exact binary expansion
      BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    docs.foreach { case (id, text) =>
      val byB = gs(text).groupBy(bkt).map { case (k, v) => k -> v.size }
      val w = byB.map { case (b, c) => lam(b) * c }.sum
      val nToks = text.split("\\s+").length
      assert(got(id)._1 == 2L * nToks - 1, s"doc $id gram count")
      assert(got(id)._2 ==
        w.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc $id weight")
    }
  }

  test("one corpus-size shuffle: doc-bucket agg; lambda joins broadcast") {
    val df = Importance.dsirWeights(corpus, corpus.limit(2), "text", "doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
