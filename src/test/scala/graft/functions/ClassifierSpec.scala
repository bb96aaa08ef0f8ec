package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** In-engine linear-classifier training: learns a separable vocabulary,
  * deterministic across partitionings (order-independent quantized
  * gradient sums), intercept-only on label-independent text. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // label-1 docs draw from a "good" vocabulary, label-0 from a "bad" one,
  // with a shared filler token in every doc
  private def corpus: Seq[(Long, String, Int)] =
    (0L until 120L).map { i =>
      val y = (i % 2).toInt
      val vocab = if (y == 1) Seq("signal", "clean", "useful")
                  else Seq("noise", "junk", "spam")
      val words = (0 until 8).map(j => vocab(((i * 7 + j) % 3).toInt))
      (i, (words :+ "the").mkString(" "), y)
    }

  test("learns a separable vocabulary to high accuracy") {
    val df = corpus.toDF("doc_id", "text", "y")
    val scored = Classifier.trainLinearScores(df, "doc_id", "text",
      col("y"), dim = 16, iters = 8, lr = 1.0 / 64)
      .as[(Long, Long, Double)].collect()
    assert(scored.length == 120)
    val acc = scored.count { case (_, label, score) =>
      (if (score >= 0.5) 1L else 0L) == label
    }.toDouble / scored.length
    assert(acc >= 0.95, s"separable corpus should be learnable, got $acc")
    // scores actually separate, not just threshold luck
    val m1 = scored.filter(_._2 == 1L).map(_._3).sum / scored.count(_._2 == 1L)
    val m0 = scored.filter(_._2 == 0L).map(_._3).sum / scored.count(_._2 == 0L)
    assert(m1 - m0 > 0.5, s"class means should separate: $m1 vs $m0")
  }

  test("training is partitioning-independent (quantized gradient sums)") {
    def run(parts: Int) = Classifier.trainLinearScores(
      corpus.toDF("doc_id", "text", "y").repartition(parts),
      "doc_id", "text", col("y"), dim = 16, iters = 4, lr = 1.0 / 64)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(run(1).toSeq == run(17).toSeq)
  }

  test("label-independent text trains toward the base rate intercept") {
    // every doc has identical text: only the intercept can move, and it
    // converges toward mean(y) = 0.25
    val df = (0L until 80L).map(i => (i, "same text here", (i % 4 == 0)))
      .toDF("doc_id", "text", "y")
    val scored = Classifier.trainLinearScores(df, "doc_id", "text",
      col("y").cast("int"), dim = 8, iters = 30, lr = 1.0 / 64)
      .as[(Long, Long, Double)].collect()
    val scores = scored.map(_._3).distinct
    assert(scores.length == 1, "identical rows must score identically")
    assert(math.abs(scores.head - 0.25) < 0.05,
      s"intercept should approach the base rate, got ${scores.head}")
  }

  test("plattScale: learns a positive slope on score-aligned labels and " +
    "beats the uninformed log-loss") {
    val df = (1 to 200).map { i =>
      val s = i / 200.0
      (s, if (s > 0.5) 1L else 0L)
    }.toDF("s", "y")
    val r = Classifier.plattScale(df, col("s"), col("y"), iters = 50,
      lr = 2.0).collect()(0)
    assert(r.getAs[Long]("n") === 200L)
    assert(r.getAs[Double]("a") > 0.0)     // higher score → higher p
    assert(r.getAs[Double]("b") < 0.0)     // centered near s = 0.5
    assert(r.getAs[Double]("avg_logloss") < math.log(2.0))
  }

  test("plattScale: partitioning cannot change the fitted model " +
    "(quantized gradient sums)") {
    val df = (1 to 300).map(i => (i / 300.0, (i % 3 == 0).compare(false)
      .toLong)).toDF("s", "y")
    val r1 = Classifier.plattScale(df.repartition(1), col("s"), col("y"),
      iters = 5).collect()(0)
    val r13 = Classifier.plattScale(df.repartition(13), col("s"), col("y"),
      iters = 5).collect()(0)
    assert(r1 === r13)
  }
}
