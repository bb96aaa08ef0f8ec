package graft.functions

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the count-min sketch: estimates NEVER undercount
  * (the structure's one-sided guarantee) for any item multiset and any
  * sketch geometry, including probes the sketch never saw (≥ 0). */
class CountMinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCase = for {
    n <- Gen.choose(1, 200)
    items <- Gen.listOfN(n, Gen.choose(0, 30).map(i => s"w$i"))
    depth <- Gen.choose(1, 5)
    width <- Gen.oneOf(2, 8, 64, 1024)
  } yield (items, depth, width)

  test("one-sided error for any multiset and geometry") {
    val prop = Prop.forAll(genCase) { case (items, depth, width) =>
      val df = items.toDF("item")
      val sketch = CountMin.build(df, "item", depth, width)
      val probes = (items.distinct :+ "never-seen").toDF("item")
      val est = CountMin.estimate(sketch, probes, "item", depth, width)
        .as[(String, Long)].collect().toMap
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size }
      exact.forall { case (k, v) => est(k) >= v } &&
        est("never-seen") >= 0L &&
        sketch.count() <= depth.toLong * width
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.toString)
  }
}
