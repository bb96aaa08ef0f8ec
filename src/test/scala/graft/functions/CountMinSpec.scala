package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val items = Seq.tabulate(300)(i => s"item${i % 17}").toDF("item")

  test("estimates never undercount and are exact at ample width") {
    val sketch = CountMin.build(items, "item", depth = 4, width = 1024)
    val probes = items.distinct()
    val est = CountMin.estimate(sketch, probes, "item", 4, 1024)
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy("item").count().as[(String, Long)]
      .collect().toMap
    exact.foreach { case (k, v) =>
      assert(est(k) >= v, s"undercount for $k")
      // 17 distinct items in 4x1024 cells: collisions are ~impossible
      assert(est(k) == v, s"collision at ample width for $k")
    }
  }

  test("narrow sketch overcounts but never undercounts") {
    val sketch = CountMin.build(items, "item", depth = 2, width = 4)
    val est = CountMin.estimate(sketch, items.distinct(), "item", 2, 4)
      .as[(String, Long)].collect().toMap
    val exact = items.groupBy("item").count().as[(String, Long)]
      .collect().toMap
    exact.foreach { case (k, v) => assert(est(k) >= v) }
    assert(exact.exists { case (k, v) => est(k) > v }, "expected collisions")
  }

  test("unseen probes estimate bounded by cell mass, sketch stays tiny") {
    val sketch = CountMin.build(items, "item", depth = 4, width = 64)
    assert(sketch.count() <= 4L * 64)
    val unseen = Seq("never-seen-a", "never-seen-b").toDF("item")
    val est = CountMin.estimate(sketch, unseen, "item", 4, 64)
      .as[(String, Long)].collect().toMap
    // one-sided error only: an unseen item reads whatever collides there
    assert(est.values.forall(v => v >= 0L && v <= 300L))
  }
}
