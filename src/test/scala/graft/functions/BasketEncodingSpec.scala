package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Market-basket co-occurrence and categorical encodings — hand-computed
  * lifts, smoothing arithmetic, hot-basket cap. */
class BasketEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence: hand-computed support and lift") {
    // baskets: 1={a,b,c} 2={a,b} 3={a,b} 4={c}  (dup line in basket 2)
    val lines = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "a"), (2L, "b"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "c")
    ).toDF("basket", "item")
    val out = Basket.cooccurrence(lines, "basket", "item",
        minSupport = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // only (a,b): support 3; n_a=3, n_b=3, N=4 -> lift = 12/9 = 1.333333
    assert(out.toSeq === Seq(("a", "b", 3L, 3L, 3L, 1.333333)))
  }

  test("cooccurrence: hot-basket cap drops oversized baskets entirely") {
    val big = (1 to 50).map(i => (9L, s"i$i"))
    val lines = (Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")) ++ big)
      .toDF("basket", "item")
    val out = Basket.cooccurrence(lines, "basket", "item",
      minSupport = 2, maxBasketSize = 10, topK = 100).collect()
    // the 50-item basket contributes no pairs AND no item frequencies;
    // (a,b) lift = 2*2/(2*2) = 1
    assert(out.map(r => (r.getString(0), r.getString(1), r.getDouble(5)))
      .toSeq === Seq(("a", "b", 1.0)))
  }

  test("targetEncode: smoothing pulls small categories to the prior") {
    // prior = (10+20+30+40)/4 = 25; cat x: n=2 mean 15, cat y: n=2 mean 35
    val df = Seq(("x", 10.0), ("x", 20.0), ("y", 30.0), ("y", 40.0))
      .toDF("cat", "y")
    val out = Encoding.targetEncode(df, "cat", col("y"), smoothing = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("x") === ((2L, (30.0 + 2 * 25.0) / 4.0, 25.0))) // 20.0
    assert(out("y") === ((2L, (70.0 + 2 * 25.0) / 4.0, 25.0))) // 30.0
  }

  test("frequencyEncode: shares sum to 1") {
    val df = Seq("a", "a", "a", "b").toDF("cat")
    val out = Encoding.frequencyEncode(df, "cat")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out === Map("a" -> 0.75, "b" -> 0.25))
  }
}
