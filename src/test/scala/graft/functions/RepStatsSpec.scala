package graft.functions

import graft.SparkSpec
import graft.functions.expressions.RepExprs
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Hand-computed repetition-signal cases for [[RepExprs.repStats]]. */
class RepStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(text: String): (Long, Long, Long, Long) = {
    val Row(n: Long, nd: Long, t2: Long, t3: Long) =
      Seq(Tuple1(text)).toDF("t")
        .select(RepExprs.repStats($"t").as("s"))
        .select($"s.n_tokens", $"s.n_distinct", $"s.top2_n", $"s.top3_n")
        .collect().head
    (n, nd, t2, t3)
  }

  test("distinct tokens and dominant n-grams") {
    // tokens: [a, b, a, b, a] — 2-grams: "a b"×2, "b a"×2; 3-grams:
    // "a b a"×2, "b a b"×1
    assert(stats("a b a b a") == ((5L, 2L, 2L, 2L)))
    // all-same token: 2-gram "x x"×3, 3-gram "x x x"×2
    assert(stats("x x x x") == ((4L, 1L, 3L, 2L)))
    // no repetition at all
    assert(stats("one two three") == ((3L, 3L, 1L, 1L)))
  }

  test("case folding and whitespace runs match the TOKS_LOWER contract") {
    assert(stats("The THE  the") == ((3L, 1L, 2L, 1L)))
    assert(stats("  a \t b \n a  ") == ((3L, 2L, 1L, 1L)))
  }

  test("short and empty documents") {
    assert(stats("") == ((0L, 0L, 0L, 0L)))
    assert(stats("solo") == ((1L, 1L, 0L, 0L)))
    assert(stats("two tokens") == ((2L, 2L, 1L, 0L)))
  }

  test("boilerplate scores higher than prose on the derived fractions") {
    val df = Seq(
      (1L, "click here click here click here click here"),
      (2L, "the quick brown fox jumps over the lazy dog")).toDF("id", "t")
    val st = RepExprs.repStats(col("t"))
    val out = df.select(col("id"),
      (st.getField("top2_n").cast("double") /
        (st.getField("n_tokens") - 1)).as("top2_frac"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.5)
    assert(out(2L) < 0.2)
  }
}
