package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{BpeCount, BpeVocab}
import org.apache.spark.sql.functions._

/** Hand-computed greedy-merge BPE cases against [[BpeVocab.merges]].
  * Rank indices referenced below: (t,h)=0 (th,e)=1 (i,n)=2 (a,n)=3 (a,t)=7
  * (i,t)=14 (an,d)=16 (in,g)=17 (th,at)=37 (w,i)=41 (wi,th)=52 (it,h)=54. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def n(text: String): Long =
    Seq(Tuple1(text)).toDF("t")
      .select(TextFunctions.bpeTokenCount($"t").as("n"))
      .as[Long].collect().head

  test("cascaded merges collapse common words to one token") {
    // the: (t,h) -> (th,e); that: (t,h), (a,t), (th,at); and: (a,n), (an,d)
    assert(n("the") == 1L)
    assert(n("that") == 1L)
    assert(n("and") == 1L)
    assert(n("ing") == 1L) // (i,n) then (in,g)
  }

  test("lowest rank wins over leftmost pair") {
    // [w,i,t,h]: rank order applies (t,h)=0 first, then (w,i)=41, then
    // (wi,th)=52 -> 1 token. Applying (i,t)=14 before (t,h) would dead-end
    // at [w,ith] = 2 tokens, so count 1 proves rank priority.
    assert(n("with") == 1L)
  }

  test("same-rule repeats merge leftmost first, one at a time") {
    // [i,n,i,n]: (i,n)=2 at idx 0, then idx 1 -> [in,in]; no (in,in) rule.
    assert(n("inin") == 2L)
  }

  test("unmergeable text counts code points per word") {
    assert(n("xyz") == 3L)
    assert(n("héllo") == 5L)  // no rule touches é; code points, not bytes
    assert(n("你好") == 2L)
  }

  test("multi-word, case, and whitespace handling") {
    assert(n("THE that\txyz") == 1L + 1L + 3L)
    assert(n("") == 0L)
    assert(n("   \t\n ") == 0L)
  }

  test("null text yields null") {
    val got = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(TextFunctions.bpeTokenCount($"t")).collect().head
    assert(got.isNullAt(0))
  }

  test("expression matches driver-side countWord on corpus words") {
    val words = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct().limit(200).as[String].collect()
    for (w <- words) {
      assert(n(w) == BpeVocab.countWord(w).toLong, s"word '$w'")
    }
  }
}
