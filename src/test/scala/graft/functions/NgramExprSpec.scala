package graft.functions

import graft.SparkSpec
import graft.functions.expressions.NgramExprs
import org.apache.spark.sql.functions._

class NgramExprSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(text: org.apache.spark.sql.Column, n: Int) = {
    val toks = TextFunctions.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  test("WordNgrams equals the declarative transform/slice/array_join chain") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(lower(col("text")).as("t"))
    for (n <- Seq(1, 2, 3, 8)) {
      val diff = docs.select(
          NgramExprs.wordNgrams(col("t"), n).as("fast"),
          declarative(col("t"), n).as("slow"))
        .where(col("fast") =!= col("slow")).count()
      assert(diff == 0L, s"n=$n mismatch on $diff docs")
    }
  }

  test("edge cases: empty, whitespace-only, sub-n, multi-byte") {
    val df = Seq("", "   ", "one", "one two", " a\tb\nc ", "früh über straße")
      .toDF("t")
    val rows = df.select(NgramExprs.wordNgrams(col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0).toList)
    assert(rows(0) == Nil && rows(1) == Nil && rows(2) == Nil)
    assert(rows(3) == List("one two"))
    assert(rows(4) == List("a b", "b c"))
    assert(rows(5) == List("früh über", "über straße"))
  }
}
