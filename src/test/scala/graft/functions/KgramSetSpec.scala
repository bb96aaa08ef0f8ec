package graft.functions

import graft.SparkSpec
import graft.functions.expressions.HashExprs
import org.apache.spark.sql.functions._

/** Equivalence gate for the factored-out gram-set verify path
  * (dedup_pr_eval's all-pairs truth panel): hashing+sorting each doc's
  * gram set ONCE and merging per pair must be bit-identical to the
  * original per-pair [[expressions.KgramJaccard]]. */
class KgramSetSpec extends SparkSpec {
  import spark.implicits._

  test("SortedLongsJaccard over KgramSet equals KgramJaccard on all pairs") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.normalizedText(col("text")).as("t"))
    val a = docs.select(col("doc_id").as("ida"), col("t").as("ta"),
      HashExprs.kgramSet(col("t"), 5).as("ga"))
    val b = docs.select(col("doc_id").as("idb"), col("t").as("tb"),
      HashExprs.kgramSet(col("t"), 5).as("gb"))
    val diff = a.crossJoin(b).where(col("ida") < col("idb"))
      .select(
        HashExprs.kgramJaccard(col("ta"), col("tb"), 5).as("slow"),
        HashExprs.sortedLongsJaccard(col("ga"), col("gb")).as("fast"))
      .where(col("slow") =!= col("fast")).count()
    assert(diff == 0L, s"$diff pairs diverge from KgramJaccard")
  }

  test("edge cases: empty, sub-k, identical, multi-byte") {
    val pairs = Seq(
      ("", ""), ("", "abcdef"), ("abc", "abcd"), ("abcd", "abcd"),
      ("abcdef", "abcdef"), ("früh über straße", "früh über strasse"),
      ("aaaaaa", "aaaaaaa"))
    val df = pairs.toDF("x", "y").select(
      HashExprs.kgramJaccard(col("x"), col("y"), 5).as("slow"),
      HashExprs.sortedLongsJaccard(
        HashExprs.kgramSet(col("x"), 5), HashExprs.kgramSet(col("y"), 5))
        .as("fast"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"mismatch: ${r.getDouble(0)} vs ${r.getDouble(1)}"))
    // both-empty pins 1.0 (the KgramJaccard contract)
    assert(rows(0).getDouble(1) == 1.0)
  }
}
