package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Split

/** Group k-fold, weighted sampling, and word-dropout augmentation —
  * determinism, leak-safety, and gate arithmetic. */
class SampleAugSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.sources.Readers.parquet(spark, s"$sf001/documents.parquet")

  test("kfold: every row of a group lands in one fold; folds in [0,k)") {
    val df = (1 to 200).map(i => (i.toLong % 17, i)).toDF("grp", "x")
    val folded = Split.withKFold(df, Seq("grp"), k = 5, seed = 42)
    val perGroup = folded.groupBy("grp")
      .agg(count_distinct(col("fold")).as("nf"))
      .where(col("nf") =!= 1)
    assert(perGroup.count() === 0)
    val range = folded.agg(min(col("fold")), max(col("fold"))).collect()(0)
    assert(range.getInt(0) >= 0 && range.getInt(1) < 5)
    // determinism + seed sensitivity
    val again = Split.withKFold(df, Seq("grp"), 5, 42)
    assert(folded.collect().toSeq === again.collect().toSeq)
    val other = Split.withKFold(df, Seq("grp"), 5, 43)
    assert(folded.select("grp", "fold").distinct().collect().toSet !==
      other.select("grp", "fold").distinct().collect().toSet)
  }

  test("weightedSample: deterministic, excludes nonpositive weights, " +
    "favors heavy items") {
    val df = docs.select(col("doc_id"), col("n_chars"))
      .unionByName(Seq((99999L, 0L), (99998L, -5L)).toDF("doc_id", "n_chars"))
    val s1 = Sampling.weightedSample(df, "doc_id", col("n_chars"), 50, "s")
      .collect()
    val s2 = Sampling.weightedSample(df, "doc_id", col("n_chars"), 50, "s")
      .collect()
    assert(s1.toSeq === s2.toSeq)
    assert(s1.length === 50)
    assert(!s1.exists(r => r.getLong(0) >= 99998L)) // w <= 0 never sampled
    // es_key ascending, id tie-break
    val keys = s1.map(_.getDouble(2)).toSeq
    assert(keys === keys.sorted)
    // the sample skews long: its mean length beats the corpus mean
    val corpusMean = docs.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val sampleMean = s1.map(_.getLong(1)).sum.toDouble / s1.length
    assert(sampleMean > corpusMean)
  }

  test("dropout: pct=0 keeps every token; gate is deterministic per seed") {
    val base = docs.select(col("doc_id"), col("text"))
    val keep0 = base.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n"),
        TextFunctions.tokenCount(
          TextFunctions.dropoutTokens(col("doc_id"), col("text"), 0, "s"))
          .as("k"))
      .where(col("n") =!= col("k"))
    assert(keep0.count() === 0)
    val a = base.select(col("doc_id"),
      TextFunctions.dropoutTokens(col("doc_id"), col("text"), 30, "s1")
        .as("t")).collect()
    val b = base.select(col("doc_id"),
      TextFunctions.dropoutTokens(col("doc_id"), col("text"), 30, "s1")
        .as("t")).collect()
    assert(a.toSeq === b.toSeq)
    val c = base.select(col("doc_id"),
      TextFunctions.dropoutTokens(col("doc_id"), col("text"), 30, "s2")
        .as("t")).collect()
    assert(a.map(_.getString(1)).toSeq !== c.map(_.getString(1)).toSeq)
    // drop rate lands near 30% corpus-wide
    val stats = base.select(
        TextFunctions.tokenCount(col("text")).cast("long").as("n"),
        TextFunctions.tokenCount(
          TextFunctions.dropoutTokens(col("doc_id"), col("text"), 30, "s1"))
          .cast("long").as("k"))
      .agg(sum("n").as("n"), sum("k").as("k")).collect()(0)
    val dropFrac = 1.0 - stats.getLong(1).toDouble / stats.getLong(0)
    assert(dropFrac > 0.25 && dropFrac < 0.35)
  }
}
