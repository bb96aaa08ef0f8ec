package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** corpus_curate composition invariants on real testdata (the oracle
  * checks exact values; this spec checks the structural contract). */
class CurateSpec extends SparkSpec {

  private lazy val curated = graft.SparkEntry.queries("corpus_curate")(
    spark, sf001).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("one survivor per cluster, every survivor above the gate") {
    assert(curated.nonEmpty)
    val clusters = curated.map(_._2)
    assert(clusters.distinct.length == clusters.length)
    assert(curated.forall(_._4 >= 0.5))
  }

  test("near-dup clusters collapse: fewer survivors than gated docs") {
    val st = TextFunctions.textStats(col("text"))
    val gated = spark.read.parquet(s"$sf001/documents.parquet")
      .where(TextFunctions.qualityScoreFrom(st) >= 0.5).count()
    assert(curated.length < gated) // multi-member clusters lost members
    assert(curated.exists(_._3 > 1L)) // and some cluster really has >1 member
  }

  test("goldenRecord: each field completes independently from the best " +
    "member that has it") {
    import spark.implicits._
    val recs = Seq(
      // cluster 1: high-prio row lacks a; low-prio row lacks b
      (1L, 10L, Option.empty[String], Option("x")),
      (1L, 5L, Option("y"), Option.empty[String]),
      // cluster 2: field a all-null stays null; b from the prio-20 row
      (2L, 20L, Option.empty[String], Option("hi")),
      (2L, 7L, Option.empty[String], Option("lo")))
      .toDF("cluster", "prio", "a", "b")
    val out = Dedup.goldenRecord(recs, "cluster", col("prio"),
        Seq("a", "b"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.getString(2)), Option(r.getString(3))))
      .toMap
    assert(out(1L) === ((2L, Some("y"), Some("x")))) // cross-member merge
    assert(out(2L) === ((2L, None, Some("hi"))))
  }
}
