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
}
