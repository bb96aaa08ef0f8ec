package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental dedup must report exactly the full-corpus pairs that touch
  * the new batch — reusing stored signatures changes nothing. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("incremental == full restricted to batch-touching pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base), (2L, base + " x"),            // old-old dup pair
      (3L, "completely different content about spark execution plans"),
      (10L, base + " y"),                        // new, dups 1 and 2
      (11L, "completely different content about spark execution plans ok"),
      (12L, "nothing like anything else in this tiny corpus at all"))
      .toDF("doc_id", "text")
    val isNew = col("doc_id") >= 10L
    val corpusSigs = Dedup.minhashSignatureTable(docs.filter(!isNew), "text", "doc_id")
    val inc = Dedup.minhashNearDupsIncremental(corpusSigs, docs,
        docs.filter(isNew), "text", "doc_id", threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val full = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val expected = full.filter { case (a, b) => a >= 10L || b >= 10L }
    assert(inc == expected)
    assert(inc.contains((1L, 10L)) && inc.contains((2L, 10L)))
    assert(inc.contains((3L, 11L)))
    assert(!inc.contains((1L, 2L))) // old-old pair stays unreported
  }
}
