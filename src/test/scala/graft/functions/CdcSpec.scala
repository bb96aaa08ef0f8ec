package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.expressions.CdcChunkStarts

/** Content-defined chunking: boundary rule, tiling, dedup accounting,
  * and the edit-stability property that motivates CDC over fixed blocks. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def pseudoText(n: Int, salt: Int = 0): String =
    Seq.tabulate(n) { i =>
      val h = expressions.Md5Hash64.lower(s"c$salt|$i") & Long.MaxValue
      ('a' + (h % 26).toInt).toChar
    }.mkString

  test("chunks tile the text exactly (sum of lengths == corpus chars)") {
    val docs = Seq((1L, pseudoText(600), "g"), (2L, pseudoText(300, 1), "g"),
      (3L, "short", "g")).toDF("doc_id", "text", "source")
    val r = Dedup.cdcDedupStats(docs, "doc_id", "text", "source",
      gramK = 8, modulus = 32).collect()(0)
    assert(r.getAs[Long]("total_chars") === 600L + 300L + 5L)
  }

  test("an exact duplicate doubles chunk mass but not distinct mass") {
    val t = pseudoText(800)
    val docs = Seq((1L, t, "g"), (2L, t, "g")).toDF("doc_id", "text", "source")
    val r = Dedup.cdcDedupStats(docs, "doc_id", "text", "source",
      gramK = 8, modulus = 32).collect()(0)
    assert(r.getAs[Long]("n_chunks") === 2 * r.getAs[Long]("n_distinct"))
    assert(r.getAs[Long]("total_chars") === 2 * r.getAs[Long]("distinct_chars"))
    assert(r.getAs[Double]("dedup_ratio") === 0.5)
  }

  test("edit stability: a prefix insertion still dedups the shared tail") {
    val t = pseudoText(1000)
    val docs = Seq((1L, t, "g"), (2L, "PREFIX-" + t, "g"))
      .toDF("doc_id", "text", "source")
    val r = Dedup.cdcDedupStats(docs, "doc_id", "text", "source",
      gramK = 8, modulus = 32).collect()(0)
    // every chunk after the first content cut re-aligns; only the head
    // differs, so well under half the mass is unique to doc 2
    assert(r.getAs[Double]("dedup_ratio") > 0.3,
      s"ratio=${r.getAs[Double]("dedup_ratio")}")
  }

  test("boundary rule: starts begin at 1, are sorted, in range, and " +
    "short texts are one chunk") {
    val df = Seq(pseudoText(500), "tiny", "x").toDF("text")
    val rows = df.select(col("text"),
        CdcChunkStarts(col("text"), 8, 16).as("starts"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val starts = r.getSeq[Int](1)
      assert(starts.head === 1)
      assert(starts === starts.sorted)
      assert(starts.distinct === starts)
      starts.foreach(s => assert(s >= 1 && s <= text.length))
    }
    assert(rows.filter(_.getString(0).length < 9)
      .forall(_.getSeq[Int](1) == Seq(1)))
  }
}
