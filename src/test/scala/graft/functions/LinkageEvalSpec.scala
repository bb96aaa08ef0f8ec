package graft.functions

import graft.SparkSpec
import graft.functions.expressions.{BitPlane, JaroWinkler, StringSim}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler comparator + fuzzy linkage, exact AUC, OOV rate, and the
  * bit-plane bootstrap accumulator. */
class LinkageEvalSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double = {
    val e = org.apache.spark.sql.graft.ColumnBridge.expression(lit(a))
    JaroWinkler(e, e)
      .compute(UTF8String.fromString(a), UTF8String.fromString(b))
  }

  test("jaro-winkler matches the published test vectors") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("hello", "hello") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("", "x") == 0.0)
    assert(jw("ab", "ba") == 0.0) // below the match window, no boost
    // boost only above jaro 0.7, prefix capped at 4
    val j = jw("apple inc", "apple incorporated")
    assert(math.abs(j - 0.9) < 1e-12)
  }

  test("fuzzyLink default (2-token) blocking links variants, bounds blocks") {
    val df = Seq(
      (1L, "acme corp international"),
      (2L, "acme corp internatonal"), // transposition inside the tail
      (3L, "acme industries"),
      (4L, "zenith labs"),
      (5L, "zenith labs")).toDF("id", "name")
    val out = Dedup.fuzzyLink(df, "name", "id", minSim = 0.9)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L))) // variant linked ("acme corp" block)
    assert(out.contains((4L, 5L))) // exact pair linked
    assert(!out.contains((3L, 4L))) // cross-block pairs never compared
    // 2-token default splits "acme industries" away from "acme corp":
    // the quadratic shared-first-token block never forms
    assert(!out.contains((1L, 3L)))
  }

  test("fuzzyLinkMultiPass: sorted-token pass links word-order transpositions") {
    val df = Seq(
      (1L, "acme corp"),
      (2L, "corp acme"),  // transposed word order — prefix blocks differ
      (3L, "acme corp"),  // exact pair for the prefix pass
      (4L, "zenith labs")).toDF("id", "name")
    val single = Dedup.fuzzyLink(df, "name", "id", minSim = 0.8)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val multi = Dedup.fuzzyLinkMultiPass(df, "name", "id", minSim = 0.8)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(!single.contains((1L, 2L))) // prefix key separates the transposition
    assert(multi.contains((1L, 2L)))   // sorted key reunites it
    assert(multi.contains((1L, 3L)))   // prefix-pass pairs still present
    // duplicates across passes collapse to one row
    assert(Dedup.fuzzyLinkMultiPass(df, "name", "id", minSim = 0.8)
      .groupBy("idA", "idB").count().filter(col("count") > 1).isEmpty)
  }

  test("fuzzyLink blockTokens=1 opt-in restores coarse first-token blocks") {
    val df = Seq(
      (1L, "acme corp international"),
      (2L, "acme korp international"), // variant INSIDE the 2-token key
      (3L, "zenith labs")).toDF("id", "name")
    val fine = Dedup.fuzzyLink(df, "name", "id", minSim = 0.9)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val coarse = Dedup.fuzzyLink(df, "name", "id", minSim = 0.9,
        blockTokens = 1)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    // the documented recall trade: the coarse pass compares the pair the
    // fine default separates (the production fix is multiple passes)
    assert(!fine.contains((1L, 2L)))
    assert(coarse.contains((1L, 2L)))
  }

  test("binaryAuc equals the brute-force pair count, ties get half credit") {
    val rows = Seq((0.1, 0L), (0.4, 0L), (0.4, 1L), (0.8, 1L), (0.9, 0L),
      (0.9, 1L), (0.95, 1L))
    val df = rows.toDF("score", "y")
    val out = EvalMetrics.binaryAuc(df, col("score"), col("y"))
      .collect()(0)
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val brute = (for (p <- pos; n <- neg) yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum / (pos.size * neg.size)
    assert(out.getAs[Long]("n_pos") == pos.size)
    assert(out.getAs[Long]("n_neg") == neg.size)
    assert(math.abs(out.getAs[Double]("auc") -
      math.rint(brute * 1e6) / 1e6) < 1e-12)
  }

  test("ksStatistic: perfect separation gives KS 1 at the last negative") {
    val df = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L))
      .toDF("score", "y")
    val out = EvalMetrics.ksStatistic(df, col("score"), col("y"))
      .collect()(0)
    assert((out.getAs[Long]("n_pos"), out.getAs[Long]("n_neg")) ===
      ((2L, 2L)))
    assert(out.getAs[Double]("ks") === 1.0)
    assert(out.getAs[Double]("ks_at_score") === 2.0)
  }

  test("ksStatistic: interleaved scores — max gap and smallest " +
    "attaining score") {
    // neg {1,3}, pos {2,4}: gaps 0.5, 0, 0.5, 0 → ks 0.5 at score 1
    val df = Seq((1.0, 0L), (2.0, 1L), (3.0, 0L), (4.0, 1L))
      .toDF("score", "y")
    val out = EvalMetrics.ksStatistic(df, col("score"), col("y"))
      .collect()(0)
    assert(out.getAs[Double]("ks") === 0.5)
    assert(out.getAs[Double]("ks_at_score") === 1.0)
  }

  test("oovRate: full-vocab docs score 0, unknown-token docs score 1") {
    val docs = Seq((1L, "aa bb aa"), (2L, "aa zz"), (3L, "qq rr ss"))
      .toDF("doc_id", "text")
    // topK=2 vocab = {aa, bb} (freq desc, token asc)
    val out = UnigramLM.oovRate(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 0L, 0.0)))
    assert(out(2L) == ((2L, 2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 3L, 3L, 1.0)))
  }

  test("bit-plane accumulator equals the 2k+2 separate conditional sums") {
    val rows = (1L to 500L).map(i => (i * 2654435761L % 1024, i))
    val df = rows.toDF("h", "v")
    val bp = df.agg(BitPlane.bitPlaneSum(col("h"), col("v"), 10).as("bp"))
      .select("bp.tot", "bp.n", "bp.sums", "bp.counts")
      .collect()(0)
    assert(bp.getLong(0) == rows.map(_._2).sum)
    assert(bp.getLong(1) == rows.size.toLong)
    val sums = bp.getSeq[Long](2)
    val counts = bp.getSeq[Long](3)
    for (b <- 0 until 10) {
      val in = rows.filter { case (h, _) => ((h >> b) & 1L) == 0L }
      assert(sums(b) == in.map(_._2).sum, s"sum bit $b")
      assert(counts(b) == in.size.toLong, s"count bit $b")
    }
    // merge across partitions is exact: repartitioned result identical
    val bp2 = df.repartition(7)
      .agg(BitPlane.bitPlaneSum(col("h"), col("v"), 10).as("bp"))
      .select("bp.tot", "bp.sums").collect()(0)
    assert(bp2.getLong(0) == bp.getLong(0))
    assert(bp2.getSeq[Long](1) == sums)
  }

  test("jaroWinkler column API works inside a filter stage") {
    val df = Seq(("martha", "marhta"), ("abc", "xyz")).toDF("a", "b")
    val n = df.filter(StringSim.jaroWinkler(col("a"), col("b")) > 0.9).count()
    assert(n == 1L)
  }
}
