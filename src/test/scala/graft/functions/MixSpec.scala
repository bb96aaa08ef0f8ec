package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixSpec extends SparkSpec {
  import spark.implicits._

  test("temperatureMix: sqrt weights normalize, budget splits, rates follow") {
    val docs = Seq(
      ("a", Seq.fill(100)("x").mkString(" ")),  // 100 tokens
      ("a", Seq.fill(300)("x").mkString(" ")),  // a: 400 total
      ("b", Seq.fill(100)("x").mkString(" "))   // b: 100 total
    ).toDF("source", "text")
    val plan = Mix.temperatureMix(docs, "source", "text", budgetTokens = 1000)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))).toMap
    // sqrt(400)=20, sqrt(100)=10 → weights 2/3, 1/3
    assert(plan("a")._1 == 400L && plan("b")._1 == 100L)
    assert(math.abs(plan("a")._2 - 0.666667) < 1e-6)
    assert(math.abs(plan("b")._2 - 0.333333) < 1e-6)
    // planned tokens = round(weight · 1000); sqrt-weighting up-samples the
    // small source relative to its 20% token share
    assert(plan("a")._3 == 667L && plan("b")._3 == 333L)
    assert(plan("b")._4 > plan("a")._4)
  }

  test("curriculumBins: equal-count bins, monotone in quality rank") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = Mix.curriculumBins(docs, "doc_id", "text", nBins = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.length == 500)
    val sizes = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L, 3L))
    assert(sizes.values.forall(_ == 125)) // 500 divides evenly
    // bins respect the (quality, doc_id) order
    val sorted = out.sortBy(t => (t._2, t._1)).map(_._3)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
  }

  test("materializeMix: floor(rate) full epochs + gated fractional epoch") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 50) "a" else "b", s"tok$i words here")).toDF("doc_id", "source", "text")
    val plan = Seq(("a", 2.5), ("b", 0.4)).toDF("source", "sampling_rate")
    val out = Mix.materializeMix(docs, "source", "doc_id", plan, "s1")
      .as[(Long, String, Long)].collect()
    val a = out.filter(_._2 == "a"); val b = out.filter(_._2 == "b")
    // source a: epochs 0 and 1 complete (50 docs each), epoch 2 ~half
    assert(a.count(_._3 == 0L) == 50 && a.count(_._3 == 1L) == 50)
    val a2 = a.count(_._3 == 2L)
    assert(a2 > 10 && a2 < 40)
    // source b: no full epoch, only the gated epoch 0 at ~0.4
    assert(b.forall(_._3 == 0L) && b.length > 8 && b.length < 32)
    // deterministic
    val again = Mix.materializeMix(docs.repartition(7), "source", "doc_id",
      plan, "s1").as[(Long, String, Long)].collect()
    assert(again.toSet == out.toSet)
  }

  test("tokenBudgetSelect: top-quality prefix per source, crossing doc kept") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val budget = 300L
    val sel = Mix.tokenBudgetSelect(docs, "source", "doc_id", "text", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(sel.nonEmpty)
    val bySrc = sel.groupBy(_._1)
    val all = Mix.tokenBudgetSelect(docs, "source", "doc_id", "text",
      Long.MaxValue).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(_._1)
    bySrc.foreach { case (src, rows) =>
      // every selected doc started under budget...
      assert(rows.forall(_._5 < budget))
      // ...and the selection ran TO the budget: either it crossed it or the
      // source is exhausted
      val total = rows.map(_._4).sum
      assert(total >= budget || rows.length == all(src).length)
      // the selection is the (quality DESC, doc_id ASC) prefix: every
      // unselected doc ranks strictly after every selected one
      val selKeys = rows.map(r => (-r._3, r._2)).toSet
      val worstSel = rows.map(r => (-r._3, r._2)).max
      val unsel = all(src).filterNot(r => selKeys.contains((-r._3, r._2)))
      assert(unsel.forall(r => Ordering[(Double, Long)].gt((-r._3, r._2), worstSel)))
    }
  }

  test("crossSourceDups rolls near-dup pairs up by unordered source pair") {
    val base = Seq.tabulate(60)(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "s1", base),
      (2L, "s2", base + " tail"),       // near-dup of 1, different source
      (3L, "s1", "completely different text " + Seq.tabulate(50)(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    val out = Dedup.crossSourceDups(docs, "text", "doc_id", "source")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("s1", "s2", 1L)))
  }
}
