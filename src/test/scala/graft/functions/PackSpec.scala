package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq.fill(10)("a").mkString(" ")),   // 10 tokens
    (2L, Seq.fill(25)("b").mkString(" ")),   // 25
    (3L, Seq.fill(7)("c").mkString(" ")),    // 7
    (4L, ""),                                // empty: excluded
    (5L, Seq.fill(40)("d").mkString(" ")),   // oversize vs budget 16
    (6L, Seq.fill(3)("e").mkString(" ")),
    (7L, Seq.fill(16)("f").mkString(" "))    // exactly one full seq
  ).toDF("doc_id", "text")

  test("packChunks partitions every doc's tokens exactly, cuts at the budget") {
    val out = Pack.packChunks(corpus, "doc_id", "text", budget = 16, nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every document's token count is fully assigned
    val perDoc = out.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(perDoc == Map(1L -> 10L, 2L -> 25L, 3L -> 7L, 5L -> 40L, 6L -> 3L, 7L -> 16L))
    // every sequence holds exactly `budget` tokens except each shard's last
    val perSeq = out.groupBy(t => (t._2, t._3)).view.mapValues(_.map(_._4).sum).toMap
    val lastSeq = out.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    perSeq.foreach { case ((shard, seq), toks) =>
      if (seq < lastSeq(shard)) assert(toks == 16L, s"shard $shard seq $seq: $toks")
      else assert(toks <= 16L)
    }
    // sequences are contiguous from 0 within each shard
    out.groupBy(_._2).foreach { case (_, rows) =>
      val seqs = rows.map(_._3).distinct.sorted
      assert(seqs.toSeq == (0L to seqs.max))
    }
  }

  test("packGreedy never splits a doc, never overfills, packs first-fit in id order") {
    val out = Pack.packGreedy(corpus, "doc_id", "text", budget = 16, nShards = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).distinct.length == out.length) // one row per doc
    val bySeq = out.groupBy(t => (t._2, t._3))
    bySeq.foreach { case ((shard, seq), docs) =>
      val toks = docs.map(_._4).sum
      // a sequence only exceeds the budget when a single oversize doc owns it
      assert(toks <= 16L || docs.length == 1, s"shard $shard seq $seq overfilled: $docs")
    }
    // within a shard, seq is non-decreasing in doc_id order (first-fit, no lookback)
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => b == a || b == a + 1 })
    }
  }

  test("greedy on-disk behaviour matches an in-memory reference fold") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val out = Pack.packGreedy(docs, "doc_id", "text", budget = 512, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = out.groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
      var seq = 0L; var fill = 0L
      rows.sortBy(_._1).map { case (id, _, _, n) =>
        if (fill + n > 512) { seq += 1; fill = 0 }
        fill += n
        (id, shard, seq, n)
      }
    }.toSet
    assert(out.toSet == ref)
  }

  test("packStats reports fill ratios against the budget") {
    val packed = Pack.packChunks(corpus, "doc_id", "text", budget = 16, nShards = 2)
    val stats = Pack.packStats(packed, budget = 16).collect()
    stats.foreach { r =>
      val (nSeqs, nToks, fill) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(fill > 0 && fill <= 1.0)
      assert(math.abs(fill - nToks.toDouble / (nSeqs * 16)) < 1e-6)
    }
  }

  test("padWaste: hand arithmetic per bucket; exact-multiple docs " +
    "waste nothing") {
    import spark.implicits._
    // token counts 5 and 64
    val docs = Seq((1L, Seq.fill(5)("t").mkString(" ")),
      (2L, Seq.fill(64)("t").mkString(" "))).toDF("doc_id", "text")
    val out = Pack.padWaste(docs, "text", Seq(4, 64))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // b=4: 5→8, 64→64 ⇒ 69/72 ; b=64: 5→64, 64→64 ⇒ 69/128
    assert(out(4L) === ((69L, 72L, 0.041667)))
    assert(out(64L) === ((69L, 128L, 0.460938)))
  }
}
