package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.expressions.Md5Long

/** Sequence packing — the step between a cleaned corpus and a training run:
  * documents are tokenized and laid out into fixed-token-budget sequences.
  * The reference has no packing operator (it stops at training-set serving,
  * SURVEY.md §2.8); this is a first-class training-data-pipeline extension.
  *
  * Both strategies shard the corpus first (`shard = md5(id) % nShards`,
  * evaluated in the scan projection) and pack each shard independently in
  * doc-id order. That is the 100 TB design: packing is inherently sequential,
  * so the only scalable layout is "deterministically partition, then pack
  * within partitions" — every shard is an independent unit of work, the one
  * shuffle is the window/sort exchange on `shard`, and sequence ids are
  * globally unique by (shard, seq). The md5 shard assignment is reproducible
  * in any engine (≡ DuckDB `md5_number_lower % 2^63`), which the oracle
  * replays end-to-end.
  *
  *  - [[packChunks]]: concatenate-and-chunk (GPT-style). Documents are
  *    concatenated in order and cut every `budget` tokens; a document may
  *    span sequences. Pure window arithmetic — cumulative token count,
  *    `sequence(first,last)` explode — no state, fully codegen'd.
  *  - [[packGreedy]]: first-fit-no-split (examples never cross a sequence
  *    boundary; sequences are padded at train time). A running-capacity fold
  *    with reset — inherently sequential per shard, so it runs as a sorted
  *    `mapPartitions` over shard-partitioned data: per-partition imperative
  *    logic, zero driver involvement. Oversized documents (> budget) get a
  *    sequence of their own (the standard policy; truncation is a separate
  *    concern).
  */
object Pack {

  private def sharded(docs: DataFrame, idCol: String, textCol: String,
                      nShards: Int): DataFrame =
    docs.select(
        col(idCol).cast("long").as("doc_id"),
        // sign bit cleared ⇒ [0, 2^63), so % is a true mod and identical to
        // DuckDB's (md5_number_lower(id) % 2^63) % nShards
        (Md5Long(col(idCol).cast("string"))
          .bitwiseAND(lit(Long.MaxValue)) % nShards).as("shard"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("n_toks"))
      .where(col("n_toks") > 0)

  /** Concatenate-and-chunk packing. Output one row per (document, sequence)
    * overlap: `(doc_id, shard, seq, toks_in_seq)` — a document spanning a
    * boundary appears once per sequence it feeds. `seq` is 0-based within
    * its shard. */
  def packChunks(docs: DataFrame, idCol: String, textCol: String,
                 budget: Int, nShards: Int = 8): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    sharded(docs, idCol, textCol, nShards)
      .withColumn("__cum", sum(col("n_toks")).over(w))
      .withColumn("__off", col("__cum") - col("n_toks"))
      .withColumn("seq", explode(sequence(
        floor(col("__off") / budget),
        floor((col("__cum") - 1) / budget))))
      .select(col("doc_id"), col("shard"), col("seq"),
        (least((col("seq") + 1) * budget, col("__cum")) -
          greatest(col("seq") * budget, col("__off"))).as("toks_in_seq"))
  }

  /** First-fit greedy packing (documents never split). Output one row per
    * document: `(doc_id, shard, seq, n_toks)`; `seq` is 0-based within its
    * shard. Implemented as a sorted `mapPartitions`: data is partitioned by
    * shard and sorted by (shard, doc_id), so each shard's docs arrive
    * contiguously and the fold carries (shard, seq, fill) through the
    * iterator — O(1) state, spill-free, no shuffle beyond the repartition. */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 budget: Int, nShards: Int = 8): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val base = sharded(docs, idCol, textCol, nShards)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    val enc = Encoders.row(base.schema.add("seq", LongType, nullable = false))
    base.mapPartitions { rows =>
      var curShard = Long.MinValue
      var seq = -1L
      var fill = 0L
      rows.map { r =>
        val shard = r.getLong(1)
        val n = r.getLong(2)
        if (shard != curShard) { curShard = shard; seq = 0L; fill = 0L }
        else if (fill + n > budget) { seq += 1L; fill = 0L }
        fill += n
        org.apache.spark.sql.Row(r.getLong(0), shard, n, seq)
      }
    }(enc).select(col("doc_id"), col("shard"), col("seq"), col("n_toks"))
  }

  /** Packing efficiency summary per shard: sequences used, tokens packed,
    * fill ratio vs `budget` — the number a pipeline owner watches (greedy
    * no-split packing wastes `1 - fill_ratio` of every training step). */
  def packStats(packed: DataFrame, budget: Int): DataFrame = {
    // chunked output carries toks_in_seq; greedy output carries n_toks
    val tokCol =
      if (packed.columns.contains("toks_in_seq")) col("toks_in_seq")
      else col("n_toks")
    packed.groupBy(col("shard"))
      .agg(
        (max(col("seq")) + 1).as("n_seqs"),
        sum(tokCol).as("n_toks"))
      .withColumn("fill_ratio",
        round(col("n_toks").cast("double") / (col("n_seqs") * budget), 6))
  }

  /** Padding-waste audit — for each candidate bucket length, the token
    * fraction burned if every document is padded up to a multiple of the
    * bucket (`⌈n/b⌉·b`, the no-packing dataloader): the sizing table a
    * pipeline owner reads BEFORE choosing between bucketed batching and
    * [[packChunks]]-style packing (whose fill ratio [[packStats]]
    * reports). All exact integer arithmetic; one rounded division per
    * bucket; fan-out = |buckets| per doc in the scan projection. */
  def padWaste(docs: DataFrame, textCol: String,
               buckets: Seq[Int]): DataFrame = {
    require(buckets.nonEmpty && buckets.forall(_ > 0), "buckets > 0")
    val base = docs
      .select(size(TextFunctions.tokens(col(textCol))).cast("long")
        .as("__n"))
      .where(col("__n") > 0)
    base
      .select(col("__n"),
        explode(lit(buckets.map(_.toLong).toArray)).as("bucket"))
      .select(col("bucket"), col("__n"),
        (expr("(__n + bucket - 1) div bucket") * col("bucket"))
          .as("__padded"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"),
        sum(col("__padded")).as("total_padded"))
      .select(col("bucket"), col("n_docs"), col("total_tokens"),
        col("total_padded"),
        round(lit(1.0) - col("total_tokens").cast("double") /
          col("total_padded").cast("double"), 6).as("waste_frac"))
  }
}
