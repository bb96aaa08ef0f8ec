package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. Training-data-pipeline
  * extensions (not in the reference, which has no text surface — SURVEY.md
  * §2.9); designs follow the published MinHash/SimHash literature
  * (Broder 1997; Charikar 2002; Lee et al. 2021 "Deduplicating Training Data
  * Makes Language Models Better").
  *
  * Scale design:
  *  - exact dedup: one hash-shuffle on a 32-byte digest, map-side partial agg;
  *  - MinHash/LSH: signatures computed in the scan projection (codegen'd
  *    expressions, no UDF), candidate generation is an explode + groupBy on
  *    (band, bandHash) — the classic band-bucket join — so cost is
  *    O(docs × bands) rows shuffled, never O(docs²);
  *  - verification joins only touch candidate pairs.
  */
object Dedup {

  /** Optimizer barrier for small derived tables that feed multiple plan legs
    * (CollapseProject would otherwise inline the defining expressions once
    * per downstream use — see minhashNearDups). `persist` (default) caches;
    * `checkpoint` = true instead writes a reliable checkpoint (requires
    * `SparkContext.setCheckpointDir`) — prefer it at cluster scale so a lost
    * executor re-reads the materialized table instead of recomputing the
    * whole signature pass, and so the barrier survives cache eviction. */
  private[graft] def barrier(df: DataFrame, checkpoint: Boolean): DataFrame =
    if (checkpoint) df.checkpoint()
    else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  // ---------------------------------------------------------------- exact

  /** Exact dedup on canonicalized content: keeps the row with the smallest
    * `idCol` per distinct normalized text. Group key is the md5 digest, not
    * the text itself — 32 bytes/row through the shuffle regardless of doc
    * size. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    df.withColumn("__fp", TextFunctions.fingerprintMd5(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  // ---------------------------------------------------------------- minhash

  /** MinHash signature over byte k-grams of the normalized text — custom
    * Catalyst expression ([[graft.functions.expressions.MinHashSig]]: sliding
    * byte-window hashing + universal-hash permutations, computed in the scan
    * stage). */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int): Column =
    graft.functions.expressions.HashExprs.minhashSig(
      TextFunctions.normalizedText(text), shingleK, numHashes)

  /** LSH band keys: the signature split into `bands` bands of `rowsPerBand`,
    * each band reduced to one 64-bit key. Two docs share a band key iff their
    * band signatures agree exactly — P(collision) ≈ 1-(1-j^r)^b for Jaccard j. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(signature, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Candidate near-duplicate pairs via MinHash LSH. Three-stage filter so
    * heavy payloads never ride the candidate shuffle:
    *  1. band-bucket self-join on the 64-long signature (512 B/row — NOT the
    *     multi-KB shingle arrays);
    *  2. cheap signature-estimated Jaccard (fraction of agreeing minhash
    *     components, O(numHashes) per pair) with slack below the threshold;
    *  3. exact shingle-set Jaccard only for the survivors (re-joined to the
    *     shingle table by id).
    * Output: (idA, idB, jaccard) with idA < idB and exact jaccard >= threshold.
    */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      shingleK: Int = 5, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8,
                      checkpointSignatures: Boolean = false): DataFrame = {
    val rowsPerBand = numHashes / bands
    // barrier: CollapseProject would otherwise inline the signature
    // expression once per band key per join leg (~17 evals/row — measured
    // 35 s vs 2 s for the signatures themselves at 5k docs before this
    // barrier), and the table feeds BOTH self-join legs. id + 64 longs —
    // ~600 B/row, negligible at any doc count that fits a cluster's
    // aggregate memory; spills to disk otherwise.
    val sigs = barrier(df.select(
      col(idCol).as("__id"),
      minhashSignature(col(textCol), shingleK, numHashes).as("__sig")),
      checkpointSignatures)
    val banded = sigs
      .withColumn("__band", explode(lshBandKeys(col("__sig"), bands, rowsPerBand)))

    val a = banded.select(col("__band"), col("__id").as("idA"), col("__sig").as("__sa"))
    val b = banded.select(col("__band"), col("__id").as("idB"), col("__sig").as("__sb"))
    // estimate BEFORE dropDuplicates: the filter runs streaming inside the
    // join stage, so the dedup shuffle carries only surviving (idA, idB)
    // pairs instead of every candidate with two 512 B signatures attached.
    // Integer compare (# agreeing components >= minAgree) — no float
    // boundary, bit-identical in the DuckDB oracle.
    val minAgree = math.ceil((threshold - 0.15) * numHashes).toInt
    val estimated = a.join(b, Seq("__band")).where(col("idA") < col("idB"))
      .withColumn("__agree",
        aggregate(zip_with(col("__sa"), col("__sb"),
            (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x))
      .where(col("__agree") >= minAgree)
      .select("idA", "idB")
      .dropDuplicates("idA", "idB")

    val txt = df.select(col(idCol).as("__jid"),
      TextFunctions.normalizedText(col(textCol)).as("__jtxt"))
    estimated
      .join(txt.withColumnRenamed("__jid", "idA").withColumnRenamed("__jtxt", "__ta"),
        Seq("idA"))
      .join(txt.withColumnRenamed("__jid", "idB").withColumnRenamed("__jtxt", "__tb"),
        Seq("idB"))
      .withColumn("jaccard", graft.functions.expressions.HashExprs
        .kgramJaccard(col("__ta"), col("__tb"), shingleK))
      .where(col("jaccard") >= threshold)
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- n-gram jaccard

  /** Exact n-gram Jaccard similarity for an explicit candidate pair set
    * (pairs: columns idA, idB) — [[graft.functions.expressions.KgramJaccard]]
    * over normalized text. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, textCol: String,
                   idCol: String, k: Int = 3): DataFrame = {
    val txt = docs.select(col(idCol).as("__jid"),
      TextFunctions.normalizedText(col(textCol)).as("__jtxt"))
    pairs
      .join(txt.withColumnRenamed("__jid", "idA").withColumnRenamed("__jtxt", "__ta"), Seq("idA"))
      .join(txt.withColumnRenamed("__jid", "idB").withColumnRenamed("__jtxt", "__tb"), Seq("idB"))
      .withColumn("jaccard", graft.functions.expressions.HashExprs
        .kgramJaccard(col("__ta"), col("__tb"), k))
      .select(col("idA"), col("idB"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ---------------------------------------------------------------- simhash

  /** Winnowing fingerprints over normalized text (rolling window-min of
    * k-gram hashes — [[graft.functions.expressions.WinnowFingerprint]]). */
  def winnowFingerprints(text: Column, shingleK: Int = 5, window: Int = 8): Column =
    graft.functions.expressions.HashExprs.winnowFingerprint(
      TextFunctions.normalizedText(text), shingleK, window)

  /** 64-bit SimHash over whitespace tokens (Charikar 2002) — custom Catalyst
    * expression ([[graft.functions.expressions.SimHash64]]). */
  def simhash64(text: Column): Column =
    graft.functions.expressions.HashExprs.simhash64(TextFunctions.tokens(text))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the 4 16-bit quarters of the simhash
    * (any pair within Hamming distance ≤ 3 of a 64-bit hash shares at least
    * one exact quarter — pigeonhole), verify with full Hamming distance. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withH = df.select(col(idCol).as("__id"), simhash64(col(textCol)).as("__h"))
      .withColumn("__q", explode(array((0 until 4).map(q =>
        struct(lit(q).as("qi"),
          shiftright(col("__h"), q * 16).bitwiseAND(0xFFFFL).as("qv"))): _*)))
    val a = withH.select(col("__q"), col("__id").as("idA"), col("__h").as("__ha"))
    val b = withH.select(col("__q"), col("__id").as("idB"), col("__h").as("__hb"))
    a.join(b, Seq("__q")).where(col("idA") < col("idB"))
      .dropDuplicates("idA", "idB")
      .withColumn("hamming", hamming64(col("__ha"), col("__hb")).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("idA", "idB", "hamming")
  }
}
