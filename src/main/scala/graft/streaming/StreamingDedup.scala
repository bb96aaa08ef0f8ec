package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING near-duplicate detection — the ingest-time twin of the batch
  * [[graft.functions.Dedup.simhashNearDupsBounded]] family: documents
  * arrive on a stream and each one is checked against everything already
  * seen, emitting `(idA, idB, hamming)` pairs the moment the duplicate
  * lands (the reference's streaming ComputationMode, metadata.proto:
  * 228-232, applied to the dedup surface the way a crawl pipeline runs
  * Manku et al.'s simhash table online).
  *
  * Construction: 64-bit SimHash per document (the same codegen'd
  * [[graft.functions.Dedup.simhash64]] expression as the batch path),
  * exploded into the four 16-bit quarter bands. By pigeonhole, any pair
  * within Hamming ≤ 3 agrees on at least one untouched quarter, so
  * per-band stateful matching has FULL recall at the ≤ 3 threshold —
  * the streamed pair set (distinct, canonical `idA < idB`) equals the
  * batch all-pairs answer exactly, which is what the oracle checks.
  *
  * State: one group per (band, 16-bit value) bucket via
  * `flatMapGroupsWithState`, holding the (doc_id, simhash) list of bucket
  * members. Each arriving document compares against the bucket's members
  * (within-batch arrivals included), emits matches, joins the bucket.
  * Scale: state is partitioned by bucket key — the same layout the batch
  * band join shuffles to — and `maxPerBucket` caps any hot bucket
  * (boilerplate-heavy crawls) exactly like the batch `maxBandFreq`
  * guard: arrivals into a FULL bucket are dropped entirely (counted in
  * [[lastDropsAcc]]), bounding per-bucket lifetime work at C(cap, 2).
  * Eviction by event time is the caller's choice of
  * `GroupStateTimeout` — dup detection wants the full history, a
  * recent-window dedup wants expiry; the gate query runs full-history. */
object StreamingDedup {

  case class BandedDoc(band: Int, key: Long, docId: Long, sig: Long)
  case class DupPair(idA: Long, idB: Long, hamming: Int)
  case class BucketState(members: List[(Long, Long)], dropped: Long)

  /** Accumulator behind the LAST [[dupPairsStream]] call's bucket-cap
    * drops — read `.value` DRIVER-side after the stream completes
    * (observability twin of the batch capStats). */
  @volatile var lastDropsAcc: org.apache.spark.util.LongAccumulator = _

  /** Explode a (idCol, textCol) frame — batch or streaming — into quarter-
    * band rows keyed for the stateful matcher. */
  def bandedDocs(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sig = graft.functions.Dedup.simhash64(col(textCol))
    docs.select(col(idCol).cast("long").as("docId"), sig.as("sig"))
      .select(col("docId"), col("sig"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("sig"), b * 16)
              .bitwiseAND(lit(0xFFFFL)).as("key"))
        }: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("docId"), col("sig"))
  }

  /** Stateful per-bucket matcher: emits one [[DupPair]] per (band-local)
    * match with Hamming ≤ `maxHamming`; distinct-ing across bands is the
    * reader's one-line job (a pair can match in up to 4 buckets). */
  def dupPairsStream(spark: SparkSession, banded: DataFrame,
                     maxHamming: Int = 3,
                     maxPerBucket: Int = 2000): Dataset[DupPair] = {
    import spark.implicits._
    val drops = spark.sparkContext.longAccumulator("streamingDedupDrops")
    lastDropsAcc = drops
    banded.as[BandedDoc]
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[BucketState, DupPair](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Nil, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[DupPair]
          rows.foreach { r =>
            // FULL bucket = known-hot key (boilerplate): arrivals are
            // dropped entirely — no matching, no joining — mirroring the
            // batch maxBandFreq guard's "hot keys emit no candidates"
            // rule and bounding per-bucket work at C(cap, 2) forever
            if (st.members.length >= maxPerBucket) {
              drops.add(1L)
              st = st.copy(dropped = st.dropped + 1L)
            } else {
              st.members.foreach { case (otherId, otherSig) =>
                if (otherId != r.docId) {
                  val d = java.lang.Long.bitCount(r.sig ^ otherSig)
                  if (d <= maxHamming)
                    out += DupPair(math.min(r.docId, otherId),
                      math.max(r.docId, otherId), d)
                }
              }
              st = st.copy(members = (r.docId, r.sig) :: st.members)
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** End-to-end convenience for the gate and tests: stream the docs
    * through a file source, run the matcher to completion, return the
    * DISTINCT canonical pair table — by the pigeonhole guarantee, equal
    * to batch all-pairs Hamming ≤ `maxHamming`. */
  def runFileStream(spark: SparkSession, inDir: String, maxHamming: Int = 3,
                    maxPerBucket: Int = 2000,
                    maxFilesPerTrigger: Int = 4,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(idCol,
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField(textCol,
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger).parquet(inDir)
    val table = s"stream_dedup_${System.nanoTime()}"
    val q = dupPairsStream(spark, bandedDocs(stream, textCol, idCol),
        maxHamming, maxPerBucket)
      .writeStream.format("memory").queryName(table)
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(table)
      .select(col("idA"), col("idB"), col("hamming").cast("long").as("hamming"))
      .distinct()
  }
}
