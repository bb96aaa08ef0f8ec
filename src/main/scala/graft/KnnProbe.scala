package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level triage for the kNN self-join family (the TimeQ idiom,
  * per-stage): times the exact and PQ pipelines AND their shared /
  * PQ-only stages on an (id, embedding) parquet corpus, so a suite-level
  * inversion (e.g. the r10 skew artifact's PQ-slower-than-exact reading
  * at x30) can be attributed to a stage instead of hand-waved.
  *
  *   runMain graft.KnnProbe <corpusParquet> [reps]
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val in = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    // tile the embedding T× (dim 64 → 64·T): the payload/FLOP regime of
    // production-dim embeddings without new test data — each tile gets a
    // position-dependent scale so the tiled vector isn't degenerate
    val tile = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Vectors

    val emb0 = spark.read.parquet(in)
    val emb = if (tile == 1) emb0 else {
      val e = emb0.withColumn("embedding",
        flatten(transform(sequence(lit(1), lit(tile)), t =>
          transform(col("embedding"),
            x => (x * t / tile).cast("float")))))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count() // materialize so the tiling isn't inside the timers
      e
    }
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val subDim = dim / 4
    val nlist = Vectors.nlistForCorpus(n)
    def time(body: => Any): Double = {
      def once = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      val xs = (1 to reps).map(_ => once)
      spark.catalog.clearCache(); System.gc()
      xs.min
    }
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // shared stage: the IVF codebook (train only; model is driver-side)
    results += ("ivf_codebook" -> time(
      Vectors.kmeansModel(emb, "id", "embedding", k = nlist, iters = 1)))
    // PQ-only stage: the 4 subspace codebooks (what SDC adds up front)
    results += ("pq_codebooks_x4" -> time {
      (0 until 4).foreach { s =>
        Vectors.kmeansModel(
          emb.select(col("id"),
            slice(col("embedding"), s * subDim + 1, subDim).as("sub")),
          "id", "sub", k = 16, iters = 1, seed = s"pq$s")
      }
    })
    results += ("exact_full" -> time(force(
      Vectors.knnJoinIVFAuto(emb, "id", "embedding", k = 5, nprobe = 2,
        iters = 1, maxCellFreq = 1000, corpusCount = Some(n)))))
    results += ("pq_full" -> time(force(
      Vectors.knnJoinIVFPQAuto(emb, "id", "embedding", k = 5, nprobe = 2,
        iters = 1, m = 4, subDim = subDim, codebookK = 16, pqIters = 1,
        rerank = 20, maxCellFreq = 1000, corpusCount = Some(n)))))
    // shortlist-width control: rerank = k isolates how much of pq_full is
    // the wider SDC window + the rerank joins' row volume
    results += ("pq_rerank_eq_k" -> time(force(
      Vectors.knnJoinIVFPQAuto(emb, "id", "embedding", k = 5, nprobe = 2,
        iters = 1, m = 4, subDim = subDim, codebookK = 16, pqIters = 1,
        rerank = 5, maxCellFreq = 1000, corpusCount = Some(n)))))
    // exact with the same retained-row count as the PQ shortlist window
    results += ("exact_k20" -> time(force(
      Vectors.knnJoinIVFAuto(emb, "id", "embedding", k = 20, nprobe = 2,
        iters = 1, maxCellFreq = 1000, corpusCount = Some(n)))))
    results.foreach { case (k, v) =>
      System.err.println(f"[knnprobe] $k%-18s $v%7.2f s")
    }
    println(s"""{"metric":"knn_probe","n":$n,"dim":$dim,"nlist":$nlist,""" +
      results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString(",") + "}")
    spark.stop()
  }
}
