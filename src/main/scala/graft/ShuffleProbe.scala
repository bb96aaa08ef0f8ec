package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev triage: shuffle-bytes attribution for the kNN self-join variants
  * (the round-11 follow-up to the falsified "PQ codes shrink the shuffle"
  * claim — BENCH_skew_r11's dim-512 measurement showed the exact-rerank
  * joins, not the candidate join, dominate PQ's bytes). Measures total
  * shuffle write/read for exact IVF, PQ + float32 rerank, and PQ + int8
  * rerank on the SkewBench x10 corpus at dim 64 and tiled dim 512.
  *
  * Usage: runMain graft.ShuffleProbe [sfDir] [workDir]
  * Writes BENCH_shuffle_int8_r12.json.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_shufprobe"
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

    // the SkewBench x10 embedding corpus (20k base x 10 with the hot
    // direction planted) — same data the skew artifact measures
    val out = s"$work/emb_x10"
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    emb0.withColumn("copy", explode(sequence(lit(0), lit(9))))
      .withColumn("id", col("vec_id") + col("copy") * 2000L)
      .withColumn("embedding",
        when(pmod(col("id"), lit(8)) === 0,
          expr("transform(sequence(0, size(embedding) - 1), " +
            "i -> cast(1.0 + i * 0.01 as float))"))
          .otherwise(expr(
            "transform(embedding, (x, i) -> cast(x * (1.0 + " +
              "((id * 31 + i) % 13 - 6) * 0.02) as float))")))
      .select("id", "embedding")
      .write.mode("overwrite").parquet(out)
    val emb = spark.read.parquet(out)

    def measure(name: String, dim: Int,
                d: org.apache.spark.sql.DataFrame, subDim: Int)
        : Seq[(String, Long, Long)] = {
      def run(tag: String)(body: => Unit): (String, Long, Long) = {
        spark.catalog.clearCache()
        val (w, r) = SkewBench.shuffleBytes(spark)(body)
        System.err.println(f"[shuf] $name $tag%-12s write=$w%12d read=$r%12d")
        (tag, w, r)
      }
      Seq(
        run("exact") {
          Vectors.knnJoinIVFAuto(d, "id", "embedding",
            k = 5, nprobe = 2, iters = 1, maxCellFreq = 1000)
            .queryExecution.toRdd.count()
        },
        run("pq_f32") {
          Vectors.knnJoinIVFPQAuto(d, "id", "embedding",
            k = 5, nprobe = 2, iters = 1, m = 4, subDim = subDim,
            codebookK = 16, pqIters = 1, rerank = 20, maxCellFreq = 1000)
            .queryExecution.toRdd.count()
        },
        run("pq_int8") {
          Vectors.knnJoinIVFPQAuto(d, "id", "embedding",
            k = 5, nprobe = 2, iters = 1, m = 4, subDim = subDim,
            codebookK = 16, pqIters = 1, rerank = 20, maxCellFreq = 1000,
            int8Rerank = true)
            .queryExecution.toRdd.count()
        })
    }

    val d64 = measure("dim64", 64, emb, subDim = 16)
    val emb512 = emb.withColumn("embedding", expr(
      "flatten(transform(sequence(1, 8), t -> " +
        "transform(embedding, x -> cast(x * t / 8 as float))))"))
      .select("id", "embedding")
    val d512 = measure("dim512", 512, emb512, subDim = 128)

    def block(rows: Seq[(String, Long, Long)]): String =
      rows.map { case (tag, w, r) =>
        s""""$tag":{"write":$w,"read":$r}"""
      }.mkString("{", ",", "}")
    def ratio(rows: Seq[(String, Long, Long)], a: String, b: String): Double = {
      val m = rows.map(t => t._1 -> t._2).toMap
      m(a).toDouble / math.max(m(b), 1L)
    }
    val json =
      s"""{"metric":"knn_shuffle_int8","corpus":"skew_x10",""" +
        s""""dim64":${block(d64)},"dim512":${block(d512)},""" +
        f""""pq_f32_over_int8_write_dim512":${ratio(d512, "pq_f32", "pq_int8")}%.2f,""" +
        f""""pq_int8_over_exact_write_dim512":${ratio(d512, "pq_int8", "exact")}%.2f,""" +
        f""""pq_f32_over_int8_write_dim64":${ratio(d64, "pq_f32", "pq_int8")}%.2f,""" +
        s""""sf_dir":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_shuffle_int8_r12.json"),
      json + "\n")
    spark.stop()
  }
}
