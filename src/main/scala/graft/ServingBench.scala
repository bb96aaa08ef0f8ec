package graft

import java.net.{HttpURLConnection, URI}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving-facade load bench: N concurrent HTTP clients against a live
  * [[graft.serving.ServingServer]] over the partition-streamed DiskKv
  * backend — point lookups (/features), ANN (/nearest), and the B3 bulk
  * stream (/batch). Reports throughput and p50/p99 latencies per
  * endpoint; the online-serving SLO evidence beside the offline bench.
  * Writes BENCH_serving_r7.json. */
object ServingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nClients = sys.env.getOrElse("SPARK_GRAFT_SERVE_CLIENTS", "16").toInt
    val nReq = sys.env.getOrElse("SPARK_GRAFT_SERVE_REQS", "2000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val kvDir = java.nio.file.Files.createTempDirectory("graft_srvbench").toString
    val store = new serving.OnlineStore(new serving.DiskKv(kvDir))
    // per-user latest purchase value (M1 materialization) → online table
    val ev = sources.Readers.eventsNormalized(spark, sfDir)
    store.load("latest_value",
      ops.Materialize.latestTriple(ev.select(col("user_id").as("entity"),
        col("value"), col("ts"))).select(col("entity"), col("value")))
    val nEntities = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    // embeddings → indexed ANN table
    store.loadVectors("emb",
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("entity"), col("embedding").as("vector")))
    store.buildIndex("emb")
    val probe = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding")).head().getSeq[Float](0).toArray

    val srv = new serving.ServingServer(store, threads = nClients).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    def get(url: String): Int = {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(5000); conn.setReadTimeout(60000)
      val code = conn.getResponseCode
      val is = conn.getInputStream
      val buf = new Array[Byte](8192)
      while (is.read(buf) >= 0) {}
      conn.disconnect()
      code
    }

    val qStr = probe.mkString(",")
    def loadTest(name: String, mkUrl: Int => String,
                 reqs: Int): (Double, Double, Double, Long) = {
      val lat = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val bad = new java.util.concurrent.atomic.AtomicLong(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nClients)
      val t0 = System.nanoTime()
      for (i <- 0 until reqs) pool.submit(new Runnable {
        def run(): Unit = {
          val s = System.nanoTime()
          try { if (get(mkUrl(i)) != 200) bad.incrementAndGet() }
          catch { case _: Throwable => bad.incrementAndGet() }
          lat.add(System.nanoTime() - s)
        }
      })
      pool.shutdown()
      pool.awaitTermination(10, java.util.concurrent.TimeUnit.MINUTES)
      val wall = (System.nanoTime() - t0) / 1e9
      val xs = lat.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
      def pct(p: Double) =
        if (xs.isEmpty) 0.0
        else xs(math.min(xs.length - 1, (p * xs.length).toInt)) / 1e6
      System.err.println(f"[serve] $name%-10s ${reqs / wall}%8.0f req/s " +
        f"p50 ${pct(0.50)}%6.2f ms  p99 ${pct(0.99)}%6.2f ms  bad ${bad.get()}")
      (reqs / wall, pct(0.50), pct(0.99), bad.get())
    }

    val (feat, near, batch) =
      try {
        // untimed warm-up (JIT + bucket-cache fill)
        (0 until 200).foreach(i =>
          get(s"$base/features?names=latest_value&entity=${i % nEntities}"))
        get(s"$base/nearest?feature=emb&k=10&q=$qStr")
        (loadTest("features",
          i => s"$base/features?names=latest_value&entity=${i % nEntities}",
          nReq),
          loadTest("nearest",
            i => s"$base/nearest?feature=emb&k=10&q=$qStr",
            math.max(nReq / 4, 100)),
          loadTest("batch", _ => s"$base/batch?names=latest_value", 8))
      } finally srv.stop()
    val json =
      s"""{"metric":"serving_load","clients":$nClients,""" +
        s""""entities":$nEntities,""" +
        f""""features":{"rps":${feat._1}%.0f,"p50_ms":${feat._2}%.2f,"p99_ms":${feat._3}%.2f,"errors":${feat._4}},""" +
        f""""nearest":{"rps":${near._1}%.0f,"p50_ms":${near._2}%.2f,"p99_ms":${near._3}%.2f,"errors":${near._4}},""" +
        f""""batch_full_scans":{"rps":${batch._1}%.2f,"p50_ms":${batch._2}%.2f,"p99_ms":${batch._3}%.2f,"errors":${batch._4}},""" +
        s""""sf_dir":"$sfDir"}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/BENCH_serving_r7.json"), json + "\n")
    spark.stop()
    if (feat._4 + near._4 + batch._4 > 0) {
      System.err.println("[serve] ASSERTION FAILED: request errors under load")
      sys.exit(1)
    }
  }
}
