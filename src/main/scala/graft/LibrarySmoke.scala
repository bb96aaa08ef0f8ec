package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end library-surface drive: the full feature-store lifecycle a user
  * of the reference would run — register sources, transform, materialize,
  * build a training set, split it, serve features online, keep them fresh
  * from a stream, and decode a multimodal column. Prints one line per stage. */
object LibrarySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    // 1. catalog + SQL transformation
    import graft.catalog._
    val cat = new Catalog(spark)
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerSource(SourceVariant(ResourceId("spend"), SqlTransformation(
      """SELECT o_custkey AS entity, SUM(o_totalprice) AS value,
        |MAX(o_orderdate) AS ts FROM {{orders}} GROUP BY o_custkey""".stripMargin)))
    val spend = cat.resolve(ResourceId("spend"))
    println(s"STAGE transform: ${spend.count()} feature rows")

    // 2. materialize to a versioned dir + read back
    import graft.sources.Writers
    val matDir = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    val mat = graft.ops.Materialize.latestTriple(
      spend.select($"entity", $"value", $"ts".cast("timestamp").as("ts")))
    Writers.writeVersioned(mat, matDir)
    val back = Writers.readLatest(spark, matDir)
    println(s"STAGE materialize: ${back.count()} snapshot rows")

    // 3. training set with as-of join + split
    val ev = SparkEntry.queries("pit_purchases")(spark, dir)
    val split = graft.ops.Split.withSplit(ev, Seq("user_id", "ts_ms"), 0.2, 42L)
    println(s"STAGE trainingset: ${ev.count()} rows, " +
      s"test=${split.filter($"is_test" === 1).count()}")

    // 4. online serving
    import graft.serving._
    val store = new OnlineStore
    store.load("spend", back)
    store.registerOnDemand("spend_x2",
      (p, pre) => pre.head.asInstanceOf[Double] * 2)
    val served = store.features(Seq("spend", "spend_x2"), 1L)
    println(s"STAGE serving: $served")

    // 5. streaming latest-value upkeep converging with batch
    val stDir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    graft.sources.Readers.eventsNormalized(spark, dir)
      .select($"user_id".as("entity"), $"value", $"ts")
      .write.mode("overwrite").parquet(stDir)
    val q = graft.streaming.StreamingLatest.latestValueStream(spark,
        graft.streaming.StreamingLatest.readTripleStream(spark, stDir, 2))
      .writeStream.outputMode("update").format("memory").queryName("smoke_latest").start()
    q.processAllAvailable(); q.stop()
    println(s"STAGE streaming: ${spark.table("smoke_latest").count()} state updates")

    // 6. multimodal stub pipeline
    val media = graft.multimodal.Multimodal.asMedia(
      spark.read.parquet(s"$dir/documents.parquet").limit(20)
        .withColumn("kind", lit("image"))
        .withColumn("payload", to_binary(md5($"text"), lit("hex"))),
      "doc_id", "kind", "payload")
    val feats = graft.multimodal.Multimodal.decodeFeatures(spark, media, 8)
    println(s"STAGE multimodal: ${feats.count()} decoded, dim=8")

    println("LIBRARY_SMOKE OK")
    spark.stop()
  }
}
