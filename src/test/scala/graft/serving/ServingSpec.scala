package graft.serving

import graft.SparkSpec

class ServingSpec extends SparkSpec {
  import spark.implicits._

  test("point lookup + row assembly + on-demand feature") {
    val store = new OnlineStore
    store.load("f_bal", Seq((1L, 10.0), (2L, 20.0)).toDF("entity", "value"))
    store.registerOnDemand("f_double",
      (params, _) => params("x").asInstanceOf[Double] * 2)
    assert(store.get("f_bal", 1L).contains(10.0))
    assert(store.get("f_bal", 99L).isEmpty)
    val row = store.features(Seq("f_bal", "f_double"), 2L, Map("x" -> 21.0))
    assert(row == Seq(Some(20.0), Some(42.0)))
  }

  test("nearest returns cosine-ranked entities") {
    val store = new OnlineStore
    store.loadVectors("emb", Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0.0f, 1.0f))
    ).toDF("entity", "vector"))
    val got = store.nearest("emb", Array(1.0f, 0.0f), 2)
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got.head._2 > 0.999)
  }

  test("training-set iterator: repeat, shuffle, batch") {
    val df = Seq.tabulate(10)(i => (i.toLong, i.toDouble)).toDF("id", "v")
    assert(TrainingSetIterator.repeat(df, 3).size == 30)
    val ids = TrainingSetIterator
      .shuffled(TrainingSetIterator.rows(df), bufferSize = 4, seed = 42L)
      .map(_.getLong(0)).toSeq
    assert(ids.sorted == (0L until 10L))
    val batches = TrainingSetIterator
      .batched(TrainingSetIterator.rows(df), 3).toSeq
    assert(batches.map(_.size) == Seq(3, 3, 3, 1))
    assert(TrainingSetIterator.preview(df, 5).size == 5)
  }
}

class MultimodalSpec extends SparkSpec {
  import graft.multimodal.Multimodal
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private def media = {
    val docs = spark.read.parquet(s"$sf001/documents.parquet").limit(50)
    Multimodal.asMedia(
      docs.withColumn("kind",
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
        .withColumn("payload", to_binary(md5(col("text")), lit("hex"))),
      "doc_id", "kind", "payload")
  }

  test("decodeFeatures: stable schema, deterministic stub features") {
    val got = Multimodal.decodeFeatures(spark, media, featureDim = 8)
    val rows = got.collect()
    assert(rows.length == 50)
    assert(rows.forall(_.features.length == 8))
    assert(rows.forall(r => r.width >= 16 && r.height >= 16))
    val again = Multimodal.decodeFeatures(spark, media, featureDim = 8).collect()
    assert(rows.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
    // audio rows get a sample rate, video rows get frames
    assert(rows.filter(_.kind == "audio").forall(_.sampleRate >= 8000))
    assert(rows.filter(_.kind == "image").forall(_.sampleRate == 0))
  }

  test("resize + frame-sample stubs preserve contracts") {
    val resized = Multimodal.resizeStub(spark, media, stride = 4)
    assert(resized.count() == 50)
    val frames = Multimodal.frameSampleStub(spark, media, frameSize = 4, everyN = 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "frame"))
    assert(frames.count() >= 50) // md5 = 16 bytes -> 4 frames, every 2nd -> 2/doc
  }
}
