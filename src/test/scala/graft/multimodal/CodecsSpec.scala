package graft.multimodal

import graft.SparkSpec

class CodecsSpec extends SparkSpec {
  import spark.implicits._

  test("PNG round-trip: synthetic encode -> real decode -> meta + features") {
    val bytes = Codecs.syntheticPng(20, 13, seed = 7L)
    val meta = Codecs.imageMeta(bytes)
    assert(meta.contains(Codecs.ImageMeta(20, 13)))
    val img = Codecs.decodeImage(bytes).get
    val feat = Codecs.imageFeatures(img, grid = 4)
    assert(feat.length == 16 && feat.forall(f => f >= 0f && f <= 1f))
    // encoding is deterministic → features are too
    assert(feat.toSeq == Codecs.imageFeatures(
      Codecs.decodeImage(Codecs.syntheticPng(20, 13, 7L)).get, 4).toSeq)
  }

  test("real resize resamples pixels to the target size") {
    val bytes = Codecs.syntheticPng(32, 24, seed = 1L)
    val resized = Codecs.resizeImage(bytes, 8, 6).get
    assert(Codecs.imageMeta(resized).contains(Codecs.ImageMeta(8, 6)))
    // a WAV payload is not an image → pass-through None
    assert(Codecs.resizeImage(Codecs.syntheticWav(8000, 100, 1L), 8, 6).isEmpty)
  }

  test("WAV round-trip: sample rate and frame count survive encode/decode") {
    val bytes = Codecs.syntheticWav(11000, 1234, seed = 3L)
    val meta = Codecs.audioMeta(bytes).get
    assert(meta.sampleRate == 11000 && meta.channels == 1 && meta.frames == 1234)
    val feat = Codecs.audioFeatures(bytes, 8).get
    assert(feat.length == 8 && feat.forall(f => f >= 0f && f <= 1f))
    assert(feat.exists(_ > 0.1f)) // the sine carries energy
  }

  test("decodeFeatures uses real codecs for image/audio, stub for video") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Codecs.syntheticPng(10, 11, 1L)),
      Multimodal.MediaRow(2L, "audio", Codecs.syntheticWav(9000, 500, 2L)),
      Multimodal.MediaRow(3L, "video", Array.fill[Byte](64)(7))).toDF()
    val out = Multimodal.decodeFeatures(spark, media, featureDim = 16)
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).width == 10 && out(1L).height == 11 && out(1L).sampleRate == 0)
    assert(out(2L).sampleRate == 9000 && out(2L).nFrames == 500)
    assert(out(3L).nFrames > 0) // stub path still total
    assert(out.values.forall(_.features.length == 16))
  }
}
