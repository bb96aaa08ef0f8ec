package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines. Media is carried as an opaque `binary` column plus a typed
  * metadata struct; per-item compute runs batch-wise in `mapPartitions` over
  * a typed Dataset (the Scala analogue of `mapInPandas` — one partition =
  * one worker batch, schema declared up front, no driver round-trips).
  *
  * Codecs: IMAGE (PNG/JPEG/BMP/GIF via `javax.imageio`) and AUDIO (WAV via
  * `javax.sound.sampled`) decode/resize/feature-extract are REAL — see
  * [[Codecs]], pure-JDK, no external libraries. Only VIDEO remains stubbed
  * (the JDK ships no video codec); undecodable payloads fall back to the
  * deterministic stub so the pipeline is total.
  */
object Multimodal {

  /** Typed media row: id + raw bytes + declared kind ("image"|"audio"|"video"). */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata + a fixed-width feature vector. */
  case class MediaFeatures(
      media_id: Long, kind: String, byteLen: Int,
      width: Int, height: Int, sampleRate: Int, nFrames: Int,
      features: Array[Float])

  /** Wrap any table with a binary payload column into the canonical media
    * schema. (Testdata has no real media; callers derive bytes from an
    * existing column — e.g. `to_binary(md5(text), 'hex')` — which exercises
    * the identical plumbing.) */
  def asMedia(df: DataFrame, idCol: String, kindCol: String,
              bytesCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(kindCol).as("kind"), col(bytesCol).as("bytes"))

  // ---- real decode (image/audio), stub fallback (video/undecodable) ------

  private def decodeReal(r: MediaRow, featureDim: Int): Option[MediaFeatures] =
    r.kind match {
      case "image" =>
        Codecs.decodeImage(r.bytes).map { img =>
          val grid = math.max(math.sqrt(featureDim).toInt, 1)
          val feat = java.util.Arrays.copyOf(
            Codecs.imageFeatures(img, grid), featureDim)
          MediaFeatures(r.media_id, r.kind, r.bytes.length,
            img.getWidth, img.getHeight, 0, 1, feat)
        }
      case "audio" =>
        for {
          meta <- Codecs.audioMeta(r.bytes)
          feat <- Codecs.audioFeatures(r.bytes, featureDim)
        } yield MediaFeatures(r.media_id, r.kind, r.bytes.length,
          0, 0, meta.sampleRate, meta.frames.toInt, feat)
      case _ => None // video: JDK has no codec — stub below
    }

  // Deterministic fake "decode" for video payloads and undecodable bytes:
  // metadata and features are pure functions of the payload, so the
  // pipeline stays total and reproducible.
  private def decodeStub(r: MediaRow, featureDim: Int): MediaFeatures = {
    val b = r.bytes
    def at(i: Int): Int = if (b.isEmpty) 0 else b(i % b.length) & 0xFF
    val width = 16 + (at(0) << 4 | at(1)) % 4080
    val height = 16 + (at(2) << 4 | at(3)) % 4080
    val sampleRate = if (r.kind == "audio") 8000 + at(4) * 256 else 0
    val nFrames = if (r.kind == "video") 1 + at(5) * 8 else 1
    // fake embedding: mean of byte windows, L1-normalized — deterministic
    val feat = new Array[Float](featureDim)
    var i = 0
    while (i < b.length) { feat(i % featureDim) += (b(i) & 0xFF) / 255.0f; i += 1 }
    val s = math.max(feat.map(math.abs).sum, 1e-6f)
    var j = 0
    while (j < featureDim) { feat(j) /= s; j += 1 }
    MediaFeatures(r.media_id, r.kind, b.length, width, height, sampleRate, nFrames, feat)
  }

  /** Batch decode/feature-extract: partition-parallel, schema-stable. Image
    * and audio payloads go through the REAL JDK codecs; video and
    * undecodable payloads fall back to the deterministic stub. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
                     featureDim: Int = 16): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition batch; ImageIO/AudioSystem readers are instantiated
      // inside the executor JVM, never shipped from the driver
      it.map(r => decodeReal(r, featureDim).getOrElse(decodeStub(r, featureDim)))
    }
  }

  /** Real image resize (Graphics2D bilinear resample → PNG re-encode);
    * non-image/undecodable rows pass through unchanged. */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   width: Int, height: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { r =>
      Codecs.resizeImage(r.bytes, width, height) match {
        case Some(out) => MediaRow(r.media_id, r.kind, out)
        case None      => r
      }
    }.toDF()
  }

  /** "Resize" stub: byte-stride subsample keeping every k-th byte — stands in
    * for a pixel resample where no codec exists (video); preserves the
    * binary-in/binary-out contract. */
  def resizeStub(spark: SparkSession, media: DataFrame, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].map { r =>
      val out = Array.tabulate(math.max(r.bytes.length / stride, 1))(i =>
        r.bytes(math.min(i * stride, r.bytes.length - 1)))
      MediaRow(r.media_id, r.kind, out)
    }.toDF()
  }

  /** Frame-sample stub for video payloads: fixed-size frame windows at a
    * stride; emits one row per sampled frame (media_id, frame_idx, frame). */
  def frameSampleStub(spark: SparkSession, media: DataFrame,
                      frameSize: Int, everyN: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].flatMap { r =>
      val nFrames = math.max(r.bytes.length / frameSize, 1)
      (0 until nFrames by everyN).map { f =>
        val start = f * frameSize
        val end = math.min(start + frameSize, r.bytes.length)
        (r.media_id, f, r.bytes.slice(start, end))
      }
    }.toDF("media_id", "frame_idx", "frame")
  }
}
