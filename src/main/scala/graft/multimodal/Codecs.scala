package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL media codecs on pure-JDK machinery — no external libraries:
  * `javax.imageio` decodes/encodes PNG, JPEG, BMP, GIF, WBMP; Graphics2D
  * resamples; `javax.sound.sampled` reads/writes WAV (PCM). Video remains
  * stubbed in [[Multimodal]] (the JDK ships no video codec) — that is the
  * only stub left in the multimodal surface.
  *
  * All functions are executor-side pure functions over byte arrays —
  * called from `mapPartitions`, they stream at partition granularity with
  * per-partition codec reuse and no driver round-trips.
  */
object Codecs {

  System.setProperty("java.awt.headless", "true")
  // in-memory streams only — ImageIO's default temp-FILE cache serializes
  // every encode/decode on disk I/O
  ImageIO.setUseCache(false)

  // ---------------------------------------------------------------- images

  case class ImageMeta(width: Int, height: Int)

  /** Decode any ImageIO-supported payload (PNG/JPEG/BMP/GIF/WBMP).
    * None = not a decodable image. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    Option(ImageIO.read(new ByteArrayInputStream(bytes)))

  def imageMeta(bytes: Array[Byte]): Option[ImageMeta] =
    decodeImage(bytes).map(img => ImageMeta(img.getWidth, img.getHeight))

  /** Mean-pooled grayscale grid feature vector (dim = grid*grid), values in
    * [0,1] — the standard cheap visual embedding for dedup/clustering. */
  def imageFeatures(img: BufferedImage, grid: Int): Array[Float] = {
    val feat = new Array[Float](grid * grid)
    val cnt = new Array[Int](grid * grid)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        val cell = math.min(y * grid / h, grid - 1) * grid +
          math.min(x * grid / w, grid - 1)
        feat(cell) += lum / 255.0f
        cnt(cell) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < feat.length) { if (cnt(i) > 0) feat(i) /= cnt(i); i += 1 }
    feat
  }

  /** Exact integer luminance checksum — PNG is lossless, so for synthetic
    * images this equals an arithmetic function of the generator formula
    * (which is what the media_pipeline oracle recomputes in SQL). */
  def luminanceSum(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Real pixel resample (Graphics2D bilinear) → re-encoded PNG bytes. */
  def resizeImage(bytes: Array[Byte], width: Int, height: Int): Option[Array[Byte]] =
    decodeImage(bytes).map { src =>
      val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, width, height, null)
      g.dispose()
      encodePng(dst)
    }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic PNG (pixel = hash of coordinates + seed) — for
    * tests and pipelines that need reproducible real image payloads. */
  def syntheticPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 31 + y * 17 + seed * 131) & 0xFFFFFF
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** 64-bit average-hash (aHash) — the standard perceptual fingerprint for
    * image near-duplicate detection: pixels map to an 8×8 cell grid
    * (`cx = x·8/w`, `cy = y·8/h`, integer division), bit `cy·8+cx` is set
    * iff the cell's mean luminance exceeds the image mean. The comparison
    * is exact integer cross-multiplication (`cellSum·nTotal >
    * totalSum·nCell` — no float means), so the hash of a losslessly-decoded
    * image is an arithmetic function of its pixels that SQL can replay.
    * Images narrower/shorter than 8 px leave their empty cells' bits 0.
    * (Sum products stay far below Long range for any image under ~2^31
    * luminance total — i.e. anything smaller than ~90k×90k.) */
  def averageHash(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cellSum = new Array[Long](64)
    val cellCnt = new Array[Long](64)
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        val p = (y * 8 / h) * 8 + (x * 8 / w)
        cellSum(p) += lum
        cellCnt(p) += 1
        total += lum
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    var hash = 0L
    var p = 0
    while (p < 64) {
      if (cellCnt(p) > 0 && cellSum(p) * n > total * cellCnt(p))
        hash |= (1L << p)
      p += 1
    }
    hash
  }

  // ---------------------------------------------------------------- audio

  case class AudioMeta(sampleRate: Int, channels: Int, frames: Long)

  /** Decode a WAV (or any AudioSystem-supported) payload. None = not audio. */
  def audioMeta(bytes: Array[Byte]): Option[AudioMeta] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try Some(AudioMeta(in.getFormat.getSampleRate.toInt,
        in.getFormat.getChannels, in.getFrameLength))
      finally in.close()
    } catch { case _: Exception => None }

  /** Windowed RMS energy features over PCM16 mono samples, dim windows. */
  def audioFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val data = in.readAllBytes()
        val n = data.length / 2
        val feat = new Array[Float](dim)
        val cnt = new Array[Int](dim)
        var i = 0
        while (i < n) {
          val s = ((data(2 * i + 1) << 8) | (data(2 * i) & 0xFF)).toShort / 32768.0
          val w = math.min(i * dim / math.max(n, 1), dim - 1)
          feat(w) += (s * s).toFloat
          cnt(w) += 1
          i += 1
        }
        var j = 0
        while (j < dim) {
          if (cnt(j) > 0) feat(j) = math.sqrt(feat(j) / cnt(j)).toFloat
          j += 1
        }
        Some(feat)
      } finally in.close()
    } catch { case _: Exception => None }

  /** Deterministic synthetic PCM16 mono WAV. */
  def syntheticWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (math.sin(2 * math.Pi * (220.0 + (seed % 7) * 55.0) * i / sampleRate)
        * 12000).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }
}
