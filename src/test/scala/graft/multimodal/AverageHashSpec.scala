package graft.multimodal

import graft.SparkSpec

class AverageHashSpec extends SparkSpec {

  /** Arithmetic replica of the oracle's hash (no codec involved). */
  private def referenceHash(w: Int, h: Int, seed: Long): Long = {
    val cs = new Array[Long](64)
    val cc = new Array[Long](64)
    var tot = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 31 + y * 17 + seed * 131) & 0xFFFFFF
      val l = (((v >> 16) & 0xFF) * 299 + ((v >> 8) & 0xFF) * 587 +
        (v & 0xFF).toInt * 114) / 1000
      val p = (y * 8 / h) * 8 + (x * 8 / w)
      cs(p) += l; cc(p) += 1; tot += l
    }
    val n = w.toLong * h
    (0 until 64).foldLeft(0L) { (acc, p) =>
      if (cc(p) > 0 && cs(p) * n > tot * cc(p)) acc | (1L << p) else acc
    }
  }

  test("decoded-PNG hash equals the pixel-arithmetic reference") {
    for (seed <- Seq(0L, 2L, 14L, 98L); (w, h) <- Seq((8, 8), (31, 9), (12, 30))) {
      val img = Codecs.decodeImage(Codecs.syntheticPng(w, h, seed)).get
      assert(Codecs.averageHash(img) == referenceHash(w, h, seed),
        s"seed=$seed ${w}x$h")
    }
  }

  test("identical images hash identically; a changed image differs") {
    val a = Codecs.averageHash(
      Codecs.decodeImage(Codecs.syntheticPng(20, 16, 4L)).get)
    val b = Codecs.averageHash(
      Codecs.decodeImage(Codecs.syntheticPng(20, 16, 4L)).get)
    val c = Codecs.averageHash(
      Codecs.decodeImage(Codecs.syntheticPng(20, 16, 999L)).get)
    assert(a == b)
    assert(a != c)
  }

  test("images narrower than the grid leave empty-cell bits at zero") {
    val img = Codecs.decodeImage(Codecs.syntheticPng(3, 3, 7L)).get
    val hash = Codecs.averageHash(img)
    // only cells reachable by cx in {0,2,5}, cy in {0,2,5} can be set
    val reachable = (for (cy <- Seq(0, 2, 5); cx <- Seq(0, 2, 5))
      yield 1L << (cy * 8 + cx)).reduce(_ | _)
    assert((hash & ~reachable) == 0L)
  }
}
