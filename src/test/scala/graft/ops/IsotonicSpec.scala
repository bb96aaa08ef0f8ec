package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(bins: Seq[(Long, Long, Long, Long)]): Map[(Long, Long), Double] =
    Isotonic.pavFit(bins.toDF("k", "x", "ys", "n"), "k", "x", "ys", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap

  test("monotone input is unchanged; all-decreasing pools to the global mean") {
    val mono = fit(Seq((1L, 0L, 0L, 10L), (1L, 1L, 5L, 10L), (1L, 2L, 10L, 10L)))
    assert(mono == Map((1L, 0L) -> 0.0, (1L, 1L) -> 0.5, (1L, 2L) -> 1.0))
    val dec = fit(Seq((1L, 0L, 10L, 10L), (1L, 1L, 5L, 10L), (1L, 2L, 0L, 10L)))
    assert(dec.values.toSet == Set(0.5))
  }

  test("classic violator pools only the violating run") {
    // means: 0.1, 0.6, 0.4, 0.9 → pool (0.6,0.4) → 0.1, 0.5, 0.5, 0.9
    val f = fit(Seq((1L, 0L, 1L, 10L), (1L, 1L, 6L, 10L),
      (1L, 2L, 4L, 10L), (1L, 3L, 9L, 10L)))
    assert(f == Map((1L, 0L) -> 0.1, (1L, 1L) -> 0.5,
      (1L, 2L) -> 0.5, (1L, 3L) -> 0.9))
  }

  test("pav equals brute-force minimax on random weighted bins, per key") {
    val rnd = new scala.util.Random(7)
    val bins = for { k <- 0L until 6L; x <- 0L until 12L } yield {
      val n = 1L + rnd.nextInt(20)
      (k, x, rnd.nextInt((n + 1).toInt).toLong, n)
    }
    val got = fit(bins)
    // minimax: fit_i = max_{j<=i} min_{k>=i} mean(j..k)
    for (k <- 0L until 6L) {
      val ks = bins.filter(_._1 == k).sortBy(_._2)
      for (i <- ks.indices) {
        val v = (0 to i).map { j =>
          (i until ks.size).map { kk =>
            val seg = ks.slice(j, kk + 1)
            seg.map(_._3).sum.toDouble / seg.map(_._4).sum
          }.min
        }.max
        val want = BigDecimal(java.math.BigDecimal.valueOf(v))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(got((k, ks(i)._2)) == want, s"key=$k x=${ks(i)._2}")
      }
    }
  }

  test("fit is nondecreasing in x within every key") {
    val rnd = new scala.util.Random(13)
    val bins = for { k <- 0L until 4L; x <- 0L until 30L }
      yield (k, x, rnd.nextInt(50).toLong, 50L)
    val f = fit(bins)
    for (k <- 0L until 4L) {
      val xs = (0L until 30L).map(x => f((k, x)))
      assert(xs == xs.sorted)
    }
  }
}
