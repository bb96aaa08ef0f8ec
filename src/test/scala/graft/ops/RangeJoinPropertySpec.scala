package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the bucketized interval join: for ANY point set,
  * interval set, and bucket width, the result equals the brute-force
  * cross-join filter — the bucket decomposition must be invisible. */
class RangeJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genCase = for {
    nPts <- Gen.choose(1, 60)
    pts <- Gen.listOfN(nPts, Gen.choose(0L, 5000L))
    nIvs <- Gen.choose(1, 25)
    ivs <- Gen.listOfN(nIvs, for {
      a <- Gen.choose(0L, 4800L)
      len <- Gen.choose(1L, 900L)
    } yield (a, a + len))
    width <- Gen.oneOf(1L, 7L, 64L, 500L, 10000L)
  } yield (pts, ivs, width)

  test("bucketized result == brute force for any points/intervals/width") {
    val prop = Prop.forAll(genCase) { case (pts, ivs, width) =>
      val ptsDf = pts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("pid", "us")
        .select($"pid", timestamp_micros($"us").as("ts"))
      val ivsDf = ivs.zipWithIndex
        .map { case ((a, b), i) => (i.toLong, a, b) }.toDF("iid", "a", "b")
        .select($"iid", timestamp_micros($"a").as("w_start"),
          timestamp_micros($"b").as("w_end"))
      val got = RangeJoin.pointsInIntervals(ptsDf, "ts", ivsDf,
          "w_start", "w_end", width)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val want = (for {
        (t, pi) <- pts.zipWithIndex
        ((a, b), ii) <- ivs.zipWithIndex
        if t >= a && t < b
      } yield (pi.toLong, ii.toLong)).toSet
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.toString)
  }
}
