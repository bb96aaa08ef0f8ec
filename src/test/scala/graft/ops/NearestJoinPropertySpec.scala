package graft.ops

import java.sql.Timestamp
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec

/** NearestJoin vs a driver-side brute force on random inputs: nearest
  * distance in either direction, equal-distance → backward, same-ts
  * right rows count backward, value tie-break to the max. */
class NearestJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Rows = List[(Long, Long, Double)]

  private val genRows: Gen[Rows] =
    Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.choose(1L, 3L)
      sec <- Gen.choose(0L, 50L)
      v <- Gen.choose(0, 9).map(_.toDouble)
    } yield (k, sec, v)))

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  /** Brute force: min by (|Δt|, backward-first, max value). */
  private def want(rs: Rows, k: Long, t: Long): Option[(Long, Double)] = {
    val cands = rs.filter(_._1 == k)
    if (cands.isEmpty) None
    else Some {
      val best = cands.map { case (_, rt, rv) =>
        (math.abs(rt - t), if (rt <= t) 0 else 1, -rv, rt, rv)
      }.min
      (best._4, best._5)
    }
  }

  test("matches brute force on random inputs") {
    val prop = Prop.forAll(genRows, genRows) { (ls: Rows, rs: Rows) =>
      val left = ls.zipWithIndex
        .map { case ((k, t, v), i) => (k, ts(t), i.toLong, v) }
        .toDF("k", "ts", "id", "v")
      val right = rs.map { case (k, t, v) => (k, ts(t), v) }
        .toDF("k", "ts", "v")
      val got = NearestJoin.nearest(left, right, "k", "ts", "id", "v", "v")
        .collect().map { r =>
          val nt = Option(r.getAs[Timestamp]("near_ts")).map(_.getTime / 1000)
          val nv = Option(r.getAs[Any]("near_value"))
            .map(_.asInstanceOf[Double])
          r.getAs[Long]("left_id") -> ((nt, nv))
        }.toMap
      got.size == ls.size && ls.zipWithIndex.forall { case ((k, t, _), i) =>
        val w = want(rs, k, t)
        got(i.toLong) == ((w.map(_._1), w.map(_._2)))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
