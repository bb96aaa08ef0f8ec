package graft.types

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.types.FFType._

/** Property coverage for the coercion family: widening never fails and
  * narrowing round-trips exactly for in-range values. */
class ValueConverterPropertySpec extends SparkSpec {
  import ValueConverter._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.toString)
  }

  private val narrowTargets: Seq[(FFScalar, Long, Long)] = Seq(
    (FFInt8, Byte.MinValue.toLong, Byte.MaxValue.toLong),
    (FFInt16, Short.MinValue.toLong, Short.MaxValue.toLong),
    (FFInt32, Int.MinValue.toLong, Int.MaxValue.toLong),
    (FFUInt8, 0L, 255L),
    (FFUInt16, 0L, 65535L),
    (FFUInt32, 0L, 4294967295L))

  test("in-range narrow → widen round-trips exactly; out-of-range always Left") {
    narrowTargets.foreach { case (t, lo, hi) =>
      check(Prop.forAll(Gen.choose(lo, hi)) { v =>
        val narrowed = coerce(java.lang.Long.valueOf(v), t)
        narrowed.isRight &&
          coerce(narrowed.toOption.get, FFInt64) == Right(v)
      })
      check(Prop.forAll(Gen.choose(hi + 1, Long.MaxValue)) { v =>
        v <= hi || coerce(java.lang.Long.valueOf(v), t).isLeft
      })
    }
  }

  test("string round-trip for any long and bounded double") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      coerce(coerce(java.lang.Long.valueOf(v), FFString).toOption.get
        .asInstanceOf[String], FFInt64) == Right(v)
    })
    check(Prop.forAll(Gen.choose(-1e12, 1e12)) { d =>
      val s = coerce(java.lang.Double.valueOf(d), FFString)
        .toOption.get.asInstanceOf[String]
      coerce(s, FFFloat64) == Right(d)
    })
  }

  test("uint64 carrier: toString/parse round-trips the full unsigned range") {
    check(Prop.forAll(Gen.choose(Long.MinValue, Long.MaxValue)) { v =>
      val s = uint64ToString(v)
      coerce(s, FFUInt64) == Right(v) && BigInt(s) >= 0
    })
  }
}
