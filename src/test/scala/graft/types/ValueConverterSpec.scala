package graft.types

import java.sql.Timestamp
import graft.SparkSpec
import graft.types.FFType._

class ValueConverterSpec extends SparkSpec {
  import ValueConverter._

  test("numeric widening always succeeds; narrowing range-checks") {
    assert(coerce(42, FFInt64) == Right(42L))
    assert(coerce(42L, FFInt8) == Right(42.toByte))
    assert(coerce(300L, FFInt8).isLeft)        // overflow
    assert(coerce(-1L, FFUInt8).isLeft)        // negative into unsigned
    assert(coerce(65535L, FFUInt16) == Right(65535))
    assert(coerce(4294967295L, FFUInt32) == Right(4294967295L))
    assert(coerce(4294967296L, FFUInt32).isLeft)
  }

  test("float to int requires integral value in range") {
    assert(coerce(3.0, FFInt32) == Right(3))
    assert(coerce(3.5, FFInt32).isLeft)
    assert(coerce(1e30, FFInt64).isLeft)
    assert(coerce(2.5, FFFloat32) == Right(2.5f))
  }

  test("string parsing round-trips and rejects junk") {
    assert(coerce("17", FFInt32) == Right(17))
    assert(coerce(" 17 ", FFInt32) == Right(17))
    assert(coerce("x", FFInt32).isLeft)
    assert(coerce("2.75", FFFloat64) == Right(2.75))
    assert(coerce("true", FFBool) == Right(true))
    assert(coerce("0", FFBool) == Right(false))
    assert(coerce("2024-01-01T00:00:00Z", FFTimestamp) ==
      Right(Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))))
  }

  test("bool and timestamp conversions") {
    assert(coerce(true, FFInt32) == Right(1))
    assert(coerce(0L, FFBool) == Right(false))
    assert(coerce(new Timestamp(1700000000000L), FFInt64) == Right(1700000000000L))
    assert(coerce(1700000000000L, FFTimestamp) ==
      Right(new Timestamp(1700000000000L)))
  }

  test("uint64 policy: unsigned reinterpretation, refuse signed narrowing") {
    val big = java.lang.Long.parseUnsignedLong("18446744073709551615") // 2^64-1 → -1L
    assert(big == -1L)
    assert(uint64ToString(big) == "18446744073709551615")
    assert(uint64To(big, FFString) == Right("18446744073709551615"))
    assert(uint64To(big, FFInt64).isLeft)      // exceeds signed range
    assert(uint64To(big, FFUInt64) == Right(-1L))
    assert(uint64To(5L, FFInt32) == Right(5))
    assert(coerce("18446744073709551615", FFUInt64) == Right(-1L))
  }

  test("conform coerces a frame onto a TableSchema") {
    import spark.implicits._
    val df = Seq(("1", "2.5", "7")).toDF("a", "b", "c")
    val schema = TableSchema(Seq(
      TableColumn("a", FFInt64), TableColumn("b", FFFloat64),
      TableColumn("c", FFInt16)))
    val row = ValueConverter.conform(df, schema).collect().head
    assert(row.getLong(0) == 1L && row.getDouble(1) == 2.5 && row.getShort(2) == 7)
  }
}
