package graft.types

import java.sql.Timestamp
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import FFType._

/** Scalar value coercion between engine-neutral types — the reference's
  * ValueConverter family (fftypes/value_converter.go:13-17, converters for
  * every (from, to) scalar pair with range checks) as one total function.
  *
  * Rules (matching the reference's semantics):
  *  - numeric → numeric: widen freely; NARROW only if the value fits the
  *    target range, else an overflow error (never silent truncation);
  *  - float → int: must be integral and in range;
  *  - string → anything: parse (trimmed), errors surface as Left;
  *  - bool ↔ numeric: 1/0, nonzero = true;
  *  - timestamp ↔ int64: epoch MILLISECONDS (reference NewTimestamp);
  *  - uint64 policy (SURVEY §7.4.8): carried in Long; a NEGATIVE Long is a
  *    value above 2^63-1, which converts to string/float via the unsigned
  *    reinterpretation but refuses narrowing to any signed type.
  *
  * `castColumn` is the vectorized (Catalyst-cast) form for whole columns;
  * `coerce` is the serving-path scalar form — both share range semantics.
  */
object ValueConverter {

  private def fits(v: Long, to: FFScalar): Boolean = to match {
    case FFInt8   => v >= Byte.MinValue && v <= Byte.MaxValue
    case FFInt16  => v >= Short.MinValue && v <= Short.MaxValue
    case FFInt32  => v >= Int.MinValue && v <= Int.MaxValue
    case FFUInt8  => v >= 0 && v <= 255
    case FFUInt16 => v >= 0 && v <= 65535
    case FFUInt32 => v >= 0 && v <= 4294967295L
    // a negative Long is NOT a valid uint64 value here: the unsigned
    // reinterpretation is only legal through the explicit uint64To path
    case FFUInt64 => v >= 0
    case _        => true
  }

  private def boxLong(v: Long, to: FFScalar): Any = to match {
    case FFInt8                      => v.toByte
    case FFInt16                     => v.toShort
    case FFInt32                     => v.toInt
    case FFUInt8                     => v.toShort
    case FFUInt16                    => v.toInt
    case _                           => v
  }

  private def unsignedToDouble(v: Long): Double =
    if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552e19 // + 2^64

  private def unsignedToString(v: Long): String =
    java.lang.Long.toUnsignedString(v)

  def coerce(value: Any, to: FFScalar): Either[String, Any] = {
    if (value == null) return Right(null)
    (value, to) match {
      // identity-ish fast paths
      case (v: String, FFString) => Right(v)
      case (v: java.lang.Boolean, FFBool) => Right(v)

      // from long-family (incl. the uint64 carrier)
      case (v: Number, t) if isIntegral(value) =>
        val l = v.longValue()
        t match {
          case FFString => Right(l.toString)
          case FFBool => Right(l != 0)
          case FFFloat32 => Right(l.toFloat)
          case FFFloat64 => Right(l.toDouble)
          case FFTimestamp | FFDatetime => Right(new Timestamp(l))
          case s: FFScalar =>
            if (fits(l, s)) Right(boxLong(l, s))
            else Left(s"overflow: $l does not fit $s")
        }

      case (v: Number, t) => // floating
        val d = v.doubleValue()
        t match {
          case FFFloat64 => Right(d)
          case FFFloat32 =>
            if (d.isNaN || d.isInfinite || math.abs(d) <= Float.MaxValue.toDouble)
              Right(d.toFloat)
            else Left(s"overflow: $d does not fit float32")
          case FFString => Right(if (d == d.floor && !d.isInfinite &&
            math.abs(d) < 1e15) d.toLong.toString else d.toString)
          case FFBool => Right(d != 0.0)
          case s: FFScalar =>
            if (d.isNaN || d.isInfinite || d != d.floor)
              Left(s"not integral: $d → $s")
            else if (d < -9.223372036854776e18 || d > 9.223372036854776e18)
              Left(s"overflow: $d does not fit $s")
            else coerce(java.lang.Long.valueOf(d.toLong), s)
        }

      case (v: java.lang.Boolean, t) => t match {
        case FFString => Right(v.toString)
        case FFFloat32 => Right(if (v) 1.0f else 0.0f)
        case FFFloat64 => Right(if (v) 1.0 else 0.0)
        case FFTimestamp | FFDatetime => Left(s"cannot convert bool → $t")
        case s: FFScalar => Right(boxLong(if (v) 1L else 0L, s))
      }

      case (v: Timestamp, t) => t match {
        case FFTimestamp | FFDatetime => Right(v)
        case FFInt64 | FFUInt64 => Right(v.getTime)
        case FFString => Right(v.toInstant.toString)
        case other => Left(s"cannot convert timestamp → $other")
      }

      case (v: String, t) =>
        val s = v.trim
        try t match {
          case FFBool => s.toLowerCase match {
            case "true" | "1" => Right(true)
            case "false" | "0" => Right(false)
            case _ => Left(s"not a bool: '$v'")
          }
          case FFFloat32 => Right(s.toFloat)
          case FFFloat64 => Right(s.toDouble)
          case FFUInt64 => Right(java.lang.Long.parseUnsignedLong(s))
          case FFTimestamp | FFDatetime =>
            Right(Timestamp.from(java.time.Instant.parse(s)))
          case sc: FFScalar =>
            val l = s.toLong
            if (fits(l, sc)) Right(boxLong(l, sc))
            else Left(s"overflow: $s does not fit $sc")
        } catch {
          case _: NumberFormatException => Left(s"not numeric: '$v'")
          case _: java.time.format.DateTimeParseException => Left(s"not a timestamp: '$v'")
        }

      case (v, t) => Left(s"cannot convert ${v.getClass.getSimpleName} → $t")
    }
  }

  /** uint64-aware variants: the carrier Long reinterpreted unsigned. */
  def uint64ToString(v: Long): String = unsignedToString(v)
  def uint64ToDouble(v: Long): Double = unsignedToDouble(v)
  /** Narrowing a uint64 carrier to a signed type refuses values ≥ 2^63. */
  def uint64To(v: Long, to: FFScalar): Either[String, Any] =
    to match {
      case FFString => Right(unsignedToString(v))
      case FFFloat64 => Right(unsignedToDouble(v))
      case FFFloat32 => Right(unsignedToDouble(v).toFloat)
      case FFUInt64 => Right(v)
      case _ if v < 0 => Left(s"overflow: uint64 ${unsignedToString(v)} exceeds signed range")
      case s => coerce(java.lang.Long.valueOf(v), s)
    }

  private def isIntegral(v: Any): Boolean = v match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
         _: java.lang.Long => true
    case _ => false
  }

  /** Column-level coercion: Catalyst cast with ANSI overflow semantics so
    * narrowing errors surface instead of wrapping (matches `coerce`). */
  def castColumn(c: Column, to: FFType): Column = to match {
    case s: FFScalar => c.cast(s.spark)
    case FFVector(elem, _, _) => c.cast(org.apache.spark.sql.types.ArrayType(elem.spark))
  }

  /** Project + coerce a frame onto a TableSchema (reference
    * provider/offline.go:1045-1049 wide-table registration). */
  def conform(df: org.apache.spark.sql.DataFrame,
              schema: TableSchema): org.apache.spark.sql.DataFrame =
    df.select(schema.columns.map(c => castColumn(col(c.name), c.tpe).as(c.name)): _*)
}
