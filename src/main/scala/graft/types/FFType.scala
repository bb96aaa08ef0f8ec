package graft.types

import org.apache.spark.sql.types._

/** Engine-neutral value types, mirroring the reference's scalar set
  * (reference: fftypes/types.go:20-37, metadata.proto:298-314) re-expressed as a
  * Scala ADT with a bijection onto Spark SQL types.
  *
  * Notes vs the reference:
  *  - uint64 has no exact Spark type; we widen to Long and document the
  *    overflow caveat (SURVEY.md §7.4.8).
  *  - The only composite type is Vector (fixed-dim array of a scalar),
  *    optionally flagged as an embedding (reference fftypes/types.go:86-90).
  */
sealed trait FFType {
  def spark: DataType
}

sealed abstract class FFScalar(val spark: DataType) extends FFType

object FFType {
  case object FFNull      extends FFScalar(NullType)
  case object FFInt8      extends FFScalar(ByteType)
  case object FFInt16     extends FFScalar(ShortType)
  case object FFInt32     extends FFScalar(IntegerType)
  case object FFInt64     extends FFScalar(LongType)
  case object FFUInt8     extends FFScalar(ShortType)   // widened
  case object FFUInt16    extends FFScalar(IntegerType) // widened
  case object FFUInt32    extends FFScalar(LongType)    // widened
  case object FFUInt64    extends FFScalar(LongType)    // widened; overflow documented
  case object FFFloat32   extends FFScalar(FloatType)
  case object FFFloat64   extends FFScalar(DoubleType)
  case object FFString    extends FFScalar(StringType)
  case object FFBool      extends FFScalar(BooleanType)
  case object FFTimestamp extends FFScalar(TimestampType)
  case object FFDatetime  extends FFScalar(TimestampType)

  /** VectorType{ScalarType, Dimension, IsEmbedding} — reference fftypes/types.go:86-90. */
  final case class FFVector(elem: FFScalar, dimension: Int, isEmbedding: Boolean)
      extends FFType {
    def spark: DataType = ArrayType(elem.spark, containsNull = false)
  }

  /** Map a Spark type back to the engine-neutral type (lossy for widened ints). */
  def fromSpark(dt: DataType): FFType = dt match {
    case NullType      => FFNull
    case ByteType      => FFInt8
    case ShortType     => FFInt16
    case IntegerType   => FFInt32
    case LongType      => FFInt64
    case FloatType     => FFFloat32
    case DoubleType    => FFFloat64
    case StringType    => FFString
    case BooleanType   => FFBool
    case _: TimestampType => FFTimestamp
    case DateType      => FFDatetime
    case ArrayType(e, _) =>
      fromSpark(e) match {
        case s: FFScalar => FFVector(s, dimension = -1, isEmbedding = false)
        case other       => throw new IllegalArgumentException(s"nested vector unsupported: $other")
      }
    case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
  }
}

/** Narrow canonical feature-resource layout (entity, value, ts) — the shape every
  * feature/label source is projected into (reference provider/offline.go:916-922).
  * `entityMappings` supports multi-entity labels (metadata.proto:372-381).
  */
final case class ResourceSchema(
    entity: String,
    value: String,
    ts: Option[String] = None,
    entityMappings: Map[String, String] = Map.empty,
    sourceTable: Option[String] = None)

/** Wide table schema (reference provider/offline.go:1045-1049). */
final case class TableColumn(name: String, tpe: FFType)
final case class TableSchema(columns: Seq[TableColumn]) {
  def toStruct: StructType =
    StructType(columns.map(c => StructField(c.name, c.tpe.spark, nullable = true)))
}
