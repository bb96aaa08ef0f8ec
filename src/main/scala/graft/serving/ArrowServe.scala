package graft.serving

import java.io.OutputStream
import java.nio.channels.Channels
import scala.jdk.CollectionConverters._
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC record-batch streaming of a DataFrame — the reference's
  * Arrow Flight streamer edge (S12, streamer/iceberg_streamer.py:22-106:
  * table scan → record batches, 2M-row cap) without the Flight jars this
  * sandbox lacks: the IPC *stream format* over any OutputStream (the
  * [[ServingServer]] exposes it over HTTP chunked transfer), which every
  * Arrow client (pyarrow.ipc.open_stream, arrow-js, arrow-rs) reads
  * natively. A Flight deployment wraps this same encoder in a
  * DoGet handler — the batch-building is the part that matters.
  *
  * Rows pull from `toLocalIterator` (partition-at-a-time, never a full
  * driver materialization) and encode in `batchRows` batches; the row cap
  * mirrors the reference's 2M serving-edge bound. Covered types are the
  * engine's §1.3 surface: integral/floating scalars, string, bool,
  * decimal, timestamp (epoch micros UTC), date, and float-array
  * embeddings (VectorType → list<float32>). */
object ArrowServe {

  /** Encode `df` as an Arrow IPC stream; returns rows written. */
  def writeStream(df: DataFrame, out: OutputStream, batchRows: Int = 1024,
                  maxRows: Long = 2000000L): Long = {
    require(batchRows > 0 && maxRows > 0, "batchRows and maxRows must be > 0")
    val sparkSchema = df.schema
    val allocator = new RootAllocator(Long.MaxValue)
    val schema = new Schema(sparkSchema.map(f => toArrowField(f)).asJava)
    val root = VectorSchemaRoot.create(schema, allocator)
    val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    var written = 0L
    try {
      writer.start()
      val it = df.toLocalIterator()
      val buf = new Array[Row](batchRows)
      while (it.hasNext && written < maxRows) {
        var n = 0
        while (n < batchRows && written + n < maxRows && it.hasNext) {
          buf(n) = it.next(); n += 1
        }
        root.allocateNew()
        var c = 0
        while (c < sparkSchema.length) {
          fillVector(root.getVector(c), sparkSchema(c).dataType, buf, n, c)
          c += 1
        }
        root.setRowCount(n)
        writer.writeBatch()
        written += n
      }
      writer.end()
      written
    } finally {
      writer.close(); root.close(); allocator.close()
    }
  }

  private[serving] def toArrowField(f: StructField): Field = f.dataType match {
    case LongType => primitive(f.name, new ArrowType.Int(64, true))
    case IntegerType => primitive(f.name, new ArrowType.Int(32, true))
    case ShortType => primitive(f.name, new ArrowType.Int(16, true))
    case ByteType => primitive(f.name, new ArrowType.Int(8, true))
    case DoubleType =>
      primitive(f.name, new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE))
    case FloatType =>
      primitive(f.name, new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))
    case StringType => primitive(f.name, ArrowType.Utf8.INSTANCE)
    case BooleanType => primitive(f.name, ArrowType.Bool.INSTANCE)
    case d: DecimalType =>
      primitive(f.name, new ArrowType.Decimal(d.precision, d.scale, 128))
    case TimestampType =>
      primitive(f.name, new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC"))
    case DateType => primitive(f.name, new ArrowType.Date(
      org.apache.arrow.vector.types.DateUnit.DAY))
    case ArrayType(FloatType, _) =>
      new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
        Seq(primitive("item",
          new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE))).asJava)
    case other => throw new IllegalArgumentException(
      s"ArrowServe: unsupported column type ${other.catalogString} (${f.name})")
  }

  private def primitive(name: String, t: ArrowType): Field =
    new Field(name, FieldType.nullable(t), java.util.Collections.emptyList())

  private[serving] def fillVector(v: FieldVector, dt: DataType, rows: Array[Row],
                         n: Int, col: Int): Unit = {
    var i = 0
    (v, dt) match {
      case (bv: BigIntVector, LongType) =>
        while (i < n) { if (rows(i).isNullAt(col)) bv.setNull(i)
          else bv.setSafe(i, rows(i).getLong(col)); i += 1 }
      case (iv: IntVector, IntegerType) =>
        while (i < n) { if (rows(i).isNullAt(col)) iv.setNull(i)
          else iv.setSafe(i, rows(i).getInt(col)); i += 1 }
      case (sv: SmallIntVector, ShortType) =>
        while (i < n) { if (rows(i).isNullAt(col)) sv.setNull(i)
          else sv.setSafe(i, rows(i).getShort(col)); i += 1 }
      case (tv: TinyIntVector, ByteType) =>
        while (i < n) { if (rows(i).isNullAt(col)) tv.setNull(i)
          else tv.setSafe(i, rows(i).getByte(col)); i += 1 }
      case (dv: Float8Vector, DoubleType) =>
        while (i < n) { if (rows(i).isNullAt(col)) dv.setNull(i)
          else dv.setSafe(i, rows(i).getDouble(col)); i += 1 }
      case (fv: Float4Vector, FloatType) =>
        while (i < n) { if (rows(i).isNullAt(col)) fv.setNull(i)
          else fv.setSafe(i, rows(i).getFloat(col)); i += 1 }
      case (sv: VarCharVector, StringType) =>
        while (i < n) { if (rows(i).isNullAt(col)) sv.setNull(i)
          else sv.setSafe(i, rows(i).getString(col)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)); i += 1 }
      case (bv: BitVector, BooleanType) =>
        while (i < n) { if (rows(i).isNullAt(col)) bv.setNull(i)
          else bv.setSafe(i, if (rows(i).getBoolean(col)) 1 else 0); i += 1 }
      case (dv: DecimalVector, _: DecimalType) =>
        while (i < n) { if (rows(i).isNullAt(col)) dv.setNull(i)
          else dv.setSafe(i, rows(i).getDecimal(col)); i += 1 }
      case (tv: TimeStampMicroTZVector, TimestampType) =>
        while (i < n) { if (rows(i).isNullAt(col)) tv.setNull(i)
          else tv.setSafe(i,
            rows(i).getTimestamp(col).getTime * 1000L +
              rows(i).getTimestamp(col).getNanos / 1000 % 1000); i += 1 }
      case (dv: DateDayVector, DateType) =>
        while (i < n) { if (rows(i).isNullAt(col)) dv.setNull(i)
          else dv.setSafe(i, rows(i).getDate(col).toLocalDate.toEpochDay.toInt)
          i += 1 }
      case (lv: ListVector, ArrayType(FloatType, _)) =>
        val child = lv.getDataVector.asInstanceOf[Float4Vector]
        val w = lv.getWriter
        while (i < n) {
          w.setPosition(i)
          if (rows(i).isNullAt(col)) w.writeNull()
          else {
            val arr = rows(i).getSeq[Float](col)
            w.startList()
            arr.foreach(x => w.float4().writeFloat4(x))
            w.endList()
          }
          i += 1
        }
        val _ = child // child grows through the writer
      case (other, t) => throw new IllegalArgumentException(
        s"ArrowServe: no fill path for ${other.getClass.getSimpleName} / ${t.catalogString}")
    }
  }
}
