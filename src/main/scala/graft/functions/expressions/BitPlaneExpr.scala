package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** One-buffer bit-plane bootstrap accumulator.
  *
  * The subsample bootstrap (SparkEntry.bootstrapCi) needs, per row with a
  * 63-bit deterministic hash `h` and an integer measure `v`: the full-sample
  * (Σv, n) plus, for each of `nBits` bit planes b, the conditional
  * (Σv, n) over rows where bit b of h is 0 — i.e. 2·nBits+2 running sums.
  *
  * Expressing that as 2·nBits+2 separate `sum(when(...))` aggregates is
  * semantically identical but generates ~100 aggregate buffer slots, and the
  * resulting whole-stage-codegen source takes several SECONDS to compile —
  * dominating the query cold time (measured 10.6 s cold vs 2.7 s warm).
  * This aggregate collapses all of them into ONE TypedImperativeAggregate
  * whose buffer is a single long[] and whose update is a branch-free loop —
  * nothing for janino to chew on, and the merge is elementwise addition, so
  * the distributed partial-aggregation tree is exact and order-independent.
  *
  * Returns struct(tot, n, sums: array<long>, counts: array<long>).
  */
case class BitPlaneSum(
    hash: Expression,
    value: Expression,
    nBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(nBits >= 1 && nBits <= 62, s"nBits must be in [1,62], got $nBits")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("tot", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "bit_plane_sum"

  // layout: [tot, n, s_0..s_{nBits-1}, c_0..c_{nBits-1}]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 + 2 * nBits)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hash.eval(input)
    val vv = value.eval(input)
    if (hv != null && vv != null) {
      val h = hv.asInstanceOf[Long]
      val v = vv.asInstanceOf[Long]
      buf(0) += v
      buf(1) += 1L
      var b = 0
      while (b < nBits) {
        // bit b == 0 → row is IN resample b (expected half-sample)
        val in = 1L - ((h >>> b) & 1L)
        buf(2 + b) += v * in
        buf(2 + nBits + b) += in
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val sums = new Array[Long](nBits)
    val counts = new Array[Long](nBits)
    System.arraycopy(buf, 2, sums, 0, nBits)
    System.arraycopy(buf, 2 + nBits, counts, 0, nBits)
    new GenericInternalRow(Array[Any](buf(0), buf(1),
      new GenericArrayData(sums), new GenericArrayData(counts)))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): BitPlaneSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitPlaneSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitPlaneSum =
    copy(hash = newChildren(0), value = newChildren(1))
}

object BitPlane {
  /** All bit-plane conditional (sum, count) pairs plus the full-sample
    * (sum, count) in one aggregate buffer — see [[BitPlaneSum]]. */
  def bitPlaneSum(hash: Column, value: Column, nBits: Int): Column =
    ColumnBridge.column(BitPlaneSum(
      ColumnBridge.expression(hash), ColumnBridge.expression(value), nBits)
      .toAggregateExpression())
}
