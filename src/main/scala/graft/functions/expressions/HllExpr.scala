package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HyperLogLog over the md5 hash bridge — approximate NDV
  * whose every intermediate is reproducible in the DuckDB oracle.
  *
  * Spark's own `approx_count_distinct` uses xxhash64, which the oracle
  * cannot compute; this sketch hashes with `Md5Hash64.lowerMasked` (≡
  * `md5_number_lower(s) % 2^63`), so the oracle can rebuild the registers
  * with a GROUP BY, replay the estimator arithmetic, and hash-match the
  * result — an *approximate* aggregate under an *exact* correctness gate.
  * This is the documented scale path for [[graft.ops.Profile]]'s exact-NDV
  * column profiles (the one non-linear part of that plan at 100 TB).
  *
  * Register math (p=10 default → m=1024 registers, ~3.2% standard error):
  * bucket = low p bits of the 63-bit hash; w = hash >> p (63-p bits);
  * rho(w) = leading zeros of w within its (63-p)-bit window + 1, i.e.
  * `(63-p+1) - bitLength(w)`, with the all-zero w mapping to 63-p+1.
  * The estimator's register sum Σ 2^-M_j is computed as the EXACT integer
  * `N = Σ 2^((63-p+1) - M_j)` (BigInt here ≡ HUGEINT in the oracle) so no
  * float accumulation order exists; doubles appear only in the final
  * α·m²·2^(63-p+1)/N step and the small-range `m·ln(m/V)` branch, both
  * replayed with the same formula and rounded half-up to a BIGINT.
  *
  * Merge is an elementwise register max — order-independent, so the
  * distributed partial-aggregation tree cannot affect the result (the
  * property that makes HLL mergeable across 1000 executors is the same one
  * that makes it deterministic here).
  */
case class Md5Hll(
    child: Expression,
    p: Int = 10,
    emitRegisters: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p
  private val wBits = 63 - p
  private val rhoMax = wBits + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    if (emitRegisters) org.apache.spark.sql.types.BinaryType else LongType
  override def prettyName: String = "md5_hll"
  // input contract: StringType child (callers cast; AbstractDataType is
  // private[sql] in Spark 4, so no ExpectsInputTypes here)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].getBytes
      val h = Md5Hash64.lowerMasked(s, 0, s.length)
      val bucket = (h & (m - 1)).toInt
      val w = h >>> p
      val rho =
        if (w == 0L) rhoMax
        else rhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buffer(bucket)) buffer(bucket) = rho.toByte
    }
    buffer
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Byte]): Any =
    if (emitRegisters) buffer.clone()
    else Md5Hll.estimate(buffer, p)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storage: Array[Byte]): Array[Byte] = storage

  override def withNewMutableAggBufferOffset(offset: Int): Md5Hll =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Md5Hll =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5Hll =
    copy(child = newChildren.head)
}

object Md5Hll {
  /** The HLL estimator over a register array — shared by the aggregate's
    * eval and [[HllUnionEst]]'s merged-register eval, so a sketch
    * estimated directly and a sketch merged-then-estimated go through the
    * IDENTICAL float path (the oracle replays this formula verbatim). */
  def estimate(buffer: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val rhoMax = 63 - p + 1
    var n = BigInt(0)
    var zeros = 0
    var i = 0
    while (i < m) {
      val reg = buffer(i).toInt
      if (reg == 0) zeros += 1
      n += BigInt(1) << (rhoMax - reg)
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val eRaw = alpha * m * m * math.pow(2.0, rhoMax) / n.toDouble
    val est =
      if (eRaw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else eRaw
    math.floor(est + 0.5).toLong // portable round-half-up (≡ oracle)
  }
}

/** Estimate of |A ∪ B| from two persisted HLL register arrays — the
  * mergeability that makes the sketch a 100 TB design: per-source (or
  * per-day) sketches are tiny persisted artifacts, and any union is an
  * elementwise register max + the standard estimator, with NO rescan of
  * the underlying corpus. Intersection estimates follow by
  * inclusion-exclusion on the caller side. */
final case class HllUnionEst(left: Expression, right: Expression, p: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "hll_union_est"

  // call-out codegen: merge+estimate stays compiled Scala, the stage keeps
  // whole-stage codegen (the MinHashSig pattern)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("hllUnionEst", this,
      classOf[HllUnionEst].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  /** Public entry point used by both interpreted eval and generated code. */
  def compute(a: Array[Byte], b: Array[Byte]): Long = {
    val m = 1 << p
    require(a.length == m && b.length == m,
      s"register arrays must have length $m, got ${a.length}/${b.length}")
    val merged = new Array[Byte](m)
    var i = 0
    while (i < m) {
      merged(i) = if (a(i) > b(i)) a(i) else b(i)
      i += 1
    }
    Md5Hll.estimate(merged, p)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllUnionEst =
    copy(left = newLeft, right = newRight)
}

object Sketches {
  /** Approximate distinct count of a string column, oracle-reproducible. */
  def hllNdv(c: Column, p: Int = 10): Column =
    ColumnBridge.column(Md5Hll(ColumnBridge.expression(c), p)
      .toAggregateExpression())

  /** The sketch itself (register array) — persist it, merge it later. */
  def hllSketch(c: Column, p: Int = 10): Column =
    ColumnBridge.column(Md5Hll(ColumnBridge.expression(c), p,
      emitRegisters = true).toAggregateExpression())

  /** |A ∪ B| estimate from two sketches produced by [[hllSketch]]. */
  def hllUnionEst(a: Column, b: Column, p: Int = 10): Column =
    ColumnBridge.column(HllUnionEst(ColumnBridge.expression(a),
      ColumnBridge.expression(b), p))
}
