package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bloom-filter membership over an n-gram array — the scale path for
  * eval-set decontamination ([[graft.functions.Decontam]]).
  *
  * The exact path broadcasts every distinct eval gram as an 8-byte md5 key
  * and pays a broadcast hash join on the exploded corpus grams. At
  * benchmark-suite sizes that is the right call; at a consortium-sized
  * held-out set (billions of grams) the key table outgrows the broadcast
  * budget while a Bloom filter stays at ~1.3 bytes/gram for a 0.25% false
  * positive rate — and, better, membership becomes a SCAN-STAGE expression:
  * no explode, no join, no shuffle of anything but the flagged survivors.
  *
  * Probe scheme (fixed so the DuckDB oracle replays it bit-for-bit): gram g
  * probes bit positions `(md5_number_lower(g || '#' || i) % 2^63) % mBits`
  * for i in 1..k; bit p lives in word `p / 63` at mask `1 << (p % 63)` —
  * 63 bits per long keeps every mask positive, so the SQL replay never
  * touches the sign bit (`1::BIGINT << 63` is engine-defined; `<< 0..62`
  * is not). A gram is a HIT when all k bits are set. The expression
  * returns the count of DISTINCT hit grams (distinct by the same 63-bit
  * md5 key the exact path joins on), matching `contaminated`'s
  * `countDistinct` semantics — so on a filter with no false positives the
  * two paths are row-identical, and any surplus is the filter's one-sided
  * error, never a miss.
  *
  * The filter is held as a reference object ([[MatVec]] pattern): Seq for
  * value-based case-class equality (canonicalization/CSE), flattened to a
  * primitive array once per task, serialized with the task binary — for
  * the 2^20-bit default that is ~130 KB, and even a 2^30-bit production
  * filter (~17 MB) ships once per executor like any broadcast variable.
  */
final case class BloomHits(child: Expression, filter: Seq[Long],
                           numProbes: Int, mBits: Int)
    extends UnaryExpression {
  require(numProbes > 0 && mBits > 0, "numProbes and mBits must be positive")
  require(filter.length == (mBits + 62) / 63,
    s"filter must have ceil(mBits/63) = ${(mBits + 62) / 63} words")

  override def dataType: DataType = LongType
  override def prettyName: String = "bloom_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> input, got ${other.sql}")
    }

  // call-out codegen: loop in compiled Scala, stage keeps whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomHits", this, classOf[BloomHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  @transient private lazy val words: Array[Long] = filter.toArray
  // "#1".."#k" probe suffixes, precomputed (ASCII, so byte-append ≡ the
  // oracle's string concat)
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(numProbes)(p =>
      ("#" + (p + 1)).getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  def compute(grams: ArrayData): Long = {
    val n = grams.numElements()
    val seen = new java.util.HashSet[java.lang.Long]()
    var hits = 0L
    var i = 0
    while (i < n) {
      if (!grams.isNullAt(i)) {
        val gb = grams.getUTF8String(i).getBytes
        var all = true
        var p = 0
        while (all && p < numProbes) {
          val suffix = suffixes(p)
          val buf = java.util.Arrays.copyOf(gb, gb.length + suffix.length)
          System.arraycopy(suffix, 0, buf, gb.length, suffix.length)
          val pos = (Md5Hash64.lower(buf, 0, buf.length) & Long.MaxValue) % mBits
          val mask = 1L << (pos % 63).toInt
          if ((words((pos / 63).toInt) & mask) == 0L) all = false
          p += 1
        }
        if (all) {
          val key = java.lang.Long.valueOf(Md5Hash64.lower(gb, 0, gb.length) & Long.MaxValue)
          if (seen.add(key)) hits += 1L
        }
      }
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): BloomHits =
    copy(child = newChild)
}

object BloomHits {
  def apply(c: Column, filter: Seq[Long], numProbes: Int, mBits: Int): Column =
    ColumnBridge.column(
      BloomHits(ColumnBridge.expression(c), filter, numProbes, mBits))
}
