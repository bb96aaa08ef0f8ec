package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hash derived from MD5 — the cross-engine hash primitive.
  *
  * Every sketch in this library (MinHash, SimHash, winnowing, hyperplane LSH)
  * needs a 64-bit hash that BOTH Spark and the DuckDB correctness oracle can
  * compute bit-identically; xxhash64 exists only in Spark. MD5 is in both:
  * DuckDB's `md5_number_lower(s)` is the little-endian reading of digest bytes
  * 8..15, which [[Md5Hash64.lower]] reproduces exactly (verified:
  * md5_number_lower('abc') = 0x727FE1287D3F96D6 = here). The masked variant
  * clears the sign bit so min/ordering agree between Scala's signed Long and
  * DuckDB's UBIGINT.
  *
  * Cost note (100 TB): MD5 on a k-byte window is ~100-150 ns (one digest
  * block) vs ~5 ns for xxhash64 — but sketch hashing is scan-stage CPU that
  * overlaps parquet IO and is embarrassingly parallel; at 100 TB the scan is
  * IO-bound and the hash choice is invisible, while the oracle-checkability it
  * buys is what lets every dedup operator be hash-verified end-to-end.
  */
object Md5Hash64 {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Little-endian long of MD5 digest bytes 8..15 ≡ DuckDB md5_number_lower. */
  def lower(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = tl.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xFFL); i -= 1 }
    h
  }

  def lower(s: String): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    lower(b, 0, b.length)
  }

  /** Sign bit cleared: value in [0, 2^63) — same ordering as DuckDB
    * `md5_number_lower(s) % 9223372036854775808`. */
  def lowerMasked(bytes: Array[Byte], off: Int, len: Int): Long =
    lower(bytes, off, len) & Long.MaxValue

  /** Byte offsets of the character starts of a UTF-8 buffer, plus a final
    * sentinel = total length — so char window [i, i+k) spans bytes
    * [starts(i), starts(i+k)). Lets the sketches shingle by CHARACTER,
    * matching SQL `substr` semantics on multi-byte text. */
  def charStarts(bytes: Array[Byte], len: Int): Array[Int] = {
    // count chars first (ASCII fast path: starts(i) = i)
    var n = 0
    var i = 0
    while (i < len) { i += UTF8String.numBytesForFirstByte(bytes(i)); n += 1 }
    val starts = new Array[Int](n + 1)
    i = 0
    var c = 0
    while (i < len) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(n) = len
    starts
  }
}

/** MinHash permutation constants h_p = a_p·h + b_p (mod 2^63), derived from
  * MD5 so the DuckDB oracle can inline the identical numeric literals. */
object MinHashConstants {
  def a(p: Int): Long = (Md5Hash64.lower(s"minhash-a-$p") & Long.MaxValue) | 1L
  def b(p: Int): Long = Md5Hash64.lower(s"minhash-b-$p") & Long.MaxValue
}

/** STRING → LONG: md5_number_lower of the input's UTF-8 bytes (full 64 bits,
  * as signed Long). Scalar bridge for declarative Column pipelines that need
  * the cross-engine hash (e.g. hyperplane LSH plane components). */
final case class Md5Long(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Long", this, classOf[Md5Long].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[UTF8String]))

  def compute(s: UTF8String): Long = {
    val b = s.getBytes
    Md5Hash64.lower(b, 0, b.length)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  def apply(c: Column): Column = ColumnBridge.column(Md5Long(ColumnBridge.expression(c)))
}
