package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined word n-grams of a string, in one walk over the bytes.
  *
  * Semantically identical to the declarative
  * `transform(sequence(1, size(toks)-n+1), i -> array_join(slice(toks, i, n), ' '))`
  * over `tokens(text)` (Java-regex `\s+` boundaries, empties dropped — the
  * TOKS contract the oracles replay with `string_split_regex`), but that
  * higher-order-function chain is interpreted per element and allocates
  * intermediate arrays: at sf0.1 the bigram construction alone held
  * bigram_lm_score at ~13 s. This expression finds token boundaries once
  * and materializes each gram with a single byte copy; the surrounding
  * stage keeps whole-stage codegen via the call-out pattern
  * (TextStatsExpr's codegen note).
  *
  * Caller passes the already-normalized string (`lower(trim(text))` —
  * codegen'd built-ins); tokenization here only splits, so the output
  * matches the declarative form byte-for-byte and no oracle changes.
  */
final case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordNgrams", this, classOf[WordNgrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token boundaries: (start, end) byte offsets
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var count = 0
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      if (i < len) {
        val st = i
        while (i < len && !isSpace(bytes(i))) i += 1
        if (count == starts.length) {
          starts = java.util.Arrays.copyOf(starts, count * 2)
          ends = java.util.Arrays.copyOf(ends, count * 2)
        }
        starts(count) = st
        ends(count) = i
        count += 1
      }
    }
    if (count < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count - n + 1)
    var g = 0
    while (g <= count - n) {
      var size = n - 1 // separators
      var t = g
      while (t < g + n) { size += ends(t) - starts(t); t += 1 }
      val buf = new Array[Byte](size)
      var pos = 0
      t = g
      while (t < g + n) {
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, pos, l)
        pos += l
        if (t < g + n - 1) { buf(pos) = ' '; pos += 1 }
        t += 1
      }
      out(g) = UTF8String.fromBytes(buf)
      g += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object NgramExprs {
  def wordNgrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), n))
}
