package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text statistics in ONE pass over the string.
  *
  * The declarative forms (TextFunctions.alphaRatio / punctRatio / digitRatio /
  * stopwordRatio / stopwordHits×4 / cjkCount) each re-scan the document —
  * `qualityScore` + `langId` together made 6+ independent regex/array passes
  * per row, which made corpus_clean and text_stats scan-stage CPU-bound.
  * This expression computes every underlying count in two linear walks (one
  * over the original bytes for char classes, one over the lowercased bytes
  * for tokens/stopwords) and returns them as a struct; the public ratio/score
  * functions are rebuilt as cheap arithmetic over the struct fields with
  * bit-identical values, so the DuckDB oracle SQL (which replays the
  * declarative definitions) is unchanged.
  *
  * Semantics replicated exactly:
  *  - char counts are CHARACTER counts (≡ `length()` = UTF8String.numChars);
  *  - token boundaries are Java-regex `\s` = [ \t\n\f\r] (≡
  *    `split(trim(text), "\\s+")` with empties filtered) — ASCII-only, so
  *    byte-level detection is exact on multi-byte text;
  *  - stopword matching is over `lower(text)` via UTF8String.toLowerCase
  *    (≡ `lower()`), with BOTH the distinct-entry hit count per language
  *    (≡ `size(array_intersect(array_distinct(tokens(lower(text))), words))`)
  *    and the English occurrence count (≡ `size(filter(tokens(lower(text)),
  *    contains))`);
  *  - CJK count is codepoints in [U+4E00, U+9FFF] (≡ regexp [一-鿿]).
  */
final case class TextStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  // call-out codegen: the loops stay in compiled Scala, the surrounding
  // stage keeps whole-stage codegen (and projection-level subexpression
  // elimination dedupes repeated uses of this expression).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    // pass 1: original bytes — chars, alpha, digit, punct, CJK
    var nChars = 0L
    var nAlpha = 0L
    var nDigit = 0L
    var nPunct = 0L
    var nCjk = 0L
    var i = 0
    while (i < len) {
      val b = bytes(i)
      val w = UTF8String.numBytesForFirstByte(b)
      nChars += 1
      if (w == 1) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) nAlpha += 1
        else if (b >= '0' && b <= '9') nDigit += 1
        else if (b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?')
          nPunct += 1
      } else if (w == 3 && i + 2 < len) {
        val cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) | (bytes(i + 2) & 0x3F)
        if (cp >= 0x4E00 && cp <= 0x9FFF) nCjk += 1
      }
      i += w
    }
    // pass 2: lowercased bytes — tokens + stopword hits/occurrences
    val lb = s.toLowerCase.getBytes
    var nTokens = 0L
    var stopOccEn = 0L
    val seen = TextStats.seenScratch.get()
    java.util.Arrays.fill(seen, false)
    val hits = new Array[Long](4)
    var j = 0
    val llen = lb.length
    while (j < llen) {
      // skip whitespace run (Java-regex \s is ASCII-only)
      while (j < llen && TextStats.isSpace(lb(j))) j += 1
      if (j < llen) {
        val start = j
        while (j < llen && !TextStats.isSpace(lb(j))) j += 1
        nTokens += 1
        val hit = TextStats.lookup(lb, start, j - start)
        if (hit >= 0) {
          val lang = hit >> 8
          if (lang == 0) stopOccEn += 1
          if (!seen(hit & 0xFF | (lang << 5))) {
            seen(hit & 0xFF | (lang << 5)) = true
            hits(lang) += 1
          }
        }
      }
    }
    new GenericInternalRow(Array[Any](nChars, nAlpha, nDigit, nPunct, nCjk,
      nTokens, stopOccEn, hits(0), hits(1), hits(2), hits(3)))
  }

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_occ_en", LongType, nullable = false),
    StructField("hits_en", LongType, nullable = false),
    StructField("hits_de", LongType, nullable = false),
    StructField("hits_es", LongType, nullable = false),
    StructField("hits_fr", LongType, nullable = false)))

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  // stopword lookup table: UTF8String token -> (lang << 8) | wordIndex.
  // Built once per JVM from TextFunctions' published lists (the oracle
  // inlines the same lists as SQL arrays).
  private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    val langs = Seq(
      graft.functions.TextFunctions.EnglishStopwords,
      graft.functions.TextFunctions.GermanStopwords,
      graft.functions.TextFunctions.SpanishStopwords,
      graft.functions.TextFunctions.FrenchStopwords)
    for ((words, lang) <- langs.zipWithIndex; (w, idx) <- words.zipWithIndex)
      m.put(UTF8String.fromString(w), (lang << 8) | idx)
    m
  }

  /** -1 if the token is no stopword, else (lang << 8) | wordIndex. */
  private def lookup(bytes: Array[Byte], off: Int, len: Int): Int = {
    if (len > 8) return -1 // longest stopword is 7 chars ("werden" is 6)
    val t = UTF8String.fromBytes(bytes, off, len)
    val v = table.get(t)
    if (v == null) -1 else v.intValue()
  }

  /** per-thread scratch for distinct-stopword tracking: 4 langs × 32 slots */
  private val seenScratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](128)
  }
}

object TextExprs {
  def textStats(text: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(text)))
}
