package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repetition / boilerplate signals for corpus quality filtering, in ONE
  * pass over the document (the Gopher-rules family: machine-generated and
  * template text shows up as repeated tokens and dominant n-grams long
  * before any model-based score can see it).
  *
  * Returns a struct of exact integer counts — the fractions are derived in
  * the query as plain arithmetic so the DuckDB oracle can replay them
  * bit-for-bit (list_transform n-grams + group-count max):
  *
  *  - `n_tokens`      whitespace tokens of `lower(text)` (Java-regex `\s`,
  *                    ≡ the TOKS_LOWER oracle macro),
  *  - `n_distinct`    distinct tokens,
  *  - `top2_n`        occurrences of the most frequent word 2-gram
  *                    (space-joined; tokens contain no spaces, so the join
  *                    is collision-free), 0 when fewer than 2 tokens,
  *  - `top3_n`        same for 3-grams.
  *
  * Scale: evaluated in the scan projection (call-out codegen like
  * [[TextStats]]); per-row state is two small hash maps, no shuffle, no
  * UDF. Reference counterpart: there is none — the reference's quality
  * surface stops at SQL transformations; this extends the text-statistics
  * family the same way TextStats does.
  */
final case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepStats.schema
  override def prettyName: String = "rep_stats"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(s: UTF8String): InternalRow = {
    val lb = s.toLowerCase.getBytes
    val llen = lb.length
    // tokenize (same byte-walk as TextStats: \s is ASCII-only)
    val toks = new java.util.ArrayList[UTF8String]()
    var j = 0
    while (j < llen) {
      while (j < llen && RepStats.isSpace(lb(j))) j += 1
      if (j < llen) {
        val start = j
        while (j < llen && !RepStats.isSpace(lb(j))) j += 1
        toks.add(UTF8String.fromBytes(lb, start, j - start))
      }
    }
    val n = toks.size
    val distinct = new java.util.HashSet[UTF8String](toks)

    def topK(k: Int): Long =
      if (n < k) 0L
      else {
        val m = new java.util.HashMap[String, Integer]()
        var best = 0
        var i = 0
        while (i + k <= n) {
          val sb = new java.lang.StringBuilder(toks.get(i).toString)
          var x = 1
          while (x < k) { sb.append(' ').append(toks.get(i + x)); x += 1 }
          val c = m.merge(sb.toString, 1, (a, b) => a + b)
          if (c > best) best = c
          i += 1
        }
        best.toLong
      }

    new GenericInternalRow(Array[Any](
      n.toLong, distinct.size.toLong, topK(2), topK(3)))
  }

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top2_n", LongType, nullable = false),
    StructField("top3_n", LongType, nullable = false)))

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
}

object RepExprs {
  def repStats(text: Column): Column =
    ColumnBridge.column(RepStats(ColumnBridge.expression(text)))
}
