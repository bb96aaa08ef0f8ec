package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity — the record-linkage string comparator (the
  * fuzzy-match half of entity resolution; Levenshtein covers in-place
  * edits, JW favors shared prefixes and transpositions, the shape of
  * human-entered name variants).
  *
  * Textbook definition, pinned so the oracle replays it exactly
  * (DuckDB `jaro_winkler_similarity` — verified bit-identical on the
  * standard test vectors):
  *  - match window = max(|a|,|b|)/2 - 1; greedy left-to-right matching;
  *  - transpositions = half the out-of-order matched pairs;
  *  - jaro = (m/|a| + m/|b| + (m-t)/m) / 3;
  *  - Winkler boost only when jaro > 0.7: j + l·0.1·(1-j), l = common
  *    prefix length capped at 4.
  *
  * Evaluates on UTF-16 chars (≡ code points for the ASCII columns it is
  * used on). O(|a|·|b|) worst case per pair — callers MUST block first
  * (the fuzzy-link query blocks on the first name token) so the pair set,
  * not the comparator, bounds the work; the stage keeps whole-stage
  * codegen via the call-out pattern (TextStatsExpr's codegen note).
  */
final case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(la, lb) / 2 - 1
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!mb(j) && b.charAt(j) == a.charAt(i)) {
          ma(i) = true; mb(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(4, math.min(la, lb))
    while (p < pmax && a.charAt(p) == b.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

object StringSim {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
