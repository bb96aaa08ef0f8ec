package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.expressions.JaroWinkler

/** Derives a cheap LENGTH prefilter from a Jaro-Winkler threshold gate —
  * the record-linkage length-filtering optimization as a Catalyst
  * optimizer rule.
  *
  * For `jaro_winkler(a, b) >= t` with `t > 0.8`:
  *   jw = j + p·0.1·(1−j) ≤ 0.6·j + 0.4   (prefix p ≤ 4)
  *     ⇒ j ≥ (t − 0.4) / 0.6,
  *   and with m ≤ min(|a|,|b|), (m−tr)/m ≤ 1, |a| ≤ |b|:
  *   j ≤ (m/|a| + m/|b| + 1)/3 ≤ (2 + |a|/|b|)/3
  *     ⇒ min/max length ratio ≥ 3·(t−0.4)/0.6 − 2 = 5t − 4.
  *
  * So `min(len)·1.0 >= (5t−4)·max(len)` is a NECESSARY condition for the
  * gate — the rule conjoins it BEFORE the comparator, where codegen's
  * short-circuit And evaluates the two integer lengths and skips the
  * O(|a|·|b|) comparator for pairs that cannot pass. On blocked linkage
  * joins the guard also reaches the join condition with the jw conjunct,
  * pruning before the expensive similarity. At t = 0.9 the bound is 0.5:
  * any pair whose lengths differ by more than 2× is rejected by two
  * `length` calls. Semantics are unchanged (the guard is implied by the
  * gate; null flows already fail both). For t ≤ 0.8 the bound is
  * non-positive and the rule leaves the plan alone.
  *
  * Registered via [[graft.GraftExtensions]]; purely an optimization —
  * results are bit-identical with or without it. */
object JaroWinklerLengthPrune extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(jw: JaroWinkler, t: Double): Expression = {
    val la = Cast(Length(jw.left), DoubleType)
    val lb = Cast(Length(jw.right), DoubleType)
    GreaterThanOrEqual(Least(Seq(la, lb)),
      Multiply(Literal(5.0 * t - 4.0), Greatest(Seq(la, lb))))
  }

  private def thresholdOf(c: Expression): Option[(JaroWinkler, Double)] =
    c match {
      case GreaterThanOrEqual(jw: JaroWinkler, Literal(t: Double, DoubleType))
        if t > 0.8 => Some((jw, t))
      case GreaterThan(jw: JaroWinkler, Literal(t: Double, DoubleType))
        if t > 0.8 => Some((jw, t))
      case LessThanOrEqual(Literal(t: Double, DoubleType), jw: JaroWinkler)
        if t > 0.8 => Some((jw, t))
      case _ => None
    }

  /** cond with implied guards conjoined ahead of the comparator, or None
    * when there is nothing (new) to add. */
  private def withGuards(cond: Expression): Option[Expression] = {
    if (!cond.deterministic) return None
    val conjuncts = splitConjunctivePredicates(cond)
    val guards = conjuncts.flatMap(thresholdOf).map {
      case (jw, t) => guardFor(jw, t)
    }.filterNot(g => conjuncts.exists(_.semanticEquals(g)))
    if (guards.isEmpty) None
    else Some((guards ++ conjuncts).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    // the gate may sit in a Filter, or — after PushPredicateThroughJoin —
    // in the Join condition itself; guard both homes
    case f @ Filter(cond, child) =>
      withGuards(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      withGuards(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
