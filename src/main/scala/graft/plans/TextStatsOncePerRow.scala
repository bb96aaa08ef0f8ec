package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LogicalFilter, LogicalPlan, Project}
import org.apache.spark.sql.execution.{FilterExec, ProjectExec, SparkPlan, SparkStrategy}
import graft.functions.expressions.TextStats

/** Plans a `Filter` whose predicate evaluates the SAME [[TextStats]]
  * expression more than once into `Project(out) ∘ Filter ∘ Project(out ++
  * stats)` so the document is walked ONCE per row.
  *
  * Why a planner strategy and not a `Rule[LogicalPlan]`: Spark's
  * projection-level subexpression elimination dedupes repeated TextStats in
  * a `Project` (see TextStatsExpr's codegen note), but `FilterExec` has no
  * subexpression elimination — a gate like `qualityScore(text) >= 0.5 AND
  * langId(text) = 'en'` expands to ~12 field reads, each carrying its own
  * copy of the TextStats subtree, i.e. ~12 full document walks per row. A
  * logical rewrite to Project∘Filter∘Project cannot survive the optimizer:
  * `PushPredicateThroughNonJoin` re-inlines the aliased expression into the
  * predicate in the same fixed-point batch (and again in SparkOptimizer's
  * post-hoc pushdown batches), restoring the copies. Physical planning runs
  * after all of that, so the split sticks — and whole-stage codegen fuses
  * the three operators back into one stage, where the projection-level
  * subexpression elimination applies.
  *
  * Parquet pushdown is preserved: conjuncts NOT touching TextStats are left
  * in a logical `Filter` below the split, which the default strategies plan
  * with the usual scan pushdown (`PushedFilters` asserted in the spec).
  *
  * Registered via [[graft.GraftExtensions]]
  * (`spark.sql.extensions=graft.GraftExtensions`). Purely a physical
  * optimization: output is bit-identical with or without it.
  */
object TextStatsOncePerRow extends SparkStrategy with PredicateHelper {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    // FileSourceStrategy's PhysicalOperation pattern swallows the whole
    // Project∘Filter∘Scan subtree at the root, so the Filter is never
    // offered to strategies on its own — match the wrapped shape too.
    case Project(projectList, f: LogicalFilter) =>
      planFilter(f).map(fe => ProjectExec(projectList, fe)).toSeq
    case f: LogicalFilter =>
      // restore the child's schema: the stats column must not leak
      planFilter(f)
        .map(fe => ProjectExec(f.child.output: Seq[NamedExpression], fe))
        .toSeq
    case _ => Nil
  }

  /** The FilterExec∘ProjectExec(… ++ stats) split, or None when the
    * predicate holds no repeated TextStats. Output carries the extra
    * stats column — callers wrap in a pruning ProjectExec. */
  private def planFilter(f: LogicalFilter): Option[SparkPlan] = {
    // splitting reorders conjunct evaluation; only safe when the whole
    // predicate is deterministic (same rule Spark's own pushdown applies)
    if (!f.condition.deterministic) return None
    val conjuncts = splitConjunctivePredicates(f.condition)
    val (tsConjuncts, plainConjuncts) =
      conjuncts.partition(_.exists(_.isInstanceOf[TextStats]))
    val occurrences =
      tsConjuncts.flatMap(_.collect { case t: TextStats => t })
    val groups = occurrences.groupBy(_.canonicalized)
    if (groups.isEmpty || groups.values.forall(_.size < 2)) None
    else {
      // one alias per distinct TextStats input; every occurrence (even
      // single ones — the projection is already being built) reads it
      val aliases: Map[Expression, Alias] = groups.map {
        case (canon, ts) => canon -> Alias(ts.head, "__ts_struct")()
      }
      val rewritten = tsConjuncts
        .map(_.transform {
          case t: TextStats => aliases(t.canonicalized).toAttribute
        })
        .reduce(And)
      val below: LogicalPlan =
        if (plainConjuncts.isEmpty) f.child
        else LogicalFilter(plainConjuncts.reduce(And), f.child)
      val withStats: Seq[NamedExpression] =
        (f.child.output: Seq[NamedExpression]) ++ aliases.values
      Some(FilterExec(rewritten, ProjectExec(withStats, planLater(below))))
    }
  }

  /** True when planning `plan` would split the filter (spec/debug aid). */
  def wouldRewrite(cond: Expression): Boolean = {
    val occ = cond.collect { case t: TextStats => t }
    occ.groupBy(_.canonicalized).values.exists(_.size >= 2)
  }
}
