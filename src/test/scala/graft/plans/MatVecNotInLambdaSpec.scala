package graft.plans

import graft.SparkSpec
import graft.functions.expressions.{MatVec, MatVecArgMax, MatVecTopCells}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.LambdaFunction

/** The kmeans/IVF/PQ assignment family must keep its matrix-vector work
  * OUT of higher-order-function lambdas: CollapseProject inlines a
  * single-reference dots column straight into the lambda body, and
  * higher-order functions evaluate their lambda once PER ELEMENT with no
  * invariant hoisting — so a `withColumn("__dots", matVec)` +
  * `array_max(transform(...))` shape silently re-evaluates the whole
  * nlist×dim product once per codebook entry (O(nlist²·dim) per row, a
  * scan-stage scale-killer at the nlist≈√n operating rule). Round 9 fused
  * the dots+argmax into the compiled [[MatVecArgMax]]/[[MatVecTopCells]]
  * kernels; this spec pins the optimized plans so a refactor cannot
  * regress to the inlined shape. */
class MatVecNotInLambdaSpec extends SparkSpec {

  /** Occurrences of any MatVec-family kernel nested under a
    * LambdaFunction anywhere in the optimized plan. */
  private def matVecInLambda(df: DataFrame): Int = {
    var hits = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case lf: LambdaFunction =>
          lf.foreach {
            case _: MatVec | _: MatVecArgMax | _: MatVecTopCells => hits += 1
            case _ => ()
          }
        case _ => ()
      })
    }
    hits
  }

  private def kernels(df: DataFrame): (Int, Int) = {
    var argmax = 0
    var topCells = 0
    df.queryExecution.optimizedPlan.foreach { node =>
      node.expressions.foreach(_.foreach {
        case _: MatVecArgMax => argmax += 1
        case _: MatVecTopCells => topCells += 1
        case _ => ()
      })
    }
    (argmax, topCells)
  }

  private val assignmentQueries =
    Seq("knn_graph", "knn_graph_pq", "knn_graph_incr", "pq_search",
      "semantic_dedup", "incremental_kmeans")

  test("no MatVec-family kernel is evaluated inside a lambda body") {
    for (name <- assignmentQueries) {
      val df = graft.SparkEntry.queries(name)(spark, sf001)
      assert(matVecInLambda(df) == 0,
        s"$name: mat_vec inside a lambdafunction — the per-codebook-entry " +
          "re-evaluation shape is back")
    }
  }

  test("the fused assignment kernels are actually in the plans") {
    val (am, tc) = kernels(graft.SparkEntry.queries("knn_graph")(spark, sf001))
    assert(am > 0, "knn_graph plan carries no MatVecArgMax — assignment " +
      "went through some other (unaudited) shape")
    assert(tc > 0, "knn_graph plan carries no MatVecTopCells probe kernel")
    val (amPq, _) = kernels(
      graft.SparkEntry.queries("knn_graph_pq")(spark, sf001))
    assert(amPq > 0, "knn_graph_pq plan carries no MatVecArgMax code kernel")
  }
}
