package graft.transform

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.ResourceId

/** T1/T2: SQL transformations with `{{name.variant}}` source templating.
  *
  * The reference rewrites `{{name.variant}}` placeholders to `source_i` temp
  * views, registers each input DataFrame under that view, then runs the query
  * through the engine verbatim (provider/spark.go:1010-1126,
  * offline_store_spark_runner.py:851-958). We do the same against SparkSQL:
  * the full Catalyst surface (joins, window functions, grouping sets, scalar
  * library) is the transformation language — no re-implementation.
  *
  * View names are uniquified per invocation so concurrent transformations in
  * one session can't collide.
  */
object SqlTransform {

  // {{ name }} or {{ name.variant }} — the reference validates a FROM {{...}}
  // exists (client register.py:1168); we just require ≥1 placeholder.
  private val Placeholder = raw"\{\{\s*([A-Za-z0-9_\-]+)(?:\.([A-Za-z0-9_\-]+))?\s*\}\}".r
  private val counter = new AtomicLong(0)

  /** Extract the ordered distinct source ids referenced by the query. */
  def sourcesOf(query: String): Seq[ResourceId] = {
    val seen = mutable.LinkedHashSet.empty[ResourceId]
    Placeholder.findAllMatchIn(query).foreach { m =>
      seen += ResourceId(m.group(1), Option(m.group(2)).getOrElse("default"))
    }
    seen.toSeq
  }

  /** Rewrite placeholders to the given view names (same semantics as the
    * reference's source_0..n substitution). */
  def rewrite(query: String, views: Map[ResourceId, String]): String =
    Placeholder.replaceAllIn(query, m => {
      val rid = ResourceId(m.group(1), Option(m.group(2)).getOrElse("default"))
      views.getOrElse(rid,
        throw new NoSuchElementException(s"unresolved template source $rid"))
    })

  /** Run a templated SQL transformation; `resolve` supplies each referenced
    * source as a DataFrame (enabling chained transformations, T4). */
  def run(spark: SparkSession, query: String,
          resolve: ResourceId => DataFrame): DataFrame = {
    val srcs = sourcesOf(query)
    require(srcs.nonEmpty, s"transformation references no {{source}} placeholders: $query")
    val runId = counter.incrementAndGet()
    val views = srcs.zipWithIndex.map { case (rid, i) =>
      val view = s"graft_src_${runId}_$i"
      resolve(rid).createOrReplaceTempView(view)
      rid -> view
    }.toMap
    try spark.sql(rewrite(query, views))
    finally () // temp views are tiny metadata; dropped with the session
  }

  /** Run with explicit input DataFrames keyed by id (no catalog needed). */
  def runWith(spark: SparkSession, query: String,
              inputs: Map[ResourceId, DataFrame]): DataFrame =
    run(spark, query, rid => inputs.getOrElse(rid,
      throw new NoSuchElementException(s"missing input $rid")))
}
