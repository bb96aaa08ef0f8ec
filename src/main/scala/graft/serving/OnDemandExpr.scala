package graft.serving

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow, QueryPlanningTracker}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Project}
import org.apache.spark.sql.types._

/** Request-time evaluation of a DURABLE on-demand feature — the SQL
  * expression string form ([[graft.catalog.OnDemandVariant]], the
  * persistable analogue of the reference's serialized on-demand function,
  * metadata.proto:326-328) — WITHOUT a Spark job per request.
  *
  * The reference's on-demand functions receive `(client, params, entities)`
  * (client/src/featureform/serving.py:236-241); here the expression sees a
  * named row of request params + the entity's already-resolved precomputed
  * feature values. Compilation happens ONCE at registration: parse the
  * expression, analyze it against a [[LocalRelation]] of the declared input
  * schema, bind column references to row ordinals. Per request the bound
  * expression is interpreted over a single [[InternalRow]] — microseconds,
  * zero jobs, no driver-side planner in the hot path.
  *
  * Inputs are leniently coerced (a request param parsed as Long feeds a
  * DOUBLE column, etc.) because HTTP query params are duck-typed; anything
  * non-coercible surfaces as the expression's own cast/analysis error at
  * registration or a null at eval, matching SQL semantics. */
final class OnDemandExprEval private (
    fields: Array[StructField],
    bound: Expression,
    toCatalyst: Array[Any => Any],
    toScala: Any => Any) {

  /** The expression's resolved output type. */
  def dataType: DataType = bound.dataType

  /** Declared input column names — the store resolves any of these not
    * present in the request (param or requested feature) with its own
    * point lookup, the `client` role of the reference's on-demand
    * signature. */
  def inputNames: Seq[String] = fields.map(_.name).toSeq

  // string→numeric coercions cover EVERY numeric input type (HTTP query
  // params arrive as strings) and a non-numeric string becomes NULL —
  // SQL CAST semantics — instead of a NumberFormatException-driven 500
  private def coerce(raw: Any, dt: DataType): Any = (raw, dt) match {
    case (null, _) => null
    case (n: Number, LongType) => n.longValue()
    case (n: Number, IntegerType) => n.intValue()
    case (n: Number, DoubleType) => n.doubleValue()
    case (n: Number, FloatType) => n.floatValue()
    case (s: String, LongType) => s.toLongOption.getOrElse(null): Any
    case (s: String, IntegerType) => s.toIntOption.getOrElse(null): Any
    case (s: String, DoubleType) => s.toDoubleOption.getOrElse(null): Any
    case (s: String, FloatType) => s.toFloatOption.getOrElse(null): Any
    case (v, _) => v
  }

  /** Evaluate over named inputs; absent names evaluate as NULL.
    * Synchronized: interpreted Catalyst expressions are not guaranteed
    * thread-safe and the eval is microsecond-scale. */
  def apply(values: Map[String, Any]): Any = synchronized {
    val row = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      val raw = values.getOrElse(fields(i).name, null)
      row(i) = toCatalyst(i)(coerce(raw, fields(i).dataType))
      i += 1
    }
    toScala(bound.eval(InternalRow.fromSeq(row.toIndexedSeq)))
  }
}

object OnDemandExprEval {

  /** Compile `expr` against the declared input columns. Fails fast at
    * registration on parse/analysis errors (unknown column, type error) —
    * the same moment the reference rejects a bad on-demand definition. */
  def compile(spark: SparkSession, outputName: String, expr: String,
              inputs: StructType): OnDemandExprEval = {
    val attrs = inputs.fields.toIndexedSeq.map(f =>
      AttributeReference(f.name, f.dataType, nullable = true)())
    val parsed = spark.sessionState.sqlParser.parseExpression(expr)
    val plan = Project(Seq(Alias(parsed, outputName)()),
      LocalRelation(attrs))
    val analyzed = spark.sessionState.analyzer
      .executeAndCheck(plan, new QueryPlanningTracker)
    val resolved = analyzed.asInstanceOf[Project].projectList.head
    val bound = BindReferences.bindReference(
      resolved.asInstanceOf[Expression], attrs)
    val toCatalyst = inputs.fields.map(f =>
      CatalystTypeConverters.createToCatalystConverter(f.dataType))
    val toScala =
      CatalystTypeConverters.createToScalaConverter(bound.dataType)
    new OnDemandExprEval(inputs.fields, bound, toCatalyst, toScala)
  }
}
