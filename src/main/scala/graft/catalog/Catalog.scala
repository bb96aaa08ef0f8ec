package graft.catalog

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.ResourceSchema

/** (name, variant) identity shared by every resource — reference
  * metadata/metadata.go resource IDs; immutable, versioned by variant. */
final case class ResourceId(name: String, variant: String = "default") {
  override def toString: String = s"$name.$variant"
}

/** Source definitions — reference metadata.proto:500-525 (SourceVariant),
  * 631-639 (PrimaryData), 562-629 (Transformation).
  */
sealed trait SourceDef

/** Raw table/file location (PrimaryData). `format` ∈ {parquet, csv, json}. */
final case class PrimaryData(
    path: String,
    format: String = "parquet",
    timestampColumn: Option[String] = None,
    csvHeader: Boolean = true)
    extends SourceDef

/** SQL transformation with `{{name.variant}}` source templating
  * (reference metadata.proto:605-615; templating provider/spark.go:1010-1126). */
final case class SqlTransformation(query: String) extends SourceDef

/** Scala DataFrame transformation — the reference's dill-pickled Python fn
  * (metadata.proto:617-629) re-expressed as a first-class Scala closure.
  * `fnName` makes the definition durable: persistence stores the name and
  * [[CatalogStore.load]] rebinds it from a caller-supplied function registry
  * (closures themselves die with the JVM — same constraint the reference
  * works around by pickling). */
final case class DfTransformation(inputs: Seq[ResourceId], fn: Seq[DataFrame] => DataFrame,
                                  fnName: Option[String] = None)
    extends SourceDef

/** Partition layout hints — reference metadata.proto:583-590. */
sealed trait PartitionHint
final case class HashPartition(column: String, buckets: Int) extends PartitionHint
final case class DailyPartition(column: String) extends PartitionHint

final case class SourceVariant(
    id: ResourceId,
    definition: SourceDef,
    partition: Option[PartitionHint] = None,
    isIncremental: Boolean = false)

/** Feature resource — source projected onto the canonical (entity, value, ts)
  * triple (reference metadata.proto:254-284). */
final case class FeatureVariant(
    id: ResourceId,
    source: ResourceId,
    schema: ResourceSchema,
    entity: String = "entity")

/** Label with multi-entity mappings (reference metadata.proto:344-381). */
final case class EntityMapping(entityName: String, column: String)
final case class LabelVariant(
    id: ResourceId,
    source: ResourceId,
    mappings: Seq[EntityMapping],
    valueColumn: String,
    timestampColumn: Option[String] = None)

/** Lag feature — reference metadata.proto:330-335 (FeatureLag). */
final case class FeatureLag(feature: ResourceId, name: String, lagSeconds: Long)

final case class TrainingSetVariant(
    id: ResourceId,
    label: ResourceId,
    features: Seq[ResourceId],
    lags: Seq[FeatureLag] = Nil)

final case class EntityDef(name: String)

/** On-demand (request-time) feature as a Spark SQL expression string over the
  * already-assembled feature row — the durable form of the reference's
  * serialized on-demand function (metadata.proto:326-328; SURVEY §2.10 maps
  * request-time fns to `functions.expr`). Strings persist; closures don't. */
final case class OnDemandVariant(id: ResourceId, expr: String) {
  /** Batch application: add the feature to an assembled frame. */
  def apply(df: DataFrame): DataFrame =
    df.withColumn(id.name, org.apache.spark.sql.functions.expr(expr))
}

/** In-memory resource registry + DAG resolution. The reference runs a task DAG
  * over a metadata server (scheduling/task_dag.go:17-73); in a single Spark
  * process that collapses to memoized topological resolution of DataFrames.
  *
  * Thread-safety: synchronized maps; resolution is idempotent (resources are
  * immutable once registered — re-registering the same id with an equal
  * definition is a no-op, a conflicting one throws, matching the reference's
  * equivalence check (metadata.proto:244-247 GetEquivalentRequest)).
  */
final class Catalog(spark: SparkSession) {
  private val sources   = mutable.LinkedHashMap.empty[ResourceId, SourceVariant]
  private val features  = mutable.LinkedHashMap.empty[ResourceId, FeatureVariant]
  private val labels    = mutable.LinkedHashMap.empty[ResourceId, LabelVariant]
  private val tsets     = mutable.LinkedHashMap.empty[ResourceId, TrainingSetVariant]
  private val entities  = mutable.LinkedHashMap.empty[String, EntityDef]
  private val onDemands = mutable.LinkedHashMap.empty[ResourceId, OnDemandVariant]
  private val resolved  = mutable.HashMap.empty[ResourceId, DataFrame]

  private def put[V](m: mutable.Map[ResourceId, V], id: ResourceId, v: V): V =
    synchronized {
      m.get(id) match {
        case Some(existing) if existing == v => existing
        case Some(_) =>
          throw new IllegalArgumentException(
            s"resource $id already registered with a different definition")
        case None => m.put(id, v); v
      }
    }

  def registerSource(s: SourceVariant): SourceVariant     = put(sources, s.id, s)
  def registerFeature(f: FeatureVariant): FeatureVariant  = put(features, f.id, f)
  def registerLabel(l: LabelVariant): LabelVariant        = put(labels, l.id, l)
  def registerTrainingSet(t: TrainingSetVariant): TrainingSetVariant = put(tsets, t.id, t)
  def registerEntity(e: EntityDef): EntityDef =
    synchronized { entities.getOrElseUpdate(e.name, e) }
  def registerOnDemand(o: OnDemandVariant): OnDemandVariant = put(onDemands, o.id, o)

  def source(id: ResourceId): SourceVariant           = sources(id)
  def feature(id: ResourceId): FeatureVariant         = features(id)
  def label(id: ResourceId): LabelVariant             = labels(id)
  def trainingSet(id: ResourceId): TrainingSetVariant = tsets(id)
  def onDemand(id: ResourceId): OnDemandVariant       = onDemands(id)
  def allSources: Seq[SourceVariant]   = synchronized(sources.values.toSeq)
  def allFeatures: Seq[FeatureVariant] = synchronized(features.values.toSeq)
  def allLabels: Seq[LabelVariant]     = synchronized(labels.values.toSeq)
  def allTrainingSets: Seq[TrainingSetVariant] = synchronized(tsets.values.toSeq)
  def allEntities: Seq[EntityDef]      = synchronized(entities.values.toSeq)
  def allOnDemands: Seq[OnDemandVariant] = synchronized(onDemands.values.toSeq)

  /** Resolve a source to a DataFrame, recursively materializing upstream
    * transformations (reference coordinator/tasks/source.go:429-533). Memoized;
    * cycles are detected and rejected. Lazy DataFrames keep the whole DAG a
    * single Catalyst plan — no intermediate writes unless asked for.
    */
  def resolve(id: ResourceId, inFlight: Set[ResourceId] = Set.empty): DataFrame = {
    synchronized(resolved.get(id)) match {
      case Some(df) => df
      case None =>
        if (inFlight.contains(id))
          throw new IllegalStateException(s"cycle in source DAG at $id")
        val sv = sources.getOrElse(id,
          throw new NoSuchElementException(s"unknown source $id"))
        val df = sv.definition match {
          case p: PrimaryData => graft.sources.Readers.readPrimary(spark, p)
          case SqlTransformation(q) =>
            graft.transform.SqlTransform.run(spark, q,
              rid => resolve(rid, inFlight + id))
          case DfTransformation(inputs, fn, _) =>
            fn(inputs.map(i => resolve(i, inFlight + id)))
        }
        synchronized(resolved.getOrElseUpdate(id, df))
    }
  }

  /** The feature's source projected onto (entity, value, ts). */
  def featureTriple(id: ResourceId): DataFrame = {
    val f = feature(id)
    graft.ops.Materialize.toTriple(resolve(f.source), f.schema)
  }
}
