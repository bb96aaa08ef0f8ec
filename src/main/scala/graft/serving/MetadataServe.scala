package graft.serving

import org.apache.spark.sql.DataFrame
import org.sparkproject.connect.grpc.{ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.netty.NettyServerBuilder
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

import graft.catalog._
import ProtoWire.{R, W}

/** The reference's metadata/registration gRPC service, served for real —
  * `featureform.serving.metadata.proto.Metadata`
  * (/root/reference/metadata/proto/metadata.proto:19-71, server role
  * metadata/metadata.go) on an actual gRPC/HTTP2 endpoint over the same
  * shaded-runtime + [[ProtoWire]] stack as [[GrpcServe]]. This is the
  * plane `client.apply()` speaks: Create* registrations, the Get* and
  * List* read streams, GetEquivalent, Run, SetResourceStatus, and the staged
  * deletion lifecycle (MarkForDeletion → GetStagedForDeletionResource →
  * FinalizeDeletion / PruneResource, metadata.proto:46-53).
  *
  * Backing state is the in-process [[graft.catalog.Catalog]] (durable via
  * [[graft.catalog.CatalogStore]] under FenceGuard); wire messages map to
  * catalog resources:
  *  - SourceVariant.primaryData.filestore → [[PrimaryData]] (format by
  *    extension); .transformation.SQLTransformation → [[SqlTransformation]]
  *    (`{{name.variant}}` templating); .DFTransformation → a named fn from
  *    the server's `dfFns` registry (the durable form of the reference's
  *    dill bytes — metadata.proto:617-629).
  *  - FeatureVariant mode PRECOMPUTED → [[FeatureVariant]] over Columns;
  *    mode CLIENT_COMPUTED → [[OnDemandVariant]] from
  *    additional_parameters.ondemand.definition (or the function bytes as
  *    UTF-8 — our on-demand definitions are Spark SQL expression strings).
  *  - LabelVariant.entity_mappings → [[LabelVariant]] (deprecated Columns
  *    accepted as a single-mapping fallback, metadata.proto:355-361).
  *  - TrainingSetVariant features/label/feature_lags → [[TrainingSetVariant]].
  *  - owner/description/provider/schedule and unmodeled typed fields
  *    (ValueType, serialized_config) ride the catalog property map under
  *    reserved `__`-prefixed keys and are re-emitted verbatim; user-set
  *    Tags/Properties round-trip unprefixed.
  *
  * Create semantics follow metadata.go:3581-3641 (genericCreate): an
  * equivalent re-registration is a no-op, a conflicting one is
  * ALREADY_EXISTS; the parent resource's default variant is the LATEST
  * created (setDefaultVariant on every create), variants list in
  * registration order. GetEquivalent matches on key attributes and
  * returns an EMPTY ResourceVariant when nothing matches
  * (metadata.go:3430-3487). The same handlers are also exposed under the
  * `featureform.serving.metadata.proto.Api` name (the api-server proxy
  * role, metadata.proto:74-117).
  */
final class MetadataServe(catalog: Catalog, port: Int = 0,
                          /** DF-transformation function registry — wire
                            * DFTransformations bind here by source_text /
                            * canonical name (same contract as
                            * CatalogStore.load). */
                          dfFns: Map[String, Seq[DataFrame] => DataFrame] = Map.empty,
                          /** Physical half of FinalizeDeletion (the
                            * scrubLatest/gcVersions/forget hook). */
                          onFinalize: ResourceKey => Unit = _ => (),
                          /** Sink for the Api service's WriteFeatures /
                            * WriteLabels client streams (the reference's
                            * streaming registration writes,
                            * metadata.proto:116-117). None →
                            * UNIMPLEMENTED, like a server built without
                            * the streaming provider. */
                          store: Option[OnlineStore] = None,
                          /** Ledger behind the
                            * `featureform.scheduling.proto.Tasks` service
                            * (the reference metadata server hosts BOTH
                            * services in one process, metadata.go:2026-
                            * 2345). None → the Tasks service is not
                            * registered on the endpoint. */
                          tasks: Option[graft.sched.TaskRunner] = None,
                          val metrics: Metrics = new Metrics) {
  import MetadataServe._

  // ------------------------------------------------------------- helpers

  private def prop(key: ResourceKey, name: String): Option[String] =
    catalog.properties(key).get(name).filter(_.nonEmpty)

  private def setMeta(key: ResourceKey, pairs: (String, String)*): Unit = {
    val m = pairs.collect { case (k, v) if v.nonEmpty => s"__$k" -> v }.toMap
    if (m.nonEmpty) catalog.setProperties(key, m)
  }

  private def userProps(key: ResourceKey): Seq[(String, String)] =
    catalog.properties(key).toSeq.filterNot(_._1.startsWith("__")).sortBy(_._1)

  private def notFound(what: String): Nothing =
    throw Status.NOT_FOUND.withDescription(what).asRuntimeException()

  private def conflict(e: IllegalArgumentException): Nothing =
    throw Status.ALREADY_EXISTS
      .withDescription(Option(e.getMessage).getOrElse("conflicting definition"))
      .asRuntimeException()

  private def invalid(msg: String): Nothing =
    throw Status.INVALID_ARGUMENT.withDescription(msg).asRuntimeException()

  /** Live (non-staged) variants of a name, registration order. */
  private def liveSourceVariants(name: String): Seq[SourceVariant] =
    catalog.allSources.filter(s => s.id.name == name &&
      !catalog.isStaged(ResourceKey("SOURCE", s.id.toString)))
  private def liveFeatureVariants(name: String): Seq[FeatureVariant] =
    catalog.allFeatures.filter(f => f.id.name == name &&
      !catalog.isStaged(ResourceKey("FEATURE", f.id.toString)))
  private def liveOnDemandVariants(name: String): Seq[OnDemandVariant] =
    catalog.allOnDemands.filter(o => o.id.name == name &&
      !catalog.isStaged(ResourceKey("ON_DEMAND", o.id.toString)))
  private def liveLabelVariants(name: String): Seq[LabelVariant] =
    catalog.allLabels.filter(l => l.id.name == name &&
      !catalog.isStaged(ResourceKey("LABEL", l.id.toString)))
  private def liveTsetVariants(name: String): Seq[TrainingSetVariant] =
    catalog.allTrainingSets.filter(t => t.id.name == name &&
      !catalog.isStaged(ResourceKey("TRAINING_SET", t.id.toString)))

  // ------------------------------------------------------ Create handlers

  private def createSourceVariant(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("source_variant required"))
    var name = ""; var variant = ""
    var defn: Option[SourceDef] = None
    var partition: Option[PartitionHint] = None
    var owner = ""; var desc = ""; var provider = ""; var schedule = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (4, _) => owner = body.readString()
      case (5, _) => desc = body.readString()
      case (6, _) => provider = body.readString()
      case (14, _) => // Transformation
        val t = body.readSlice()
        var tm = true
        while (tm) t.readTag() match {
          case (0, _) => tm = false
          case (1, _) => // SQLTransformation{query=1}
            val s = t.readSlice()
            var sm = true
            while (sm) s.readTag() match {
              case (0, _) => sm = false
              case (1, _) => defn = Some(SqlTransformation(s.readString()))
              case (_, wt) => s.skip(wt)
            }
          case (2, _) => // DFTransformation{query=1, inputs=2, source_text=3}
            val d = t.readSlice()
            var fnName = ""
            val inputs = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
            var dm = true
            while (dm) d.readTag() match {
              case (0, _) => dm = false
              case (1, _) =>
                val b = d.readBytes() // dill stand-in: a UTF-8 fn name
                if (fnName.isEmpty)
                  fnName = new String(b, java.nio.charset.StandardCharsets.UTF_8)
              case (2, _) => inputs += readNV(d.readSlice())
              case (3, _) => fnName = d.readString()
              case (8, _) => if (fnName.isEmpty) fnName = d.readString()
              case (_, wt) => d.skip(wt)
            }
            val fn = dfFns.getOrElse(fnName, invalid(
              s"df transformation '$fnName' is not in the server function registry"))
            defn = Some(DfTransformation(inputs.toSeq, fn, Some(fnName)))
          case (4, _) => // HashPartition{column=1, buckets=2}
            val h = t.readSlice()
            var c = ""; var b = 0
            var hm = true
            while (hm) h.readTag() match {
              case (0, _) => hm = false
              case (1, _) => c = h.readString()
              case (2, _) => b = h.readVarint().toInt
              case (_, wt) => h.skip(wt)
            }
            partition = Some(HashPartition(c, b))
          case (5, _) => // DailyPartition{column=1}
            val dp = t.readSlice()
            var c = ""
            var dm = true
            while (dm) dp.readTag() match {
              case (0, _) => dm = false
              case (1, _) => c = dp.readString()
              case (_, wt) => dp.skip(wt)
            }
            partition = Some(DailyPartition(c))
          case (_, wt) => t.skip(wt)
        }
      case (15, _) => // PrimaryData
        val p = body.readSlice()
        var path = ""; var tsCol: Option[String] = None
        var pm = true
        while (pm) p.readTag() match {
          case (0, _) => pm = false
          case (3, _) => // FileStoreTable{path=1}
            val f = p.readSlice()
            var fm = true
            while (fm) f.readTag() match {
              case (0, _) => fm = false
              case (1, _) => path = f.readString()
              case (_, wt) => f.skip(wt)
            }
          case (2, _) => tsCol = Some(p.readString()).filter(_.nonEmpty)
          case (_, wt) => p.skip(wt)
        }
        if (path.isEmpty) invalid("primaryData requires a filestore path")
        val fmt =
          if (path.endsWith(".csv")) "csv"
          else if (path.endsWith(".json") || path.endsWith(".jsonl")) "json"
          else if (path.endsWith(".orc")) "orc"
          else "parquet"
        defn = Some(PrimaryData(path, fmt, tsCol))
      case (16, _) => schedule = body.readString()
      case (17, _) => tags = readTags(body.readSlice())
      case (18, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    val id = ResourceId(name, variant)
    val d = defn.getOrElse(invalid("source definition (transformation or primaryData) required"))
    try catalog.registerSource(SourceVariant(id, d, partition))
    catch { case e: IllegalArgumentException => conflict(e) }
    val key = ResourceKey("SOURCE", id.toString)
    setMeta(key, "owner" -> owner, "description" -> desc,
      "provider" -> provider, "schedule" -> schedule)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createFeatureVariant(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("feature_variant required"))
    var name = ""; var variant = ""
    var source = ResourceId("", "")
    var entity = ""; var owner = ""; var desc = ""; var provider = ""
    var colEntity = ""; var colValue = ""; var colTs = ""
    var mode = 0
    var onDemandDef = ""; var fnBytes = ""
    var typeB64 = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (3, _) => source = readNV(body.readSlice())
      case (5, _) => entity = body.readString()
      case (7, _) => owner = body.readString()
      case (8, _) => desc = body.readString()
      case (9, _) => provider = body.readString()
      case (12, _) => // Columns{entity=1, value=2, ts=3}
        val c = body.readSlice()
        var cm = true
        while (cm) c.readTag() match {
          case (0, _) => cm = false
          case (1, _) => colEntity = c.readString()
          case (2, _) => colValue = c.readString()
          case (3, _) => colTs = c.readString()
          case (_, wt) => c.skip(wt)
        }
      case (17, _) => // PythonFunction{query=1} — our durable form is UTF-8
        val f = body.readSlice()
        var fm = true
        while (fm) f.readTag() match {
          case (0, _) => fm = false
          case (1, _) => fnBytes = new String(f.readBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          case (_, wt) => f.skip(wt)
        }
      case (18, _) => mode = body.readVarint().toInt
      case (22, _) => // FeatureParameters{ondemand=2{definition=1}}
        val ap = body.readSlice()
        var am = true
        while (am) ap.readTag() match {
          case (0, _) => am = false
          case (2, _) =>
            val od = ap.readSlice()
            var om = true
            while (om) od.readTag() match {
              case (0, _) => om = false
              case (1, _) => onDemandDef = od.readString()
              case (_, wt) => od.skip(wt)
            }
          case (_, wt) => ap.skip(wt)
        }
      case (25, _) => typeB64 = b64(body.readBytes()) // ValueType, verbatim
      case (15, _) => tags = readTags(body.readSlice())
      case (16, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    val id = ResourceId(name, variant)
    val isOnDemand = mode == 1 || (onDemandDef.nonEmpty && colValue.isEmpty)
    val key =
      if (isOnDemand) {
        val expr = if (onDemandDef.nonEmpty) onDemandDef else fnBytes
        if (expr.isEmpty) invalid("CLIENT_COMPUTED feature requires " +
          "additional_parameters.ondemand.definition (a Spark SQL expression)")
        try catalog.registerOnDemand(OnDemandVariant(id, expr))
        catch { case e: IllegalArgumentException => conflict(e) }
        ResourceKey("ON_DEMAND", id.toString)
      } else {
        if (colValue.isEmpty) invalid("PRECOMPUTED feature requires columns")
        val schema = graft.types.ResourceSchema(colEntity, colValue,
          Some(colTs).filter(_.nonEmpty))
        try catalog.registerFeature(FeatureVariant(id, source, schema,
          if (entity.nonEmpty) entity else colEntity))
        catch { case e: IllegalArgumentException => conflict(e) }
        ResourceKey("FEATURE", id.toString)
      }
    setMeta(key, "owner" -> owner, "description" -> desc,
      "provider" -> provider, "type" -> typeB64)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createLabelVariant(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("label_variant required"))
    var name = ""; var variant = ""
    var source = ResourceId("", "")
    var entity = ""; var owner = ""; var desc = ""; var provider = ""
    var colEntity = ""; var colValue = ""; var colTs = ""
    var mappings = Seq.empty[EntityMapping]
    var emValue = ""; var emTs = ""
    var typeB64 = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (3, _) => desc = body.readString()
      case (5, _) => source = readNV(body.readSlice())
      case (6, _) => entity = body.readString()
      case (8, _) => owner = body.readString()
      case (9, _) => provider = body.readString()
      case (12, _) => // deprecated Columns fallback
        val c = body.readSlice()
        var cm = true
        while (cm) c.readTag() match {
          case (0, _) => cm = false
          case (1, _) => colEntity = c.readString()
          case (2, _) => colValue = c.readString()
          case (3, _) => colTs = c.readString()
          case (_, wt) => c.skip(wt)
        }
      case (22, _) => // EntityMappings{mappings=1, value_column=2, timestamp_column=3}
        val em = body.readSlice()
        val ms = scala.collection.mutable.ArrayBuffer.empty[EntityMapping]
        var mm = true
        while (mm) em.readTag() match {
          case (0, _) => mm = false
          case (1, _) => // EntityMapping{name=1, entity_column=2}
            val m = em.readSlice()
            var n = ""; var col = ""
            var im = true
            while (im) m.readTag() match {
              case (0, _) => im = false
              case (1, _) => n = m.readString()
              case (2, _) => col = m.readString()
              case (_, wt) => m.skip(wt)
            }
            ms += EntityMapping(n, col)
          case (2, _) => emValue = em.readString()
          case (3, _) => emTs = em.readString()
          case (_, wt) => em.skip(wt)
        }
        mappings = ms.toSeq
      case (18, _) => typeB64 = b64(body.readBytes())
      case (13, _) => tags = readTags(body.readSlice())
      case (14, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    val id = ResourceId(name, variant)
    val (finalMappings, valueCol, tsCol) =
      if (mappings.nonEmpty) (mappings, emValue, Some(emTs).filter(_.nonEmpty))
      else if (colValue.nonEmpty)
        (Seq(EntityMapping(if (entity.nonEmpty) entity else "entity", colEntity)),
          colValue, Some(colTs).filter(_.nonEmpty))
      else invalid("label requires entity_mappings (or deprecated columns)")
    try catalog.registerLabel(LabelVariant(id, source, finalMappings, valueCol, tsCol))
    catch { case e: IllegalArgumentException => conflict(e) }
    val key = ResourceKey("LABEL", id.toString)
    setMeta(key, "owner" -> owner, "description" -> desc, "provider" -> provider,
      "type" -> typeB64)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createTrainingSetVariant(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("training_set_variant required"))
    var name = ""; var variant = ""
    var owner = ""; var desc = ""; var provider = ""; var schedule = ""
    var label = ResourceId("", "")
    val feats = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
    val lags = scala.collection.mutable.ArrayBuffer.empty[FeatureLag]
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (3, _) => desc = body.readString()
      case (4, _) => owner = body.readString()
      case (6, _) => provider = body.readString()
      case (8, _) => feats += readNV(body.readSlice())
      case (9, _) => label = readNV(body.readSlice())
      case (14, _) => schedule = body.readString()
      case (15, _) => // FeatureLag{feature=1, variant=2, name=3, lag=4 Duration}
        val fl = body.readSlice()
        var f = ""; var v = ""; var lagName = ""; var seconds = 0L
        var fm = true
        while (fm) fl.readTag() match {
          case (0, _) => fm = false
          case (1, _) => f = fl.readString()
          case (2, _) => v = fl.readString()
          case (3, _) => lagName = fl.readString()
          case (4, _) => // Duration{seconds=1, nanos=2}
            val d = fl.readSlice()
            var dm = true
            while (dm) d.readTag() match {
              case (0, _) => dm = false
              case (1, _) => seconds = d.readVarint()
              case (_, wt) => d.skip(wt)
            }
          case (_, wt) => fl.skip(wt)
        }
        lags += FeatureLag(ResourceId(f, v), lagName, seconds)
      case (16, _) => tags = readTags(body.readSlice())
      case (17, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    val id = ResourceId(name, variant)
    try catalog.registerTrainingSet(
      TrainingSetVariant(id, label, feats.toSeq, lags.toSeq))
    catch { case e: IllegalArgumentException => conflict(e) }
    val key = ResourceKey("TRAINING_SET", id.toString)
    setMeta(key, "owner" -> owner, "description" -> desc,
      "provider" -> provider, "schedule" -> schedule)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createEntity(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("entity required"))
    var name = ""; var desc = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => desc = body.readString()
      case (7, _) => tags = readTags(body.readSlice())
      case (8, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    if (name.isEmpty) invalid("entity name required")
    catalog.registerEntity(EntityDef(name))
    val key = ResourceKey("ENTITY", name)
    setMeta(key, "description" -> desc)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createProvider(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("provider required"))
    var name = ""; var desc = ""; var ptype = ""
    var software = ""; var team = ""; var configB64 = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => desc = body.readString()
      case (3, _) => ptype = body.readString()
      case (4, _) => software = body.readString()
      case (5, _) => team = body.readString()
      case (6, _) => configB64 = b64(body.readBytes())
      case (12, _) => tags = readTags(body.readSlice())
      case (13, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    if (name.isEmpty) invalid("provider name required")
    try catalog.registerProvider(ProviderDef(name, ptype, desc))
    catch { case e: IllegalArgumentException => conflict(e) }
    val key = ResourceKey("PROVIDER", name)
    setMeta(key, "software" -> software, "team" -> team, "config" -> configB64)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createUser(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("user required"))
    var name = ""
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (8, _) => tags = readTags(body.readSlice())
      case (9, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    if (name.isEmpty) invalid("user name required")
    catalog.registerUser(UserDef(name))
    val key = ResourceKey("USER", name)
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def createModel(req: Array[Byte]): Array[Byte] = {
    val body = firstSlice(req, 1).getOrElse(invalid("model required"))
    var name = ""; var desc = ""
    val feats = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
    val labelRefs = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
    val tsets = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
    var tags = Seq.empty[String]; var props = Seq.empty[(String, String)]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => desc = body.readString()
      case (3, _) => feats += readNV(body.readSlice())
      case (4, _) => labelRefs += readNV(body.readSlice())
      case (5, _) => tsets += readNV(body.readSlice())
      case (6, _) => tags = readTags(body.readSlice())
      case (7, _) => props = readProps(body.readSlice())
      case (_, wt) => body.skip(wt)
    }
    if (name.isEmpty) invalid("model name required")
    catalog.registerModel(ModelDef(name, feats.toSeq, tsets.toSeq))
    val key = ResourceKey("MODEL", name)
    setMeta(key, "description" -> desc,
      "labels" -> labelRefs.map(_.toString).mkString(","))
    if (tags.nonEmpty) catalog.addTags(key, tags)
    if (props.nonEmpty) catalog.setProperties(key, props.toMap)
    catalog.setStatus(key, StCreated)
    Empty
  }

  private def requestScheduleChange(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var key: Option[ResourceKey] = None
    var schedule = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => key = Some(readResourceId(r.readSlice()))
      case (2, _) => schedule = r.readString()
      case (_, wt) => r.skip(wt)
    }
    val k = key.getOrElse(invalid("resource_id required"))
    setMeta(k, "schedule" -> schedule)
    Empty
  }

  private def setResourceStatus(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var key: Option[ResourceKey] = None
    var st = 0; var msg = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => key = Some(readResourceId(r.readSlice()))
      case (2, _) => // ResourceStatus{status=1, error_message=2}
        val s = r.readSlice()
        var sm = true
        while (sm) s.readTag() match {
          case (0, _) => sm = false
          case (1, _) => st = s.readVarint().toInt
          case (2, _) => msg = s.readString()
          case (_, wt) => s.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    catalog.setStatus(key.getOrElse(invalid("resource_id required")), st, msg)
    Empty
  }

  /** Run: resolve each named source variant through the catalog DAG
    * (validating the registration actually computes) and move it — and
    * any feature/label/training-set variants named — to READY; a failed
    * resolution lands FAILED with the error message (the coordinator's
    * job in the reference, collapsed to synchronous resolution). */
  private def run(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    val targets = scala.collection.mutable.ArrayBuffer.empty[ResourceKey]
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (2, _) => // ResourceVariant oneof — we need only (kind, name, variant)
        val rv = r.readSlice()
        var rm = true
        while (rm) rv.readTag() match {
          case (0, _) => rm = false
          case (fld, _) if fld >= 1 && fld <= 4 =>
            val v = rv.readSlice()
            var name = ""; var variant = ""
            var vm = true
            while (vm) v.readTag() match {
              case (0, _) => vm = false
              case (1, _) => name = v.readString()
              case (2, _) => variant = v.readString()
              case (_, wt) => v.skip(wt)
            }
            val kind = fld match {
              case 1 => "FEATURE"; case 2 => "LABEL"
              case 3 => "TRAINING_SET"; case 4 => "SOURCE"
            }
            targets += ResourceKey(kind, ResourceId(name, variant).toString)
          case (_, wt) => rv.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    targets.foreach { k =>
      try {
        if (k.kind == "SOURCE") {
          val i = k.id.lastIndexOf('.')
          catalog.resolve(ResourceId(k.id.take(i), k.id.drop(i + 1)))
        }
        catalog.setStatus(k, StReady)
      } catch {
        case e: Exception =>
          catalog.setStatus(k, StFailed, Option(e.getMessage).getOrElse(e.toString))
      }
    }
    Empty
  }

  // ---------------------------------------------------- deletion handlers

  private def markForDeletion(req: Array[Byte]): Array[Byte] = {
    val key = readDeletionKey(req)
    try catalog.markForDeletion(key)
    catch {
      case e: IllegalStateException =>
        throw Status.FAILED_PRECONDITION
          .withDescription(Option(e.getMessage).getOrElse("has dependents"))
          .asRuntimeException()
      case e: IllegalArgumentException =>
        notFound(Option(e.getMessage).getOrElse(key.toString))
    }
    Empty
  }

  private def finalizeDeletion(req: Array[Byte]): Array[Byte] = {
    val key = readDeletionKey(req)
    try catalog.finalizeDeletion(key, onFinalize)
    catch {
      case e: IllegalArgumentException =>
        throw Status.FAILED_PRECONDITION
          .withDescription(Option(e.getMessage).getOrElse("not staged"))
          .asRuntimeException()
    }
    Empty
  }

  private def getStagedForDeletionResource(req: Array[Byte]): Array[Byte] = {
    val key = readDeletionKey(req)
    val res = catalog.stagedForDeletion(key)
      .getOrElse(notFound(s"no staged resource ${key.kind} ${key.id}"))
    val w = new W
    w.msg(1)(writeResourceVariant(_, key.kind, res)) // GetStaged...Response{resource_variant=1}
    w.result()
  }

  private def pruneResource(req: Array[Byte]): Array[Byte] = {
    val key = readDeletionKey(req)
    try catalog.pruneResource(key)
    catch {
      case e: IllegalStateException =>
        throw Status.FAILED_PRECONDITION
          .withDescription(Option(e.getMessage).getOrElse("not deletable"))
          .asRuntimeException()
      case e: IllegalArgumentException =>
        notFound(Option(e.getMessage).getOrElse(key.toString))
    }
    Empty // PruneResourceResponse{} (snowflake-only fields unset)
  }

  private def readDeletionKey(req: Array[Byte]): ResourceKey = {
    val r = new R(req)
    var key: Option[ResourceKey] = None
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => key = Some(readResourceId(r.readSlice()))
      case (_, wt) => r.skip(wt)
    }
    key.getOrElse(invalid("resource_id required"))
  }

  // --------------------------------------------------- GetEquivalent / Run

  /** Equivalence on key attributes (metadata.go findEquivalent): for a
    * source — definition; a feature — source + columns + entity; a label —
    * source + mappings + value column; a training set — label + features +
    * lags. No match → EMPTY ResourceVariant (unset oneof). */
  private def getEquivalent(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var out: Array[Byte] = new W().result() // empty ResourceVariant
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (2, _) =>
        val rv = r.readSlice()
        var rm = true
        while (rm) rv.readTag() match {
          case (0, _) => rm = false
          case (4, _) => // SourceVariant
            val cand = parseSourceForEquiv(rv.readSlice())
            liveSourceVariants(cand.id.name)
              .find(_.definition == cand.definition)
              .foreach { m =>
                val w = new W
                w.msg(4)(writeSourceVariant(_, m))
                out = w.result()
              }
          case (1, _) => // FeatureVariant
            val (id, src, schema, entity, odExpr) = parseFeatureForEquiv(rv.readSlice())
            if (odExpr.nonEmpty)
              liveOnDemandVariants(id.name).find(_.expr == odExpr).foreach { m =>
                val w = new W
                w.msg(1)(writeOnDemandAsFeature(_, m))
                out = w.result()
              }
            else
              liveFeatureVariants(id.name)
                .find(f => f.source == src && f.schema == schema && f.entity == entity)
                .foreach { m =>
                  val w = new W
                  w.msg(1)(writeFeatureVariant(_, m))
                  out = w.result()
                }
          case (2, _) => // LabelVariant
            val (id, src, maps, value) = parseLabelForEquiv(rv.readSlice())
            liveLabelVariants(id.name)
              .find(l => l.source == src && l.mappings == maps && l.valueColumn == value)
              .foreach { m =>
                val w = new W
                w.msg(2)(writeLabelVariant(_, m))
                out = w.result()
              }
          case (3, _) => // TrainingSetVariant
            val cand = parseTsetForEquiv(rv.readSlice())
            liveTsetVariants(cand.id.name)
              .find(t => t.label == cand.label && t.features == cand.features &&
                t.lags == cand.lags)
              .foreach { m =>
                val w = new W
                w.msg(3)(writeTsetVariant(_, m))
                out = w.result()
              }
          case (_, wt) => rv.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    out
  }

  private def parseSourceForEquiv(body: R): SourceVariant = {
    var name = ""; var variant = ""
    var defn: SourceDef = PrimaryData("")
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (14, _) =>
        val t = body.readSlice()
        var tm = true
        while (tm) t.readTag() match {
          case (0, _) => tm = false
          case (1, _) =>
            val s = t.readSlice()
            var sm = true
            while (sm) s.readTag() match {
              case (0, _) => sm = false
              case (1, _) => defn = SqlTransformation(s.readString())
              case (_, wt) => s.skip(wt)
            }
          case (2, _) =>
            val d = t.readSlice()
            var fnName = ""
            val inputs = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
            var dm = true
            while (dm) d.readTag() match {
              case (0, _) => dm = false
              case (1, _) =>
                val b = d.readBytes()
                if (fnName.isEmpty)
                  fnName = new String(b, java.nio.charset.StandardCharsets.UTF_8)
              case (2, _) => inputs += readNV(d.readSlice())
              case (3, _) => fnName = d.readString()
              case (_, wt) => d.skip(wt)
            }
            // equivalence compares (inputs, fnName); the fn itself only
            // matters at registration — bind the registered one if present
            defn = DfTransformation(inputs.toSeq,
              dfFns.getOrElse(fnName, identityFn), Some(fnName))
          case (_, wt) => t.skip(wt)
        }
      case (15, _) =>
        val p = body.readSlice()
        var path = ""; var tsCol: Option[String] = None
        var pm = true
        while (pm) p.readTag() match {
          case (0, _) => pm = false
          case (3, _) =>
            val f = p.readSlice()
            var fm = true
            while (fm) f.readTag() match {
              case (0, _) => fm = false
              case (1, _) => path = f.readString()
              case (_, wt) => f.skip(wt)
            }
          case (2, _) => tsCol = Some(p.readString()).filter(_.nonEmpty)
          case (_, wt) => p.skip(wt)
        }
        val fmt =
          if (path.endsWith(".csv")) "csv"
          else if (path.endsWith(".json") || path.endsWith(".jsonl")) "json"
          else if (path.endsWith(".orc")) "orc"
          else "parquet"
        defn = PrimaryData(path, fmt, tsCol)
      case (_, wt) => body.skip(wt)
    }
    SourceVariant(ResourceId(name, variant), defn)
  }

  private def parseFeatureForEquiv(body: R)
      : (ResourceId, ResourceId, graft.types.ResourceSchema, String, String) = {
    var name = ""; var variant = ""
    var src = ResourceId("", "")
    var entity = ""
    var ce = ""; var cv = ""; var ct = ""
    var od = ""
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (3, _) => src = readNV(body.readSlice())
      case (5, _) => entity = body.readString()
      case (12, _) =>
        val c = body.readSlice()
        var cm = true
        while (cm) c.readTag() match {
          case (0, _) => cm = false
          case (1, _) => ce = c.readString()
          case (2, _) => cv = c.readString()
          case (3, _) => ct = c.readString()
          case (_, wt) => c.skip(wt)
        }
      case (22, _) =>
        val ap = body.readSlice()
        var am = true
        while (am) ap.readTag() match {
          case (0, _) => am = false
          case (2, _) =>
            val o = ap.readSlice()
            var om = true
            while (om) o.readTag() match {
              case (0, _) => om = false
              case (1, _) => od = o.readString()
              case (_, wt) => o.skip(wt)
            }
          case (_, wt) => ap.skip(wt)
        }
      case (_, wt) => body.skip(wt)
    }
    (ResourceId(name, variant), src,
      graft.types.ResourceSchema(ce, cv, Some(ct).filter(_.nonEmpty)),
      if (entity.nonEmpty) entity else ce, od)
  }

  private def parseLabelForEquiv(body: R)
      : (ResourceId, ResourceId, Seq[EntityMapping], String) = {
    var name = ""; var variant = ""
    var src = ResourceId("", "")
    var maps = Seq.empty[EntityMapping]; var value = ""
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (5, _) => src = readNV(body.readSlice())
      case (22, _) =>
        val em = body.readSlice()
        val ms = scala.collection.mutable.ArrayBuffer.empty[EntityMapping]
        var mm = true
        while (mm) em.readTag() match {
          case (0, _) => mm = false
          case (1, _) =>
            val m = em.readSlice()
            var n = ""; var col = ""
            var im = true
            while (im) m.readTag() match {
              case (0, _) => im = false
              case (1, _) => n = m.readString()
              case (2, _) => col = m.readString()
              case (_, wt) => m.skip(wt)
            }
            ms += EntityMapping(n, col)
          case (2, _) => value = em.readString()
          case (_, wt) => em.skip(wt)
        }
        maps = ms.toSeq
      case (_, wt) => body.skip(wt)
    }
    (ResourceId(name, variant), src, maps, value)
  }

  private def parseTsetForEquiv(body: R): TrainingSetVariant = {
    var name = ""; var variant = ""
    var label = ResourceId("", "")
    val feats = scala.collection.mutable.ArrayBuffer.empty[ResourceId]
    val lags = scala.collection.mutable.ArrayBuffer.empty[FeatureLag]
    var more = true
    while (more) body.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = body.readString()
      case (2, _) => variant = body.readString()
      case (8, _) => feats += readNV(body.readSlice())
      case (9, _) => label = readNV(body.readSlice())
      case (15, _) =>
        val fl = body.readSlice()
        var f = ""; var v = ""; var lagName = ""; var seconds = 0L
        var fm = true
        while (fm) fl.readTag() match {
          case (0, _) => fm = false
          case (1, _) => f = fl.readString()
          case (2, _) => v = fl.readString()
          case (3, _) => lagName = fl.readString()
          case (4, _) =>
            val d = fl.readSlice()
            var dm = true
            while (dm) d.readTag() match {
              case (0, _) => dm = false
              case (1, _) => seconds = d.readVarint()
              case (_, wt) => d.skip(wt)
            }
          case (_, wt) => fl.skip(wt)
        }
        lags += FeatureLag(ResourceId(f, v), lagName, seconds)
      case (_, wt) => body.skip(wt)
    }
    TrainingSetVariant(ResourceId(name, variant), label, feats.toSeq, lags.toSeq)
  }

  // --------------------------------------------------- response emitters

  private def writeStatus(w: W, field: Int, key: ResourceKey): Unit = {
    val (st, msg) = catalog.status(key)
    w.msg(field) { s =>
      if (st != 0) s.enum(1, st)
      if (msg.nonEmpty) s.str(2, msg)
    }
  }

  private def writeTagsProps(w: W, key: ResourceKey,
                             tagsField: Int, propsField: Int): Unit = {
    val ts = catalog.tags(key)
    if (ts.nonEmpty) w.msg(tagsField)(t => ts.foreach(t.str(1, _)))
    val ps = userProps(key)
    if (ps.nonEmpty) w.msg(propsField) { p =>
      ps.foreach { case (k, v) =>
        p.msg(1) { e => e.str(1, k); e.msg(2)(_.str(1, v)) } // map entry
      }
    }
  }

  private def writeMeta(w: W, key: ResourceKey,
                        ownerF: Int, descF: Int, provF: Int): Unit = {
    if (ownerF > 0) prop(key, "__owner").foreach(w.str(ownerF, _))
    if (descF > 0) prop(key, "__description").foreach(w.str(descF, _))
    if (provF > 0) prop(key, "__provider").foreach(w.str(provF, _))
  }

  private def writeSourceVariant(w: W, sv: SourceVariant): Unit = {
    val key = ResourceKey("SOURCE", sv.id.toString)
    w.str(1, sv.id.name); w.str(2, sv.id.variant)
    sv.definition match {
      case PrimaryData(path, _, tsCol, _) =>
        w.msg(15) { p =>
          p.msg(3)(_.str(1, path))
          tsCol.foreach(p.str(2, _))
        }
      case SqlTransformation(q) =>
        w.msg(14) { t =>
          t.msg(1) { s =>
            s.str(1, q)
            graft.transform.SqlTransform.sourcesOf(q)
              .foreach(nv => s.msg(2)(writeNV(_, nv)))
          }
          writePartition(t, sv.partition)
        }
      case DfTransformation(inputs, _, fnName) =>
        w.msg(14) { t =>
          t.msg(2) { d =>
            fnName.foreach { n =>
              d.bytes(1, n.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              d.str(3, n)
            }
            inputs.foreach(nv => d.msg(2)(writeNV(_, nv)))
          }
          writePartition(t, sv.partition)
        }
    }
    writeMeta(w, key, 4, 5, 6)
    writeStatus(w, 8, key)
    prop(key, "__schedule").foreach(w.str(16, _))
    writeTagsProps(w, key, 17, 18)
  }

  private def writePartition(t: W, p: Option[PartitionHint]): Unit = p match {
    case Some(HashPartition(c, b)) =>
      t.msg(4) { h => h.str(1, c); h.int32(2, b) }
    case Some(DailyPartition(c)) => t.msg(5)(_.str(1, c))
    case None => ()
  }

  private def writeFeatureVariant(w: W, f: FeatureVariant): Unit = {
    val key = ResourceKey("FEATURE", f.id.toString)
    w.str(1, f.id.name); w.str(2, f.id.variant)
    w.msg(3)(writeNV(_, f.source))
    w.str(5, f.entity)
    writeMeta(w, key, 7, 8, 9)
    writeStatus(w, 10, key)
    // reverse lineage: training sets containing this feature
    catalog.allTrainingSets.filter(_.features.contains(f.id))
      .foreach(t => w.msg(11)(writeNV(_, t.id)))
    w.msg(12) { c =>
      c.str(1, f.schema.entity); c.str(2, f.schema.value)
      f.schema.ts.foreach(c.str(3, _))
    }
    writeTagsProps(w, key, 15, 16)
    w.enum(18, 0) // PRECOMPUTED
    prop(key, "__type").foreach(t => w.bytes(25, unb64(t)))
  }

  private def writeOnDemandAsFeature(w: W, o: OnDemandVariant): Unit = {
    val key = ResourceKey("ON_DEMAND", o.id.toString)
    w.str(1, o.id.name); w.str(2, o.id.variant)
    writeMeta(w, key, 7, 8, 9)
    writeStatus(w, 10, key)
    w.msg(17)(_.bytes(1, o.expr.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    writeTagsProps(w, key, 15, 16)
    w.enum(18, 1) // CLIENT_COMPUTED
    w.msg(22)(_.msg(2)(_.str(1, o.expr))) // FeatureParameters.ondemand.definition
  }

  private def writeLabelVariant(w: W, l: LabelVariant): Unit = {
    val key = ResourceKey("LABEL", l.id.toString)
    w.str(1, l.id.name); w.str(2, l.id.variant)
    prop(key, "__description").foreach(w.str(3, _))
    w.msg(5)(writeNV(_, l.source))
    l.mappings.headOption.foreach(m => w.str(6, m.entityName))
    prop(key, "__owner").foreach(w.str(8, _))
    prop(key, "__provider").foreach(w.str(9, _))
    writeStatus(w, 10, key)
    catalog.allTrainingSets.filter(_.label == l.id)
      .foreach(t => w.msg(11)(writeNV(_, t.id)))
    w.msg(22) { em =>
      l.mappings.foreach(m =>
        em.msg(1) { e => e.str(1, m.entityName); e.str(2, m.column) })
      em.str(2, l.valueColumn)
      l.timestampColumn.foreach(em.str(3, _))
    }
    writeTagsProps(w, key, 13, 14)
    prop(key, "__type").foreach(t => w.bytes(18, unb64(t)))
  }

  private def writeTsetVariant(w: W, t: TrainingSetVariant): Unit = {
    val key = ResourceKey("TRAINING_SET", t.id.toString)
    w.str(1, t.id.name); w.str(2, t.id.variant)
    prop(key, "__description").foreach(w.str(3, _))
    prop(key, "__owner").foreach(w.str(4, _))
    prop(key, "__provider").foreach(w.str(6, _))
    writeStatus(w, 7, key)
    t.features.foreach(f => w.msg(8)(writeNV(_, f)))
    w.msg(9)(writeNV(_, t.label))
    prop(key, "__schedule").foreach(w.str(14, _))
    t.lags.foreach { lg =>
      w.msg(15) { fl =>
        fl.str(1, lg.feature.name); fl.str(2, lg.feature.variant)
        fl.str(3, lg.name)
        fl.msg(4)(_.int64(1, lg.lagSeconds))
      }
    }
    writeTagsProps(w, key, 16, 17)
  }

  private def writeResourceVariant(w: W, kind: String, res: Any): Unit =
    (kind, res) match {
      case ("SOURCE", sv: SourceVariant) => w.msg(4)(writeSourceVariant(_, sv))
      case ("FEATURE", fv: FeatureVariant) => w.msg(1)(writeFeatureVariant(_, fv))
      case ("ON_DEMAND", od: OnDemandVariant) =>
        w.msg(1)(writeOnDemandAsFeature(_, od))
      case ("LABEL", lv: LabelVariant) => w.msg(2)(writeLabelVariant(_, lv))
      case ("TRAINING_SET", tv: TrainingSetVariant) =>
        w.msg(3)(writeTsetVariant(_, tv))
      case other =>
        throw Status.INTERNAL
          .withDescription(s"resource kind ${other._1} has no variant form")
          .asRuntimeException()
    }

  // Parent messages: {name=1, status=2, default_variant=3, variants=4}.
  // Default variant = LATEST registered (metadata.go setDefaultVariant on
  // every create); variants in registration order; staged excluded.
  private def writeParent(w: W, name: String, variants: Seq[ResourceId],
                          kind: String): Unit = {
    w.str(1, name)
    variants.lastOption.foreach { last =>
      writeStatus(w, 2, ResourceKey(kind, last.toString))
      w.str(3, last.variant)
    }
    variants.foreach(v => w.str(4, v.variant))
  }

  private def featureParent(name: String): Array[Byte] = {
    val vs = liveFeatureVariants(name).map(_.id) ++
      liveOnDemandVariants(name).map(_.id)
    if (vs.isEmpty) notFound(s"feature $name")
    val w = new W
    // on-demand and precomputed share the FEATURE namespace; status keys
    // differ, so pick whichever kind the latest variant registered under
    val kind = if (liveFeatureVariants(name).map(_.id).contains(vs.last))
      "FEATURE" else "ON_DEMAND"
    writeParent(w, name, vs, kind)
    w.result()
  }

  private def labelParent(name: String): Array[Byte] = {
    val vs = liveLabelVariants(name).map(_.id)
    if (vs.isEmpty) notFound(s"label $name")
    val w = new W; writeParent(w, name, vs, "LABEL"); w.result()
  }

  private def tsetParent(name: String): Array[Byte] = {
    val vs = liveTsetVariants(name).map(_.id)
    if (vs.isEmpty) notFound(s"training set $name")
    val w = new W; writeParent(w, name, vs, "TRAINING_SET"); w.result()
  }

  private def sourceParent(name: String): Array[Byte] = {
    val vs = liveSourceVariants(name).map(_.id)
    if (vs.isEmpty) notFound(s"source $name")
    val w = new W; writeParent(w, name, vs, "SOURCE"); w.result()
  }

  private def userMsg(name: String): Array[Byte] = {
    if (!catalog.allUsers.exists(_.name == name)) notFound(s"user $name")
    val key = ResourceKey("USER", name)
    val w = new W
    w.str(1, name)
    writeStatus(w, 2, key)
    def owned(kind: String): Seq[ResourceId] = kind match {
      case "FEATURE" => (catalog.allFeatures.map(_.id) ++
        catalog.allOnDemands.map(_.id)).filter(id =>
        ownerOf("FEATURE", "ON_DEMAND", id) == name)
      case "LABEL" => catalog.allLabels.map(_.id)
        .filter(id => prop(ResourceKey("LABEL", id.toString), "__owner").contains(name))
      case "TRAINING_SET" => catalog.allTrainingSets.map(_.id)
        .filter(id => prop(ResourceKey("TRAINING_SET", id.toString), "__owner").contains(name))
      case _ => catalog.allSources.map(_.id)
        .filter(id => prop(ResourceKey("SOURCE", id.toString), "__owner").contains(name))
    }
    owned("FEATURE").foreach(id => w.msg(3)(writeNV(_, id)))
    owned("LABEL").foreach(id => w.msg(4)(writeNV(_, id)))
    owned("TRAINING_SET").foreach(id => w.msg(5)(writeNV(_, id)))
    owned("SOURCE").foreach(id => w.msg(6)(writeNV(_, id)))
    writeTagsProps(w, key, 8, 9)
    w.result()
  }

  private def ownerOf(k1: String, k2: String, id: ResourceId): String =
    prop(ResourceKey(k1, id.toString), "__owner")
      .orElse(prop(ResourceKey(k2, id.toString), "__owner")).getOrElse("")

  private def entityMsg(name: String): Array[Byte] = {
    if (!catalog.allEntities.exists(_.name == name)) notFound(s"entity $name")
    val key = ResourceKey("ENTITY", name)
    val w = new W
    w.str(1, name)
    prop(key, "__description").foreach(w.str(2, _))
    writeStatus(w, 3, key)
    catalog.allFeatures.filter(_.entity == name)
      .foreach(f => w.msg(4)(writeNV(_, f.id)))
    catalog.allLabels.filter(_.mappings.exists(_.entityName == name))
      .foreach(l => w.msg(5)(writeNV(_, l.id)))
    val entLabels = catalog.allLabels
      .filter(_.mappings.exists(_.entityName == name)).map(_.id).toSet
    catalog.allTrainingSets.filter(t => entLabels.contains(t.label))
      .foreach(t => w.msg(6)(writeNV(_, t.id)))
    writeTagsProps(w, key, 7, 8)
    w.result()
  }

  private def providerMsg(name: String): Array[Byte] = {
    val p = catalog.allProviders.find(_.name == name)
      .getOrElse(notFound(s"provider $name"))
    val key = ResourceKey("PROVIDER", name)
    val w = new W
    w.str(1, p.name)
    if (p.description.nonEmpty) w.str(2, p.description)
    w.str(3, p.providerType)
    prop(key, "__software").foreach(w.str(4, _))
    prop(key, "__team").foreach(w.str(5, _))
    prop(key, "__config").foreach(c => w.bytes(6, unb64(c)))
    writeStatus(w, 7, key)
    def onProvider(kind: String, ids: Seq[ResourceId]): Seq[ResourceId] =
      ids.filter(id =>
        prop(ResourceKey(kind, id.toString), "__provider").contains(name))
    onProvider("SOURCE", catalog.allSources.map(_.id))
      .foreach(id => w.msg(8)(writeNV(_, id)))
    onProvider("FEATURE", catalog.allFeatures.map(_.id))
      .foreach(id => w.msg(9)(writeNV(_, id)))
    onProvider("TRAINING_SET", catalog.allTrainingSets.map(_.id))
      .foreach(id => w.msg(10)(writeNV(_, id)))
    onProvider("LABEL", catalog.allLabels.map(_.id))
      .foreach(id => w.msg(11)(writeNV(_, id)))
    writeTagsProps(w, key, 12, 13)
    w.result()
  }

  private def modelMsg(name: String): Array[Byte] = {
    val m = catalog.allModels.find(_.name == name)
      .getOrElse(notFound(s"model $name"))
    val key = ResourceKey("MODEL", name)
    val w = new W
    w.str(1, m.name)
    prop(key, "__description").foreach(w.str(2, _))
    m.features.foreach(f => w.msg(3)(writeNV(_, f)))
    prop(key, "__labels").foreach(_.split(',').filter(_.nonEmpty).foreach { s =>
      val i = s.lastIndexOf('.')
      w.msg(4)(writeNV(_, ResourceId(s.take(i), s.drop(i + 1))))
    })
    m.trainingSets.foreach(t => w.msg(5)(writeNV(_, t)))
    writeTagsProps(w, key, 6, 7)
    w.result()
  }

  private def featureVariantMsg(id: ResourceId): Array[Byte] = {
    val w = new W
    liveFeatureVariants(id.name).find(_.id == id) match {
      case Some(f) => writeFeatureVariant(w, f)
      case None =>
        val od = liveOnDemandVariants(id.name).find(_.id == id)
          .getOrElse(notFound(s"feature variant $id"))
        writeOnDemandAsFeature(w, od)
    }
    w.result()
  }

  private def labelVariantMsg(id: ResourceId): Array[Byte] = {
    val l = liveLabelVariants(id.name).find(_.id == id)
      .getOrElse(notFound(s"label variant $id"))
    val w = new W; writeLabelVariant(w, l); w.result()
  }

  private def tsetVariantMsg(id: ResourceId): Array[Byte] = {
    val t = liveTsetVariants(id.name).find(_.id == id)
      .getOrElse(notFound(s"training set variant $id"))
    val w = new W; writeTsetVariant(w, t); w.result()
  }

  private def sourceVariantMsg(id: ResourceId): Array[Byte] = {
    val s = liveSourceVariants(id.name).find(_.id == id)
      .getOrElse(notFound(s"source variant $id"))
    val w = new W; writeSourceVariant(w, s); w.result()
  }

  // ------------------------------------------------------- List* streams

  private def distinctNames[T](ids: Seq[ResourceId]): Seq[String] =
    ids.map(_.name).distinct

  private def listMsgs(kind: String): Seq[Array[Byte]] = kind match {
    case "FEATURE" => distinctNames(liveFeatureIds ++
      catalog.allOnDemands.map(_.id)).map(featureParent)
    case "LABEL" => distinctNames(catalog.allLabels.map(_.id)
      .filterNot(id => catalog.isStaged(ResourceKey("LABEL", id.toString))))
      .map(labelParent)
    case "TRAINING_SET" => distinctNames(catalog.allTrainingSets.map(_.id)
      .filterNot(id => catalog.isStaged(ResourceKey("TRAINING_SET", id.toString))))
      .map(tsetParent)
    case "SOURCE" => distinctNames(catalog.allSources.map(_.id)
      .filterNot(id => catalog.isStaged(ResourceKey("SOURCE", id.toString))))
      .map(sourceParent)
    case "USER" => catalog.allUsers.map(u => userMsg(u.name))
    case "PROVIDER" => catalog.allProviders
      .filterNot(p => catalog.isStaged(ResourceKey("PROVIDER", p.name)))
      .map(p => providerMsg(p.name))
    case "ENTITY" => catalog.allEntities.map(e => entityMsg(e.name))
    case _ => catalog.allModels.map(m => modelMsg(m.name))
  }

  private def liveFeatureIds: Seq[ResourceId] =
    catalog.allFeatures.map(_.id)
      .filterNot(id => catalog.isStaged(ResourceKey("FEATURE", id.toString)))

  // ----------------------------------------------------- gRPC plumbing

  private def unary(route: String, h: Array[Byte] => Array[Byte]) =
    ServerCalls.asyncUnaryCall(
      new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte],
                            obs: StreamObserver[Array[Byte]]): Unit = {
          val t0 = System.nanoTime()
          try {
            val out = h(req)
            metrics.observe(route, System.nanoTime() - t0, error = false)
            obs.onNext(out); obs.onCompleted()
          } catch {
            case e: Throwable =>
              metrics.observe(route, System.nanoTime() - t0, error = true)
              obs.onError(Backpressure.toStatus(e))
          }
        }
      })

  /** Bidi Get*: one response per incoming request, completed with the
    * request stream (metadata.go genericGet). A lookup failure errors the
    * stream — same as the generated server. */
  private def bidiGet(route: String, h: Array[Byte] => Array[Byte]) =
    ServerCalls.asyncBidiStreamingCall(
      new ServerCalls.BidiStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(obs: StreamObserver[Array[Byte]])
            : StreamObserver[Array[Byte]] =
          new StreamObserver[Array[Byte]] {
            // once onError closes the call, the client's half-close still
            // delivers onCompleted — a second close throws
            private var closed = false
            override def onNext(req: Array[Byte]): Unit = {
              val t0 = System.nanoTime()
              try {
                val out = h(req)
                metrics.observe(route, System.nanoTime() - t0, error = false)
                obs.onNext(out)
              } catch {
                case e: Throwable =>
                  metrics.observe(route, System.nanoTime() - t0, error = true)
                  closed = true
                  obs.onError(Backpressure.toStatus(e))
              }
            }
            override def onError(t: Throwable): Unit = ()
            override def onCompleted(): Unit =
              if (!closed) { closed = true; obs.onCompleted() }
          }
      })

  private def listStream(route: String, kind: String) =
    ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte],
                            obs: StreamObserver[Array[Byte]]): Unit = {
          val t0 = System.nanoTime()
          try {
            // metadata-sized by definition (a registry listing, not data)
            Backpressure.drive(obs, listMsgs(kind).iterator,
              err => metrics.observe(route, System.nanoTime() - t0,
                error = err.isDefined))
          } catch {
            case e: Throwable =>
              metrics.observe(route, System.nanoTime() - t0, error = true)
              obs.onError(Backpressure.toStatus(e))
          }
        }
      })

  /** NameRequest{name=1 Name{name=1}} → the inner name. */
  private def nameOf(req: Array[Byte]): String = {
    val r = new R(req)
    var name = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) =>
        val n = r.readSlice()
        var nm = true
        while (nm) n.readTag() match {
          case (0, _) => nm = false
          case (1, _) => name = n.readString()
          case (_, wt) => n.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    name
  }

  /** NameVariantRequest{name_variant=1 NameVariant} → ResourceId. */
  private def nvOf(req: Array[Byte]): ResourceId = {
    val r = new R(req)
    var id = ResourceId("", "")
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => id = readNV(r.readSlice())
      case (_, wt) => r.skip(wt)
    }
    id
  }

  /** Api-only client streams: each StreamingFeatureVariant /
    * StreamingLabelVariant lands in the online store under the
    * latest-value rule ([[OnlineStore.upsertWithTs]] — out-of-order
    * messages can't regress). Value strings duck-type long → double →
    * string, the HTTP facade's rule; labels go to a `__label__`-prefixed
    * table so a label can share a feature's name. Responds Empty when the
    * client half-closes (the generated server's shape). */
  private def writeStream(route: String, valueField: Int, entityField: Int,
                          tablePrefix: String)
      : org.sparkproject.connect.grpc.ServerCallHandler[Array[Byte], Array[Byte]] =
    ServerCalls.asyncClientStreamingCall(
      new ServerCalls.ClientStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(obs: StreamObserver[Array[Byte]])
            : StreamObserver[Array[Byte]] =
          new StreamObserver[Array[Byte]] {
            private val t0 = System.nanoTime()
            private var closed = false // error already sent; swallow the rest
            override def onNext(req: Array[Byte]): Unit = if (!closed) try {
              val sink = store.getOrElse(throw Status.UNIMPLEMENTED
                .withDescription(s"$route: no online store bound")
                .asRuntimeException())
              val r = new R(req)
              var name = ""; var variant = ""
              var entity = ""; var value = ""; var tsMs = 0L
              var more = true
              while (more) r.readTag() match {
                case (0, _) => more = false
                case (1, _) => name = r.readString()
                case (2, _) => variant = r.readString()
                case (`entityField`, _) => entity = r.readString()
                case (`valueField`, _) => value = r.readString()
                case (5, _) => // Timestamp{seconds=1, nanos=2}
                  val t = r.readSlice()
                  var secs = 0L; var nanos = 0L
                  var tm = true
                  while (tm) t.readTag() match {
                    case (0, _) => tm = false
                    case (1, _) => secs = t.readVarint()
                    case (2, _) => nanos = t.readVarint()
                    case (_, wt) => t.skip(wt)
                  }
                  tsMs = secs * 1000L + nanos / 1000000L
                case (_, wt) => r.skip(wt)
              }
              if (name.isEmpty) invalid(s"$route: name required")
              val table = tablePrefix +
                (if (variant.isEmpty) name else s"$name/$variant")
              val entityKey: Any = entity.toLongOption.getOrElse(entity)
              val typedValue: Any = value.toLongOption
                .orElse(value.toDoubleOption).getOrElse(value)
              sink.upsertWithTs(table, entityKey, typedValue, tsMs)
            } catch {
              case e: Throwable =>
                closed = true
                metrics.observe(route, System.nanoTime() - t0, error = true)
                obs.onError(Backpressure.toStatus(e))
            }
            override def onError(t: Throwable): Unit = ()
            override def onCompleted(): Unit = if (!closed) {
              closed = true
              metrics.observe(route, System.nanoTime() - t0, error = false)
              obs.onNext(Empty); obs.onCompleted()
            }
          }
      })

  // -------------- Tasks service (featureform.scheduling.proto.Tasks) ----
  // The coordinator plane (scheduling.proto:18-33, served by
  // metadata.go:2026-2345) over the TaskRunner's durable attempt ledger:
  // a run's CURRENT state is its latest (runKey, attempt) record; status
  // updates and end times append new records (the ledger stays an
  // append-only log, exactly what the fencing guard protects); logs,
  // resume ids, and scheduler ids ride the durable run-log sidecar
  // (resume/scheduler under reserved `__` prefixes).

  private val ResumePrefix = "__resume__:"
  private val SchedulerPrefix = graft.sched.Scheduler.LogPrefix
  private val CronPrefix = graft.sched.Scheduler.CronLogPrefix
  private val OwnerPrefix = graft.sched.Scheduler.OwnerPrefix

  private def runner: graft.sched.TaskRunner =
    tasks.getOrElse(throw Status.UNIMPLEMENTED
      .withDescription("no task ledger bound").asRuntimeException())

  // Run-key minting: an AtomicLong seeded once past the largest
  // previously-minted `run-N` in the ledger — two concurrent CreateTaskRun
  // calls get DISTINCT keys (the old `run-${count}` raced to the same one)
  // and no create pays a full-ledger scan after the seed.
  private val runCounter = new java.util.concurrent.atomic.AtomicLong(-1L)
  private def mintRunKey(): String = {
    if (runCounter.get() < 0L) {
      val next = runner.latestRuns().iterator.map(_.runKey)
        .flatMap(k => if (k.startsWith("run-")) k.drop(4).toLongOption else None)
        .foldLeft(0L)((a, b) => math.max(a, b + 1))
      runCounter.compareAndSet(-1L, next)
    }
    s"run-${runCounter.getAndIncrement()}"
  }

  /** graft status strings → ResourceStatus.Status ints and back. */
  private def statusEnum(s: String): Int = s match {
    case "created" => 1
    case "pending" | "locked" => 2
    case "success" | "skipped" => 3 // READY
    case "failed" => 4
    case "running" => 5
    case "upstream_failed" | "cancelled" => 6
    case "deleting" => 7
    case _ => 0
  }
  private def statusString(e: Int): String = e match {
    case 1 => "created"
    case 2 => "pending"
    case 3 => "success"
    case 4 => "failed"
    case 5 => "running"
    case 6 => "cancelled"
    case 7 => "deleting"
    case _ => "no_status"
  }

  /** Latest record per (task, runKey) — the run's current state, served
    * from the runner's maintained index (no full-ledger regroup per RPC). */
  private def latestRuns(): Seq[graft.sched.TaskRun] = runner.latestRuns()

  private def currentRun(task: String, runKey: String): graft.sched.TaskRun =
    runner.latestRun(task, runKey)
      .getOrElse(notFound(s"run $runKey of task $task"))

  private def writeRunMeta(w: W, r: graft.sched.TaskRun): Unit = {
    val allLogs = runner.runLogs(r.task, r.runKey)
    w.msg(1)(_.str(1, r.runKey)) // runID
    w.msg(2)(_.str(1, r.task))   // taskID
    w.str(3, r.runKey)
    // trigger oneof: a cron-minted run (the daemon's SCHEDULE trigger)
    // carries ScheduleTrigger{name, schedule} with TriggerType SCHEDULE
    // (enum 0 — proto3 default, field 6 omitted); everything else is the
    // reference's OnApply + ON_APPLY (scheduling.proto:126-129)
    allLogs.filter(_.startsWith(CronPrefix)).lastOption match {
      case Some(cron) =>
        w.msg(5) { t =>
          t.str(1, r.runKey); t.str(2, cron.stripPrefix(CronPrefix))
        }
      case None =>
        w.msg(4)(_.str(1, r.runKey)) // trigger: OnApply{name}
        w.enum(6, 1)                 // TriggerType.ON_APPLY
    }
    w.msg(10)(_.int64(1, r.startMs / 1000L))
    if (r.endMs > 0) w.msg(11)(_.int64(1, r.endMs / 1000L))
    allLogs.filterNot(l => l.startsWith(ResumePrefix) ||
      l.startsWith(SchedulerPrefix) || l.startsWith(CronPrefix) ||
      l.startsWith(OwnerPrefix)) // claim-time breadcrumb, not a user log
      .foreach(w.str(12, _))
    w.msg(13) { st =>
      st.enum(1, statusEnum(r.status))
      r.error.foreach(st.str(2, _))
    }
    allLogs.filter(_.startsWith(ResumePrefix)).lastOption
      .foreach(l => w.msg(15)(_.str(1, l.stripPrefix(ResumePrefix))))
    allLogs.filter(_.startsWith(SchedulerPrefix)).lastOption
      .foreach(l => w.str(17, l.stripPrefix(SchedulerPrefix)))
  }

  /** TaskID{id=1} / RunID{id=1} / TaskRunID{runID=1, taskID=2}. */
  private def readIdMsg(r: R): String = {
    var id = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => id = r.readString()
      case (_, wt) => r.skip(wt)
    }
    id
  }
  private def readRunTaskIds(req: Array[Byte]): (String, String) = {
    val r = new R(req)
    var run = ""; var task = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (_, wt) => r.skip(wt)
    }
    (run, task)
  }

  private def createTaskRun(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var task = ""; var name = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => task = readIdMsg(r.readSlice())
      case (2, _) => name = r.readString()
      case (4, _) | (5, _) => r.readSlice() // trigger names are echoed back
      case (_, wt) => r.skip(wt)
    }
    if (task.isEmpty) invalid("taskID required")
    val runKey = if (name.nonEmpty) name else mintRunKey()
    val now = System.currentTimeMillis()
    runner.record(graft.sched.TaskRun(task, runKey, 0, "created", now, 0L, None))
    val w = new W
    w.str(1, runKey) // RunID{id}
    w.result()
  }

  /** SyncUnfinishedRuns — reconcile ledger state with EXECUTION reality
    * (the reference scheduler calls this every TaskStatusSyncInterval,
    * scheduler.go:66-72): orphaned `running` rows re-queue as `pending`.
    * Delegated to [[graft.sched.TaskRunner.syncUnfinishedRuns]], which
    * holds the run's claim lock across the re-check + re-queue (the old
    * probe-release-record shape raced a daemon claiming the run in the
    * window) — and which the scheduler daemon now also calls on its own
    * sync interval, so this RPC is a manual trigger, not the only healer. */
  private def syncUnfinishedRuns(req: Array[Byte]): Array[Byte] = {
    runner.syncUnfinishedRuns()
    Empty
  }

  private def getTaskById(req: Array[Byte]): Array[Byte] = {
    val task = readIdMsg(new R(req))
    val rs = latestRuns().filter(_.task == task)
    if (rs.isEmpty) notFound(s"task $task")
    val w = new W
    w.msg(1)(_.str(1, task))
    w.str(2, task)
    w.enum(3, 0) // RESOURCE_CREATION
    w.msg(7)(_.int64(1, rs.map(_.startMs).min / 1000L))
    w.result()
  }

  private def getRunMetadata(req: Array[Byte]): Array[Byte] = {
    val (run, task) = readRunTaskIds(req)
    val w = new W
    writeRunMeta(w, currentRun(task, run))
    w.result()
  }

  private def getLatestRun(req: Array[Byte]): Array[Byte] = {
    val task = readIdMsg(new R(req))
    val rs = latestRuns().filter(_.task == task)
    if (rs.isEmpty) notFound(s"task $task")
    val w = new W
    writeRunMeta(w, rs.maxBy(r => (r.runKey, r.startMs)))
    w.result()
  }

  private def setRunStatus(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var run = ""; var task = ""; var st = 0; var msg = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (3, _) =>
        val s = r.readSlice()
        var sm = true
        while (sm) s.readTag() match {
          case (0, _) => sm = false
          case (1, _) => st = s.readVarint().toInt
          case (2, _) => msg = s.readString()
          case (_, wt) => s.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    val cur = currentRun(task, run)
    // a wire CANCELLED is a kill request, not just a bookkeeping row: kill
    // any in-flight attempt (Spark job group + body thread) and latch the
    // request so the scheduler/runner never (re)starts this run
    if (statusString(st) == "cancelled") runner.cancel(task, run)
    // a RUNNING report stamps startMs = now: it marks when execution
    // actually began (the row previously inherited the CREATED row's
    // time, so the orphan-sync staleness guard measured run age instead
    // of report freshness and swept live >5min external runs); it also
    // makes periodic RUNNING re-reports a heartbeat that keeps a live
    // external run out of the automatic orphan sweep
    val startMs = if (statusString(st) == "running")
      System.currentTimeMillis() else cur.startMs
    // a RUNNING re-report over a run ALREADY running is a heartbeat, not
    // a state transition: record it at the SAME attempt (last-appended
    // wins on ties, so the index picks up the fresh startMs) instead of
    // attempt+1 — otherwise each heartbeat inflates the attempt counter
    // unboundedly between compactions, and attempt numbers stop meaning
    // real execution attempts. The `attempt >= 1` guard is load-bearing:
    // a RUNNING report over a crashed DAEMON's attempt-0 running marker
    // is an external executor ADOPTING the run, not a heartbeat — it
    // must land at attempt 1 or the restarted daemon's own-id fast
    //-resume (Scheduler.ownOrphan keys on attempt == 0) would claim and
    // execute the run concurrently with the live external executor.
    val heartbeat = statusString(st) == "running" &&
      cur.status == "running" && cur.attempt >= 1
    runner.record(cur.copy(
      attempt = if (heartbeat) cur.attempt else cur.attempt + 1,
      status = statusString(st), startMs = startMs,
      error = Some(msg).filter(_.nonEmpty)))
    Empty
  }

  private def setRunEndTime(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var run = ""; var task = ""; var endMs = 0L
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (3, _) =>
        val t = r.readSlice()
        var tm = true
        while (tm) t.readTag() match {
          case (0, _) => tm = false
          case (1, _) => endMs = t.readVarint() * 1000L
          case (2, _) => endMs += t.readVarint() / 1000000L
          case (_, wt) => t.skip(wt)
        }
      case (_, wt) => r.skip(wt)
    }
    val cur = currentRun(task, run)
    runner.record(cur.copy(attempt = cur.attempt + 1, endMs = endMs))
    Empty
  }

  private def addRunLog(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var run = ""; var task = ""; var log = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (3, _) => log = r.readString()
      case (_, wt) => r.skip(wt)
    }
    currentRun(task, run) // NOT_FOUND if unknown
    runner.addRunLog(task, run, log)
    Empty
  }

  private def setRunResumeId(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var run = ""; var task = ""; var resume = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (3, _) => resume = readIdMsg(r.readSlice())
      case (_, wt) => r.skip(wt)
    }
    currentRun(task, run)
    runner.addRunLog(task, run, ResumePrefix + resume)
    Empty
  }

  private def setRunSchedulerId(req: Array[Byte]): Array[Byte] = {
    val r = new R(req)
    var run = ""; var task = ""; var sched = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => run = readIdMsg(r.readSlice())
      case (2, _) => task = readIdMsg(r.readSlice())
      case (3, _) => sched = r.readString()
      case (_, wt) => r.skip(wt)
    }
    currentRun(task, run)
    runner.addRunLog(task, run, SchedulerPrefix + sched)
    Empty
  }

  /** WatchForCancel returns the run's CURRENT status (the reference
    * long-polls until a cancel lands; synchronous resolution means the
    * answer is immediately current — callers poll). */
  private def watchForCancel(req: Array[Byte]): Array[Byte] = {
    val (run, task) = readRunTaskIds(req)
    // LONG-POLL until the run reaches a terminal state (the executor's
    // "did my run get cancelled" watch; the reference's own server half
    // is an unimplemented infinite loop, taskmetadata.go:671-677 — this
    // one actually resolves), bounded so a watch on a stuck run cannot
    // pin a server thread forever. Each wait round reads the CACHED run
    // index (a file stat, lock-free when nothing foreign changed) and
    // blocks on the runner's change monitor — local appends wake watchers
    // immediately, and a fleet of watchers no longer re-takes the
    // cross-process __ledger__ lock every 50 ms against every append and
    // Tasks RPC sharing it. Concurrent watchers are capped: beyond the
    // cap the call degrades to an immediate status report (callers
    // re-poll), so watchers cannot pin the whole server thread pool.
    var cur = currentRun(task, run)
    if (TerminalStatuses.contains(cur.status)) ()
    else if (!watchSlots.tryAcquire()) ()
    else try {
      val deadline = System.currentTimeMillis() + WatchForCancelTimeoutMs
      while (!TerminalStatuses.contains(cur.status) &&
             System.currentTimeMillis() < deadline) {
        runner.awaitChange(50)
        cur = runner.latestRunCached(task, run).getOrElse(cur)
      }
    } finally watchSlots.release()
    val w = new W
    w.enum(1, statusEnum(cur.status))
    cur.error.foreach(w.str(2, _))
    w.result()
  }

  private val TerminalStatuses =
    Set("success", "skipped", "failed", "timeout", "cancelled", "upstream_failed")
  private val WatchForCancelTimeoutMs =
    sys.env.getOrElse("GRAFT_WATCH_CANCEL_TIMEOUT_MS", "60000").toLong
  private val watchSlots = new java.util.concurrent.Semaphore(
    sys.props.get("graft.watchCancelMax")
      .orElse(sys.env.get("GRAFT_WATCH_CANCEL_MAX")).getOrElse("32").toInt)

  private def runStream(route: String,
                        pick: () => Seq[graft.sched.TaskRun]) =
    ServerCalls.asyncServerStreamingCall(
      new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
        override def invoke(req: Array[Byte],
                            obs: StreamObserver[Array[Byte]]): Unit = {
          val t0 = System.nanoTime()
          try {
            val msgs = pick().iterator.map { r =>
              val w = new W; writeRunMeta(w, r); w.result()
            }
            Backpressure.drive(obs, msgs,
              err => metrics.observe(route, System.nanoTime() - t0,
                error = err.isDefined))
          } catch {
            case e: Throwable =>
              metrics.observe(route, System.nanoTime() - t0, error = true)
              obs.onError(Backpressure.toStatus(e))
          }
        }
      })

  private val Unfinished = Set("created", "pending", "running", "locked")

  private def tasksService: ServerServiceDefinition = {
    import org.sparkproject.connect.grpc.MethodDescriptor.MethodType._
    def m(rpc: String, mt: org.sparkproject.connect.grpc.MethodDescriptor.MethodType) =
      MetadataServe.method(MetadataServe.TasksServiceName, rpc, mt)
    ServerServiceDefinition.builder(MetadataServe.TasksServiceName)
      .addMethod(m("CreateTaskRun", UNARY), unary("CreateTaskRun", createTaskRun))
      .addMethod(m("SyncUnfinishedRuns", UNARY),
        unary("SyncUnfinishedRuns", syncUnfinishedRuns))
      .addMethod(m("GetTaskByID", UNARY), unary("GetTaskByID", getTaskById))
      .addMethod(m("GetRuns", SERVER_STREAMING),
        ServerCalls.asyncServerStreamingCall(
          new ServerCalls.ServerStreamingMethod[Array[Byte], Array[Byte]] {
            override def invoke(req: Array[Byte],
                                obs: StreamObserver[Array[Byte]]): Unit = {
              val t0 = System.nanoTime()
              try {
                val task = readIdMsg(new R(req))
                val msgs = latestRuns().filter(_.task == task).iterator
                  .map { r => val w = new W; writeRunMeta(w, r); w.result() }
                Backpressure.drive(obs, msgs,
                  err => metrics.observe("GetRuns", System.nanoTime() - t0,
                    error = err.isDefined))
              } catch {
                case e: Throwable =>
                  metrics.observe("GetRuns", System.nanoTime() - t0, error = true)
                  obs.onError(Backpressure.toStatus(e))
              }
            }
          }))
      .addMethod(m("GetRunMetadata", UNARY),
        unary("GetRunMetadata", getRunMetadata))
      .addMethod(m("GetAllRuns", SERVER_STREAMING),
        runStream("GetAllRuns", () => latestRuns()))
      .addMethod(m("GetUnfinishedRuns", SERVER_STREAMING),
        runStream("GetUnfinishedRuns",
          () => latestRuns().filter(r => Unfinished.contains(r.status))))
      .addMethod(m("GetLatestRun", UNARY), unary("GetLatestRun", getLatestRun))
      .addMethod(m("SetRunStatus", UNARY), unary("SetRunStatus", setRunStatus))
      .addMethod(m("SetRunResumeID", UNARY),
        unary("SetRunResumeID", setRunResumeId))
      .addMethod(m("AddRunLog", UNARY), unary("AddRunLog", addRunLog))
      .addMethod(m("SetRunEndTime", UNARY),
        unary("SetRunEndTime", setRunEndTime))
      .addMethod(m("WatchForCancel", UNARY),
        unary("WatchForCancel", watchForCancel))
      .addMethod(m("SetRunSchedulerID", UNARY),
        unary("SetRunSchedulerID", setRunSchedulerId))
      .build()
  }

  private def service(name: String): ServerServiceDefinition = {
    import org.sparkproject.connect.grpc.MethodDescriptor.MethodType._
    def m(rpc: String, mt: org.sparkproject.connect.grpc.MethodDescriptor.MethodType) =
      MetadataServe.method(name, rpc, mt)
    val b = ServerServiceDefinition.builder(name)
    // WriteFeatures / WriteLabels exist only on the Api service
    // (metadata.proto:116-117); StreamingLabelVariant swaps value(3) /
    // entity(4) relative to StreamingFeatureVariant's entity(3)/value(4)
    if (name == MetadataServe.ApiServiceName) {
      b.addMethod(m("WriteFeatures", CLIENT_STREAMING),
        writeStream("WriteFeatures", valueField = 4, entityField = 3, ""))
      b.addMethod(m("WriteLabels", CLIENT_STREAMING),
        writeStream("WriteLabels", valueField = 3, entityField = 4, "__label__"))
    }
    b
      .addMethod(m("CreateUser", UNARY), unary("CreateUser", createUser))
      .addMethod(m("CreateProvider", UNARY), unary("CreateProvider", createProvider))
      .addMethod(m("CreateSourceVariant", UNARY),
        unary("CreateSourceVariant", createSourceVariant))
      .addMethod(m("CreateEntity", UNARY), unary("CreateEntity", createEntity))
      .addMethod(m("CreateFeatureVariant", UNARY),
        unary("CreateFeatureVariant", createFeatureVariant))
      .addMethod(m("CreateLabelVariant", UNARY),
        unary("CreateLabelVariant", createLabelVariant))
      .addMethod(m("CreateTrainingSetVariant", UNARY),
        unary("CreateTrainingSetVariant", createTrainingSetVariant))
      .addMethod(m("CreateModel", UNARY), unary("CreateModel", createModel))
      .addMethod(m("RequestScheduleChange", UNARY),
        unary("RequestScheduleChange", requestScheduleChange))
      .addMethod(m("GetUsers", BIDI_STREAMING),
        bidiGet("GetUsers", r => userMsg(nameOf(r))))
      .addMethod(m("GetFeatures", BIDI_STREAMING),
        bidiGet("GetFeatures", r => featureParent(nameOf(r))))
      .addMethod(m("GetFeatureVariants", BIDI_STREAMING),
        bidiGet("GetFeatureVariants", r => featureVariantMsg(nvOf(r))))
      .addMethod(m("GetLabels", BIDI_STREAMING),
        bidiGet("GetLabels", r => labelParent(nameOf(r))))
      .addMethod(m("GetLabelVariants", BIDI_STREAMING),
        bidiGet("GetLabelVariants", r => labelVariantMsg(nvOf(r))))
      .addMethod(m("GetTrainingSets", BIDI_STREAMING),
        bidiGet("GetTrainingSets", r => tsetParent(nameOf(r))))
      .addMethod(m("GetTrainingSetVariants", BIDI_STREAMING),
        bidiGet("GetTrainingSetVariants", r => tsetVariantMsg(nvOf(r))))
      .addMethod(m("GetSources", BIDI_STREAMING),
        bidiGet("GetSources", r => sourceParent(nameOf(r))))
      .addMethod(m("GetSourceVariants", BIDI_STREAMING),
        bidiGet("GetSourceVariants", r => sourceVariantMsg(nvOf(r))))
      .addMethod(m("GetProviders", BIDI_STREAMING),
        bidiGet("GetProviders", r => providerMsg(nameOf(r))))
      .addMethod(m("GetEntities", BIDI_STREAMING),
        bidiGet("GetEntities", r => entityMsg(nameOf(r))))
      .addMethod(m("GetModels", BIDI_STREAMING),
        bidiGet("GetModels", r => modelMsg(nameOf(r))))
      .addMethod(m("MarkForDeletion", UNARY),
        unary("MarkForDeletion", markForDeletion))
      .addMethod(m("FinalizeDeletion", UNARY),
        unary("FinalizeDeletion", finalizeDeletion))
      .addMethod(m("GetStagedForDeletionResource", UNARY),
        unary("GetStagedForDeletionResource", getStagedForDeletionResource))
      .addMethod(m("PruneResource", UNARY), unary("PruneResource", pruneResource))
      .addMethod(m("GetEquivalent", UNARY), unary("GetEquivalent", getEquivalent))
      .addMethod(m("Run", UNARY), unary("Run", run))
      .addMethod(m("ListFeatures", SERVER_STREAMING),
        listStream("ListFeatures", "FEATURE"))
      .addMethod(m("ListLabels", SERVER_STREAMING),
        listStream("ListLabels", "LABEL"))
      .addMethod(m("ListTrainingSets", SERVER_STREAMING),
        listStream("ListTrainingSets", "TRAINING_SET"))
      .addMethod(m("ListSources", SERVER_STREAMING),
        listStream("ListSources", "SOURCE"))
      .addMethod(m("ListUsers", SERVER_STREAMING),
        listStream("ListUsers", "USER"))
      .addMethod(m("ListProviders", SERVER_STREAMING),
        listStream("ListProviders", "PROVIDER"))
      .addMethod(m("ListEntities", SERVER_STREAMING),
        listStream("ListEntities", "ENTITY"))
      .addMethod(m("ListModels", SERVER_STREAMING),
        listStream("ListModels", "MODEL"))
      .addMethod(m("SetResourceStatus", UNARY),
        unary("SetResourceStatus", setResourceStatus))
      .build()
  }

  private val server = {
    val b = NettyServerBuilder
      .forAddress(new java.net.InetSocketAddress("127.0.0.1", port))
      .addService(service(MetadataServe.ServiceName))
      .addService(service(MetadataServe.ApiServiceName))
    // the reference metadata server hosts the scheduler's Tasks service in
    // the same process (metadata.go:2026-2345) — same here when a ledger
    // is bound
    tasks.foreach(_ => b.addService(tasksService))
    // standard health probes (grpc.health.v1) for load balancers
    b.addService(HealthServe.service(
      Set(MetadataServe.ServiceName, MetadataServe.ApiServiceName) ++
        tasks.map(_ => MetadataServe.TasksServiceName)))
    b.build()
  }

  def start(): MetadataServe = { server.start(); this }
  def boundPort: Int = server.getPort
  def stop(): Unit = server.shutdownNow()
}

object MetadataServe {
  val ServiceName = "featureform.serving.metadata.proto.Metadata"
  val ApiServiceName = "featureform.serving.metadata.proto.Api"
  val TasksServiceName = "featureform.scheduling.proto.Tasks"

  /** Status enum ints — metadata.proto ResourceStatus.Status. */
  val StCreated = 1
  val StReady = 3
  val StFailed = 4
  val StDeleting = 7

  val Empty: Array[Byte] = Array.emptyByteArray

  private val identityFn: Seq[DataFrame] => DataFrame = _.head

  private val BytesMarshaller =
    new org.sparkproject.connect.grpc.MethodDescriptor.Marshaller[Array[Byte]] {
      override def stream(value: Array[Byte]): java.io.InputStream =
        new java.io.ByteArrayInputStream(value)
      override def parse(stream: java.io.InputStream): Array[Byte] =
        stream.readAllBytes()
    }

  def method(service: String, name: String,
             mt: org.sparkproject.connect.grpc.MethodDescriptor.MethodType)
      : org.sparkproject.connect.grpc.MethodDescriptor[Array[Byte], Array[Byte]] =
    org.sparkproject.connect.grpc.MethodDescriptor
      .newBuilder(BytesMarshaller, BytesMarshaller)
      .setType(mt)
      .setFullMethodName(org.sparkproject.connect.grpc.MethodDescriptor
        .generateFullMethodName(service, name))
      .build()

  /** NameVariant{name=1, variant=2} → ResourceId. */
  def readNV(r: R): ResourceId = {
    var name = ""; var variant = ""
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => name = r.readString()
      case (2, _) => variant = r.readString()
      case (_, wt) => r.skip(wt)
    }
    ResourceId(name, variant)
  }

  def writeNV(w: W, id: ResourceId): Unit = {
    w.str(1, id.name); w.str(2, id.variant)
  }

  /** ResourceID{resource=1 NameVariant, resource_type=2 enum} → catalog
    * ResourceKey. Variant types (metadata.proto:161-174): FEATURE_VARIANT
    * 4, LABEL_VARIANT 5, TRAINING_SET_VARIANT 6, SOURCE_VARIANT 7 key
    * name.variant; parents/singletons key the bare name. */
  def readResourceId(r: R): ResourceKey = {
    var nv = ResourceId("", "")
    var rt = 0
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => nv = readNV(r.readSlice())
      case (2, _) => rt = r.readVarint().toInt
      case (_, wt) => r.skip(wt)
    }
    rt match {
      case 0 | 4 => ResourceKey("FEATURE", nv.toString)
      case 1 | 5 => ResourceKey("LABEL", nv.toString)
      case 2 | 6 => ResourceKey("TRAINING_SET", nv.toString)
      case 3 | 7 => ResourceKey("SOURCE", nv.toString)
      case 8 => ResourceKey("PROVIDER", nv.name)
      case 9 => ResourceKey("ENTITY", nv.name)
      case 10 => ResourceKey("MODEL", nv.name)
      case 11 => ResourceKey("USER", nv.name)
      case other => ResourceKey(s"UNKNOWN_$other", nv.toString)
    }
  }

  /** First LEN-delimited field `field` of a message, as a sub-reader. */
  def firstSlice(req: Array[Byte], field: Int): Option[R] = {
    val r = new R(req)
    var out: Option[R] = None
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (`field`, ProtoWire.WtLen) if out.isEmpty => out = Some(r.readSlice())
      case (_, wt) => r.skip(wt)
    }
    out
  }

  /** Tags{tag=1 repeated string}. */
  def readTags(r: R): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) => out += r.readString()
      case (_, wt) => r.skip(wt)
    }
    out.toSeq
  }

  /** Properties{property=1 map<string, Property{string_value=1}>}. */
  def readProps(r: R): Seq[(String, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var more = true
    while (more) r.readTag() match {
      case (0, _) => more = false
      case (1, _) =>
        val e = r.readSlice()
        var k = ""; var v = ""
        var em = true
        while (em) e.readTag() match {
          case (0, _) => em = false
          case (1, _) => k = e.readString()
          case (2, _) =>
            val p = e.readSlice()
            var pm = true
            while (pm) p.readTag() match {
              case (0, _) => pm = false
              case (1, _) => v = p.readString()
              case (_, wt) => p.skip(wt)
            }
          case (_, wt) => e.skip(wt)
        }
        out += (k -> v)
      case (_, wt) => r.skip(wt)
    }
    out.toSeq
  }

  def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)
  def unb64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)
}
