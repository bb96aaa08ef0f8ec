package graft.catalog

import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.types.ResourceSchema

/** Durable resource registry — the reference's metadata server state
  * (metadata/metadata.go ~4.1k LoC over etcd/psql; proto
  * metadata.proto:244-247 GetEquivalent, 500-525 SourceVariant) collapsed to
  * one JSON document per catalog, written atomically (tmp + rename) into a
  * metadata directory. A restarted process calls [[CatalogStore.load]] and
  * gets every registration back; re-registering an identical definition is a
  * no-op, a conflicting one throws (Catalog.put's equivalence check).
  *
  * Jackson (on Spark's own classpath) handles the encoding; the tree is plain
  * maps/lists so the format is engine-neutral and diffable. DataFrame
  * transformations persist by `fnName` and are rebound from a caller-supplied
  * function registry on load — a JVM closure itself cannot survive a restart
  * (the same gap the reference papers over with dill pickling; a name + a
  * registry is the honest durable form).
  */
object CatalogStore {

  private val mapper = new ObjectMapper()

  private def j(m: (String, Any)*): java.util.LinkedHashMap[String, Any] = {
    val out = new java.util.LinkedHashMap[String, Any]()
    m.foreach { case (k, v) => if (v != null) out.put(k, v) }
    out
  }
  private def jl(xs: Seq[Any]): java.util.List[Any] = xs.asJava

  private def idMap(id: ResourceId) = j("name" -> id.name, "variant" -> id.variant)
  private def idOf(m: java.util.Map[String, Any]) =
    ResourceId(m.get("name").toString, m.get("variant").toString)

  private def partitionMap(p: PartitionHint): java.util.Map[String, Any] = p match {
    case HashPartition(c, b) => j("kind" -> "hash", "column" -> c, "buckets" -> b)
    case DailyPartition(c)   => j("kind" -> "daily", "column" -> c)
  }

  private def sourceMap(s: SourceVariant): java.util.Map[String, Any] = {
    val defn = s.definition match {
      case PrimaryData(path, format, tsCol, header) =>
        j("kind" -> "primary", "path" -> path, "format" -> format,
          "timestampColumn" -> tsCol.orNull, "csvHeader" -> header)
      case SqlTransformation(q) => j("kind" -> "sql", "query" -> q)
      case DfTransformation(inputs, _, Some(fnName)) =>
        j("kind" -> "df", "fnName" -> fnName, "inputs" -> jl(inputs.map(idMap)))
      case DfTransformation(_, _, None) =>
        throw new IllegalStateException(
          s"source ${s.id}: DfTransformation without fnName is not durable — " +
            "give it a name and register the function in the load-time registry")
    }
    j("id" -> idMap(s.id), "definition" -> defn,
      "partition" -> s.partition.map(partitionMap).orNull,
      "isIncremental" -> s.isIncremental)
  }

  // Cross-process exclusion for the catalog document (the ffsync.Locker
  // role the metadata server gets from etcd/psql): save's delete→rename
  // pair leaves a no-file window a concurrent load could observe, and two
  // concurrent savers would silently drop one side's registrations.
  // Local dirs get a FileLocker beside the document; non-local stores
  // should bring their own coordination (same policy as TaskRunner).
  private def lockerFor(dir: String): graft.sched.Locker =
    graft.sched.Locker.forDir(dir)

  // Fencing at the document itself (same protocol as the TaskRunner
  // ledger): a save whose "catalog" lease was broken while it stalled is
  // rejected with StaleFenceException rather than overwriting the new
  // holder's registrations. Unfenced lockers (File/Memory) pass through.
  def save(cat: Catalog, spark: SparkSession, dir: String): Unit =
    save(cat, spark, dir, lockerFor(dir))

  private[graft] def save(cat: Catalog, spark: SparkSession, dir: String,
                          locker: graft.sched.Locker): Unit =
    locker.withLockFenced("catalog") { tok =>
      new graft.sched.FenceGuard(dir,
        spark.sparkContext.hadoopConfiguration, "catalog").check(tok)
      saveLocked(cat, spark, dir)
    }

  private def saveLocked(cat: Catalog, spark: SparkSession, dir: String): Unit = {
    val root = j(
      "entities" -> jl(cat.allEntities.map(e => j("name" -> e.name))),
      "sources" -> jl(cat.allSources.map(sourceMap)),
      "features" -> jl(cat.allFeatures.map(f =>
        j("id" -> idMap(f.id), "source" -> idMap(f.source), "entity" -> f.entity,
          "schemaEntity" -> f.schema.entity, "schemaValue" -> f.schema.value,
          "schemaTs" -> f.schema.ts.orNull))),
      "labels" -> jl(cat.allLabels.map(l =>
        j("id" -> idMap(l.id), "source" -> idMap(l.source),
          "mappings" -> jl(l.mappings.map(m =>
            j("entityName" -> m.entityName, "column" -> m.column))),
          "valueColumn" -> l.valueColumn,
          "timestampColumn" -> l.timestampColumn.orNull))),
      "trainingSets" -> jl(cat.allTrainingSets.map(t =>
        j("id" -> idMap(t.id), "label" -> idMap(t.label),
          "features" -> jl(t.features.map(idMap)),
          "lags" -> jl(t.lags.map(g => j("feature" -> idMap(g.feature),
            "name" -> g.name, "lagSeconds" -> g.lagSeconds)))))),
      "onDemand" -> jl(cat.allOnDemands.map(o =>
        j("id" -> idMap(o.id), "expr" -> o.expr))),
      "providers" -> jl(cat.allProviders.map(p =>
        j("name" -> p.name, "providerType" -> p.providerType,
          "description" -> p.description))),
      "users" -> jl(cat.allUsers.map(u => j("name" -> u.name))),
      "models" -> jl(cat.allModels.map(m =>
        j("name" -> m.name, "features" -> jl(m.features.map(idMap)),
          "trainingSets" -> jl(m.trainingSets.map(idMap))))),
      "tags" -> jl(cat.allTags.map { case (k, ts) =>
        j("kind" -> k.kind, "id" -> k.id, "tags" -> jl(ts)) }),
      "properties" -> jl(cat.allProperties.map { case (k, ps) =>
        val pm = new java.util.LinkedHashMap[String, Any]()
        ps.foreach { case (a, b) => pm.put(a, b) }
        j("kind" -> k.kind, "id" -> k.id, "props" -> pm) }),
      "statuses" -> jl(cat.allStatuses.map { case (k, (st, msg)) =>
        j("kind" -> k.kind, "id" -> k.id, "status" -> st, "message" -> msg) }),
      // the mark half of the two-phase deletion survives a restart: a
      // staged-but-unfinalized resource must come back staged, not live
      "staged" -> jl(cat.allStaged.map(k => j("kind" -> k.kind, "id" -> k.id))))
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val tmp = new Path(s"$dir/.catalog.json.tmp")
    val dst = new Path(s"$dir/catalog.json")
    val os = fs.create(tmp, true)
    os.write(bytes); os.close()
    fs.delete(dst, false)
    fs.rename(tmp, dst)
  }

  def load(spark: SparkSession, dir: String,
           dfFns: Map[String, Seq[DataFrame] => DataFrame] = Map.empty): Catalog =
    lockerFor(dir).withLock("catalog")(loadLocked(spark, dir, dfFns))

  private def loadLocked(spark: SparkSession, dir: String,
           dfFns: Map[String, Seq[DataFrame] => DataFrame]): Catalog = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(s"$dir/catalog.json"))
    val root =
      try mapper.readValue(in: java.io.InputStream,
        classOf[java.util.Map[String, Any]])
      finally in.close()
    val cat = new Catalog(spark)

    def seqOf(key: String): Seq[java.util.Map[String, Any]] =
      Option(root.get(key)).map(_.asInstanceOf[java.util.List[Any]].asScala.toSeq)
        .getOrElse(Nil).map(_.asInstanceOf[java.util.Map[String, Any]])
    def str(m: java.util.Map[String, Any], k: String): Option[String] =
      Option(m.get(k)).map(_.toString)

    seqOf("entities").foreach(e => cat.registerEntity(EntityDef(e.get("name").toString)))
    seqOf("sources").foreach { s =>
      val d = s.get("definition").asInstanceOf[java.util.Map[String, Any]]
      val defn: SourceDef = d.get("kind").toString match {
        case "primary" => PrimaryData(d.get("path").toString, d.get("format").toString,
          str(d, "timestampColumn"), d.get("csvHeader").asInstanceOf[Boolean])
        case "sql" => SqlTransformation(d.get("query").toString)
        case "df" =>
          val name = d.get("fnName").toString
          val inputs = d.get("inputs").asInstanceOf[java.util.List[Any]].asScala.toSeq
            .map(x => idOf(x.asInstanceOf[java.util.Map[String, Any]]))
          val fn = dfFns.getOrElse(name, throw new NoSuchElementException(
            s"df transformation '$name' not in the load-time function registry"))
          DfTransformation(inputs, fn, Some(name))
      }
      val part = Option(s.get("partition"))
        .map(_.asInstanceOf[java.util.Map[String, Any]]).map { p =>
          p.get("kind").toString match {
            case "hash" => HashPartition(p.get("column").toString,
              p.get("buckets").asInstanceOf[Number].intValue())
            case "daily" => DailyPartition(p.get("column").toString)
          }
        }
      cat.registerSource(SourceVariant(
        idOf(s.get("id").asInstanceOf[java.util.Map[String, Any]]), defn, part,
        s.get("isIncremental").asInstanceOf[Boolean]))
    }
    seqOf("features").foreach { f =>
      cat.registerFeature(FeatureVariant(
        idOf(f.get("id").asInstanceOf[java.util.Map[String, Any]]),
        idOf(f.get("source").asInstanceOf[java.util.Map[String, Any]]),
        ResourceSchema(f.get("schemaEntity").toString, f.get("schemaValue").toString,
          str(f, "schemaTs")),
        f.get("entity").toString))
    }
    seqOf("labels").foreach { l =>
      cat.registerLabel(LabelVariant(
        idOf(l.get("id").asInstanceOf[java.util.Map[String, Any]]),
        idOf(l.get("source").asInstanceOf[java.util.Map[String, Any]]),
        l.get("mappings").asInstanceOf[java.util.List[Any]].asScala.toSeq.map { x =>
          val m = x.asInstanceOf[java.util.Map[String, Any]]
          EntityMapping(m.get("entityName").toString, m.get("column").toString)
        },
        l.get("valueColumn").toString, str(l, "timestampColumn")))
    }
    seqOf("trainingSets").foreach { t =>
      cat.registerTrainingSet(TrainingSetVariant(
        idOf(t.get("id").asInstanceOf[java.util.Map[String, Any]]),
        idOf(t.get("label").asInstanceOf[java.util.Map[String, Any]]),
        t.get("features").asInstanceOf[java.util.List[Any]].asScala.toSeq
          .map(x => idOf(x.asInstanceOf[java.util.Map[String, Any]])),
        t.get("lags").asInstanceOf[java.util.List[Any]].asScala.toSeq.map { x =>
          val g = x.asInstanceOf[java.util.Map[String, Any]]
          FeatureLag(idOf(g.get("feature").asInstanceOf[java.util.Map[String, Any]]),
            g.get("name").toString, g.get("lagSeconds").asInstanceOf[Number].longValue())
        }))
    }
    seqOf("onDemand").foreach { o =>
      cat.registerOnDemand(OnDemandVariant(
        idOf(o.get("id").asInstanceOf[java.util.Map[String, Any]]),
        o.get("expr").toString))
    }
    seqOf("providers").foreach(p => cat.registerProvider(ProviderDef(
      p.get("name").toString, p.get("providerType").toString,
      str(p, "description").getOrElse(""))))
    seqOf("users").foreach(u => cat.registerUser(UserDef(u.get("name").toString)))
    seqOf("models").foreach { m =>
      def ids(k: String) = m.get(k).asInstanceOf[java.util.List[Any]].asScala.toSeq
        .map(x => idOf(x.asInstanceOf[java.util.Map[String, Any]]))
      cat.registerModel(ModelDef(m.get("name").toString,
        ids("features"), ids("trainingSets")))
    }
    seqOf("tags").foreach { t =>
      cat.addTags(ResourceKey(t.get("kind").toString, t.get("id").toString),
        t.get("tags").asInstanceOf[java.util.List[Any]].asScala.toSeq.map(_.toString))
    }
    seqOf("properties").foreach { t =>
      cat.setProperties(ResourceKey(t.get("kind").toString, t.get("id").toString),
        t.get("props").asInstanceOf[java.util.Map[String, Any]].asScala
          .map { case (k, v) => k -> v.toString }.toMap)
    }
    seqOf("statuses").foreach { s =>
      cat.setStatus(ResourceKey(s.get("kind").toString, s.get("id").toString),
        s.get("status").asInstanceOf[Number].intValue(),
        Option(s.get("message")).map(_.toString).getOrElse(""))
    }
    seqOf("staged").foreach(s =>
      cat.restoreStaged(ResourceKey(s.get("kind").toString, s.get("id").toString)))
    cat
  }
}
