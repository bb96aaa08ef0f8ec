package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.types.ResourceSchema

class CatalogPersistSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_cat_spec").toString

  test("catalog persists every resource kind and resolves after reload") {
    val dir = freshDir()
    val cat = new Catalog(spark)
    cat.registerEntity(EntityDef("user"))
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$sf001/orders.parquet"), Some(HashPartition("o_custkey", 8)),
      isIncremental = true))
    cat.registerSource(SourceVariant(ResourceId("big_orders"), SqlTransformation(
      "SELECT o_custkey, o_totalprice FROM {{orders}} WHERE o_totalprice > 100000")))
    val double: Seq[DataFrame] => DataFrame =
      { case Seq(df) => df.withColumn("o_totalprice", col("o_totalprice") * 2) }
    cat.registerSource(SourceVariant(ResourceId("doubled"),
      DfTransformation(Seq(ResourceId("big_orders")), double, Some("double_price"))))
    cat.registerFeature(FeatureVariant(ResourceId("f_rev"), ResourceId("orders"),
      ResourceSchema("o_custkey", "o_totalprice", Some("o_orderdate")), "user"))
    cat.registerLabel(LabelVariant(ResourceId("lbl"), ResourceId("orders"),
      Seq(EntityMapping("user", "o_custkey")), "o_totalprice", Some("o_orderdate")))
    cat.registerTrainingSet(TrainingSetVariant(ResourceId("ts1"), ResourceId("lbl"),
      Seq(ResourceId("f_rev")),
      Seq(FeatureLag(ResourceId("f_rev"), "f_rev_1d", 86400L))))
    cat.registerOnDemand(OnDemandVariant(ResourceId("od"), "o_totalprice * 0.5"))
    CatalogStore.save(cat, spark, dir)

    val back = CatalogStore.load(spark, dir,
      dfFns = Map("double_price" -> double))
    assert(back.source(ResourceId("orders")) == cat.source(ResourceId("orders")))
    assert(back.source(ResourceId("big_orders")) == cat.source(ResourceId("big_orders")))
    assert(back.feature(ResourceId("f_rev")) == cat.feature(ResourceId("f_rev")))
    assert(back.label(ResourceId("lbl")) == cat.label(ResourceId("lbl")))
    assert(back.trainingSet(ResourceId("ts1")) == cat.trainingSet(ResourceId("ts1")))
    assert(back.onDemand(ResourceId("od")) == cat.onDemand(ResourceId("od")))
    // resolution works through the reloaded DAG (incl. the rebound df fn)
    val a = cat.resolve(ResourceId("doubled")).orderBy("o_custkey", "o_totalprice").collect()
    val b = back.resolve(ResourceId("doubled")).orderBy("o_custkey", "o_totalprice").collect()
    assert(a.sameElements(b) && a.nonEmpty)
  }

  test("re-registering an equal definition is a no-op; conflicting throws") {
    val dir = freshDir()
    val cat = new Catalog(spark)
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$sf001/orders.parquet")))
    CatalogStore.save(cat, spark, dir)
    val back = CatalogStore.load(spark, dir)
    back.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$sf001/orders.parquet"))) // equal → fine
    intercept[IllegalArgumentException] {
      back.registerSource(SourceVariant(ResourceId("orders"),
        PrimaryData("/elsewhere.parquet")))
    }
  }

  test("unnamed DfTransformation refuses to persist") {
    val dir = freshDir()
    val cat = new Catalog(spark)
    cat.registerSource(SourceVariant(ResourceId("x"),
      DfTransformation(Nil, _ => spark.range(1).toDF())))
    intercept[IllegalStateException] { CatalogStore.save(cat, spark, dir) }
  }
}
