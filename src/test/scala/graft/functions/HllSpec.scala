package graft.functions

import graft.SparkSpec
import graft.functions.expressions.Sketches
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate tracks exact NDV within the p=10 error bound") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val rows = docs.groupBy("source")
      .agg(countDistinct(col("text")).as("exact"),
        Sketches.hllNdv(col("text")).as("hll"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    rows.foreach { case (exact, hll) =>
      // 3.2% standard error at m=1024; generous 5-sigma-ish bound plus
      // small-count slack
      assert(math.abs(hll - exact) <= math.max(5, 0.2 * exact),
        s"exact=$exact hll=$hll")
    }
  }

  test("duplicates never move the estimate (register max is idempotent)") {
    val once = (1 to 300).map(i => s"val$i").toDF("s")
    val thrice = (once.union(once).union(once))
    val a = once.agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    val b = thrice.agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    assert(a == b)
  }

  test("partition layout cannot change the result (merge = elementwise max)") {
    val df = (1 to 2000).map(i => s"doc$i").toDF("s")
    val r1 = df.repartition(1).agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    val r13 = df.repartition(13).agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    assert(r1 == r13)
  }

  test("nulls are skipped; empty input estimates zero") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("s")
    assert(df.agg(Sketches.hllNdv(col("s"))).head.getLong(0) == 2L)
    val empty = Seq.empty[String].toDF("s")
    assert(empty.agg(Sketches.hllNdv(col("s"))).head.getLong(0) == 0L)
  }

  test("union of persisted sketches == direct estimate over the union") {
    val a = (1 to 800).map(i => ("a", s"v$i")).toDF("g", "s")
    val b = (400 to 1200).map(i => ("b", s"v$i")).toDF("g", "s")
    val sk = a.union(b).groupBy("g")
      .agg(Sketches.hllSketch(col("s")).as("sk"))
    val pair = sk.groupBy()
      .agg(min(when(col("g") === "a", col("sk"))).as("ska"),
        max(when(col("g") === "b", col("sk"))).as("skb"))
      .select(Sketches.hllUnionEst(col("ska"), col("skb")).as("u"))
      .head.getLong(0)
    val direct = a.union(b)
      .agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    assert(pair === direct) // identical registers -> identical estimate
  }

  test("union with an all-zero sketch is the identity (missing batch)") {
    val a = (1 to 700).map(i => s"v$i").toDF("s")
    val direct = a.agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    val viaZero = a.agg(Sketches.hllSketch(col("s")).as("sk"))
      .select(Sketches.hllUnionEst(col("sk"),
        lit(new Array[Byte](1024)))).head.getLong(0)
    assert(viaZero === direct)
  }

  test("inclusion-exclusion intersection estimate tracks the true overlap") {
    val a = (1 to 1000).map(i => s"v$i").toDF("s")
    val b = (501 to 1500).map(i => s"v$i").toDF("s")
    val ea = a.agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    val eb = b.agg(Sketches.hllNdv(col("s"))).head.getLong(0)
    val ska = a.agg(Sketches.hllSketch(col("s")).as("sk"))
    val skb = b.agg(Sketches.hllSketch(col("s")).as("sk"))
    val u = ska.crossJoin(skb.withColumnRenamed("sk", "sk2"))
      .select(Sketches.hllUnionEst(col("sk"), col("sk2")))
      .head.getLong(0)
    val inter = ea + eb - u // true overlap = 500
    assert(math.abs(inter - 500) <= 150, s"inter_est=$inter")
  }
}
