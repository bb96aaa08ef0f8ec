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
}
