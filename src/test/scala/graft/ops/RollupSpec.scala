package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental additive rollup: merge-of-partials must equal recompute
  * regardless of how history is sliced into batches. */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def norm(df: DataFrame) =
    df.orderBy("entity").collect().toSeq

  test("fold of arbitrary batch slices equals the from-scratch rollup") {
    val rows = (1 to 300).map(i =>
      ((i % 17).toLong, (i % 23) * 1.5 - 7.0)).toDF("entity", "value")
    val full = norm(Materialize.rollupOf(rows))
    for (cuts <- Seq(Seq(100, 200), Seq(1), Seq(37, 38, 250))) {
      val bounds = (0 +: cuts) :+ 300
      val batches = bounds.sliding(2).map { case Seq(lo, hi) =>
        (1 to 300).slice(lo, hi).map(i =>
          ((i % 17).toLong, (i % 23) * 1.5 - 7.0)).toDF("entity", "value")
      }.toSeq
      val folded = batches.tail.foldLeft(Materialize.rollupOf(batches.head))(
        Materialize.rollupIncrement)
      assert(norm(folded) == full, s"cuts $cuts")
    }
  }

  test("an entity appearing only in a later batch joins the state") {
    val b1 = Seq((1L, 2.0)).toDF("entity", "value")
    val b2 = Seq((2L, 5.0), (1L, 3.0)).toDF("entity", "value")
    val st = Materialize.rollupIncrement(Materialize.rollupOf(b1), b2)
    val m = st.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(m(1L) == ((2L, 5.0)))
    assert(m(2L) == ((1L, 5.0)))
  }
}
