package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-event join: for every left row, the single right row with the
  * same key whose timestamp is CLOSEST in either direction (as-of is the
  * backward-only special case — reference tsquery.go:385-405; this is the
  * bidirectional generalization used for sensor alignment and
  * label-to-reading matching).
  *
  * Tie rule: equal distance prefers the EARLIER (backward) right row; a
  * right row at exactly the left timestamp is backward with distance 0.
  *
  * 100 TB design: the same union-window trick as the as-of family — both
  * sides union into one frame partitioned by key, one sort per key, two
  * running `last`/`first` scans (backward + forward candidate), O(1) state
  * per row. No join, no per-left-row range scan; shards linearly by key.
  */
object NearestJoin {

  /** `left`/`right`: frames with (keyCol, tsCol, ...). Returns one row per
    * left row: left columns + `near_ts`, `near_value`, `near_dir`
    * ('b'/'f', NULL if the key has no right rows). `rightValCol` is the
    * right-side payload carried through. */
  def nearest(left: DataFrame, right: DataFrame, keyCol: String,
              tsCol: String, leftIdCol: String, leftValCol: String,
              rightValCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      col(leftIdCol).as("__lid"), col(leftValCol).as("__lval"),
      lit(1).as("__isL"), lit(null).cast("double").as("__rval"))
    // right rows tagged; at equal ts the right row sorts BEFORE the left
    // row (__isL 0 < 1) so a distance-0 right row is visible backward
    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(null).cast("long").as("__lid"), lit(null).cast("double").as("__lval"),
      lit(0).as("__isL"), col(rightValCol).as("__rval"))
    val u = l.unionAll(r)
    val ord = Seq(col("__ts"), col("__isL"), col("__rval"))
    val wBack = Window.partitionBy(col("__k")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // descending scan: the running `last` is the nearest FUTURE right row;
    // __rval ASC here so both directions tie-break to the MAX right value
    val wFwd = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").desc, col("__isL").desc, col("__rval").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rStruct = when(col("__isL") === 0,
      struct(col("__ts").as("ts"), col("__rval").as("v")))
    val scanned = u
      // backward tie-break: among right rows at the same ts, `last` picks
      // the max __rval (ordering puts larger __rval later)
      .withColumn("__b", last(rStruct, ignoreNulls = true).over(wBack))
      .withColumn("__f", last(rStruct, ignoreNulls = true).over(wFwd))
      .filter(col("__isL") === 1)
    scanned.select(
      col("__k").as("key"), col("__lid").as("left_id"),
      col("__ts").as("ts"), col("__lval").as("left_value"),
      when(col("__b").isNull && col("__f").isNull, lit(null).cast("timestamp"))
        .when(col("__f").isNull, col("__b.ts"))
        .when(col("__b").isNull, col("__f.ts"))
        .when(unix_micros(col("__ts")) - unix_micros(col("__b.ts"))
          <= unix_micros(col("__f.ts")) - unix_micros(col("__ts")),
          col("__b.ts"))
        .otherwise(col("__f.ts")).as("near_ts"),
      when(col("__b").isNull && col("__f").isNull, lit(null).cast("double"))
        .when(col("__f").isNull, col("__b.v"))
        .when(col("__b").isNull, col("__f.v"))
        .when(unix_micros(col("__ts")) - unix_micros(col("__b.ts"))
          <= unix_micros(col("__f.ts")) - unix_micros(col("__ts")),
          col("__b.v"))
        .otherwise(col("__f.v")).as("near_value"),
      when(col("__b").isNull && col("__f").isNull, lit(null).cast("string"))
        .when(col("__f").isNull, lit("b"))
        .when(col("__b").isNull, lit("f"))
        .when(unix_micros(col("__ts")) - unix_micros(col("__b.ts"))
          <= unix_micros(col("__f.ts")) - unix_micros(col("__ts")),
          lit("b"))
        .otherwise(lit("f")).as("near_dir"))
  }
}
