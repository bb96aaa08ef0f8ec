package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isotonic regression (pool-adjacent-violators) per key — the standard
  * score-calibration step (map raw classifier scores to monotone
  * probabilities) after [[graft.functions.Classifier]] training.
  *
  * Input is pre-binned: one row per (key, x) with the bin's y-sum and
  * count as exact integers. PAV runs as a stack fold over each key's bins
  * in x order — [[graft.functions.Pack.packGreedy]]'s sorted-mapPartitions
  * shape: one shuffle on key, O(bins) state, inherently sequential per key
  * and parallel across keys. Violation checks compare pool means by
  * integer cross-multiplication (`s1·n2 > s2·n1`), never floats, so the
  * fold is exact; only the EMITTED fit is a double (`round(s/n, 9)`).
  *
  * Oracle bridge: PAV's fit equals the minimax formula
  * `fit_i = max_{j≤i} min_{k≥i} mean(y[j..k])` (Barlow et al. 1972),
  * which DuckDB evaluates directly over prefix sums — same integers, same
  * final division, no fold replay needed. */
object Isotonic {

  /** `(key, x, n, fit)` — nondecreasing-in-x fitted mean per key.
    * `ySumCol`/`nCol` must be integral. */
  def pavFit(bins: DataFrame, keyCol: String, xCol: String,
             ySumCol: String, nCol: String): DataFrame = {
    val base = bins.select(col(keyCol).cast("long").as("key"),
        col(xCol).cast("long").as("x"), col(ySumCol).cast("long").as("__s"),
        col(nCol).cast("long").as("__n"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("x"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("x", LongType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("fit", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        private var out: Iterator[Row] = Iterator.empty
        def hasNext: Boolean = out.hasNext || it.hasNext
        def next(): Row = {
          if (!out.hasNext) {
            val k = it.head.getLong(0)
            // pools: (members (x, ownN), pooled sum, pooled cnt)
            val stack = scala.collection.mutable.ArrayBuffer
              .empty[(List[(Long, Long)], Long, Long)]
            while (it.hasNext && it.head.getLong(0) == k) {
              val r = it.next()
              var cur = (List((r.getLong(1), r.getLong(3))),
                r.getLong(2), r.getLong(3))
              // merge while the new pool's mean is BELOW the previous
              // pool's (violates nondecreasing): s_prev/n_prev > s_cur/n_cur
              while (stack.nonEmpty &&
                stack.last._2 * cur._3 > cur._2 * stack.last._3) {
                val p = stack.remove(stack.size - 1)
                cur = (p._1 ::: cur._1, p._2 + cur._2, p._3 + cur._3)
              }
              stack += cur
            }
            out = stack.iterator.flatMap { case (xs, s, n) =>
              // round via the decimal string repr (valueOf), Spark's own
              // double-round path — ≡ DuckDB round(CAST(s AS DOUBLE)/n, 9)
              val fit = BigDecimal(java.math.BigDecimal.valueOf(s.toDouble / n))
                .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
              xs.map { case (x, ownN) => Row(k, x, ownN, fit) }
            }
          }
          out.next()
        }
      }
    }(enc)
  }
}
