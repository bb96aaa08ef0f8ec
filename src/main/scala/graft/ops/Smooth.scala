package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exponentially-weighted moving averages per key — the inherently
  * sequential per-entity smoother (feature freshness decay, rate
  * estimation), computed the same way [[graft.functions.Pack.packGreedy]]
  * packs: repartition by key, sort within partitions, ONE pass of O(1)
  * fold state per key in `mapPartitions`. No window buffer, no
  * exponent-of-n arithmetic (pow-based window forms overflow at long
  * histories); each key's chain is a strict left fold
  * `e_n = α·x_n + (1−α)·e_{n−1}`, `e_1 = x_1`, in document order.
  *
  * Determinism: α must be an exact binary fraction (default 1/4) so the
  * fold is the same IEEE sequence everywhere; the DuckDB oracle replays
  * it with a recursive CTE over the identical (ts, id) order.
  *
  * 100 TB: one shuffle (repartition on key), then linear scan;
  * per-key sequential work is unavoidable by definition of the operator
  * and parallelizes across keys. */
object Smooth {

  /** Tabular CUSUM drift detection per key (Page 1954): the one-sided
    * statistic `s = max(0, s + (x − target − slack))` over (`tsCol`,
    * `idCol`) order; an alarm fires when `s > h` and the statistic
    * resets — the per-entity mean-shift monitor. Same sorted-fold shape
    * as [[ewma]]; all params are plain doubles applied in one fixed
    * expression per step, so the DuckDB oracle replays the exact IEEE
    * sequence with a recursive CTE.
    *
    * Returns `(key, n_events, n_alarms, first_alarm_ms, max_stat)` —
    * `first_alarm_ms` NULL when no alarm fired; `max_stat` rounded 6. */
  def cusum(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
            valCol: String, target: Double, slack: Double,
            h: Double): DataFrame = {
    val base = df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("__id"),
        col(valCol).cast("double").as("__x"),
        unix_millis(col(tsCol)).as("__ms"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("__ts"), col("__id"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("n_alarms", LongType, nullable = false),
      StructField("first_alarm_ms", LongType, nullable = true),
      StructField("max_stat", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      val it = rows.buffered
      new Iterator[Row] {
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val k = it.head.getLong(0)
          var n = 0L
          var s = 0.0
          var mx = 0.0
          var alarms = 0L
          var firstMs: java.lang.Long = null
          while (it.hasNext && it.head.getLong(0) == k) {
            val r = it.next()
            val x = r.getDouble(3)
            s = math.max(0.0, s + (x - target - slack))
            if (s > mx) mx = s
            if (s > h) {
              alarms += 1L
              if (firstMs == null) firstMs = r.getLong(4)
              s = 0.0
            }
            n += 1L
          }
          val mxr = BigDecimal(java.math.BigDecimal.valueOf(mx))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Row(k, n, alarms, firstMs, mxr)
        }
      }
    }(enc)
  }

  /** `(key, n_events, ewma)` — final smoothed value per key over `valCol`
    * ordered by (`tsCol`, `idCol`). */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valCol: String, alpha: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha in (0,1], got $alpha")
    val base = df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("__id"),
        col(valCol).cast("double").as("__x"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("__ts"), col("__id"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("ewma", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    base.mapPartitions { rows =>
      new Iterator[Row] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val k = it.head.getLong(0)
          var n = 0L
          var e = 0.0
          while (it.hasNext && it.head.getLong(0) == k) {
            val x = it.next().getDouble(3)
            e = if (n == 0L) x else alpha * x + (1.0 - alpha) * e
            n += 1L
          }
          Row(k, n, e)
        }
      }
    }(enc)
  }

  /** Offline change-point detection per key — the retrospective cousin
    * of [[cusum]]: over each key's daily count series, the split index
    * maximizing the two-sample mean gap
    * `|mean(days ≤ k) − mean(days > k)|` — where did the level shift?
    *
    * Exactness: daily counts and prefix sums are exact BIGINTs from one
    * keyed window; each candidate's statistic is ONE double expression
    * rounded 9 dp, and the argmax ties break on the earlier index — the
    * selected split replays deterministically. The winning row also
    * reports both side means (rounded 6).
    *
    * Scale shape: a (key, day) partial aggregate collapses the event
    * stream to key×days rows; ONE key-partitioned window computes
    * prefix sums and totals; the argmax is a WindowGroupLimit rank
    * filter. Nothing beyond key×days after the first aggregate. */
  def changePoint(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = df
      .groupBy(col(keyCol).as("key"), col(tsCol).cast("date").as("__day"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("key")).orderBy(col("__day"))
    val wAll = Window.partitionBy(col("key"))
    val pre = daily.select(col("key"), col("__day"),
      row_number().over(w).as("__k"),
      sum(col("__c")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("__sk"),
      count(lit(1)).over(wAll).as("__n"), sum(col("__c")).over(wAll)
        .as("__s"))
    val cand = pre.where(col("__k") < col("__n"))
      .select(col("key"), col("__day"), col("__k"), col("__n"),
        round(col("__sk").cast("double") / col("__k"), 6).as("left_mean"),
        round((col("__s") - col("__sk")).cast("double") /
          (col("__n") - col("__k")), 6).as("right_mean"),
        round(abs(col("__sk").cast("double") / col("__k") -
          (col("__s") - col("__sk")).cast("double") /
            (col("__n") - col("__k"))), 9).as("__stat"))
    val pick = Window.partitionBy(col("key"))
      .orderBy(col("__stat").desc, col("__k").asc)
    cand.withColumn("__rk", row_number().over(pick))
      .where(col("__rk") === 1)
      .select(col("key"), col("__n").as("n_days"),
        col("__day").as("split_day"), col("left_mean"), col("right_mean"),
        round(col("__stat"), 6).as("gap"))
  }

  /** Holt double-exponential smoothing per key — [[ewma]] plus a trend
    * state, so a steadily rising series forecasts ABOVE its last level
    * where a plain EWMA lags it: `l_n = α·x_n + (1−α)·(l+b)`,
    * `b_n = β·(l_n − l) + (1−β)·b`, init `l_1 = x_1, b_1 = 0` (pinned).
    * One-step forecast `l + b` rides along.
    *
    * Same sorted-fold scale shape as [[ewma]]; α and β must be exact
    * binary fractions so the IEEE sequence replays in the oracle's
    * recursive CTE (the b-update re-derives l_n with the textually
    * identical expression — same ops, same order, same doubles).
    *
    * Returns `(key, n_events, level, trend, forecast)` rounded 6. */
  def holt(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
           valCol: String, alpha: Double = 0.25,
           beta: Double = 0.25): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta > 0 && beta <= 1,
      s"alpha/beta in (0,1], got ($alpha, $beta)")
    val base = df.select(col(keyCol).cast("long").as("key"),
        col(tsCol).as("__ts"), col(idCol).cast("long").as("__id"),
        col(valCol).cast("double").as("__x"))
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("__ts"), col("__id"))
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("n_events", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("forecast", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    def r6(x: Double): Double = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    base.mapPartitions { rows =>
      new Iterator[Row] {
        private val it = rows.buffered
        def hasNext: Boolean = it.hasNext
        def next(): Row = {
          val k = it.head.getLong(0)
          var n = 0L
          var l = 0.0
          var b = 0.0
          while (it.hasNext && it.head.getLong(0) == k) {
            val x = it.next().getDouble(3)
            if (n == 0L) { l = x; b = 0.0 }
            else {
              val lNew = alpha * x + (1.0 - alpha) * (l + b)
              b = beta * (lNew - l) + (1.0 - beta) * b
              l = lNew
            }
            n += 1L
          }
          Row(k, n, r6(l), r6(b), r6(l + b))
        }
      }
    }(enc)
  }
}
