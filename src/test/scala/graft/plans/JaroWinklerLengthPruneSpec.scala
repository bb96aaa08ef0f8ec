package graft.plans

import graft.SparkSpec
import graft.functions.Dedup
import graft.functions.expressions.{JaroWinkler, StringSim}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The length-prune optimizer rule: the injected guard is implied by the
  * similarity gate (never changes results) and actually lands in the
  * optimized plan ahead of the comparator. */
class JaroWinklerLengthPruneSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ JaroWinklerLengthPrune
    try body finally spark.experimental.extraOptimizations = prev
  }

  private val names = Seq(
    (1L, "alpha beta gamma"), (2L, "alpha beta gamm"), // close variant
    (3L, "alpha b"),                                   // same block, short
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota"),
    (5L, "beta something else entirely")).toDF("id", "name")

  test("the necessary-condition math: jw >= t implies the length bound") {
    val rnd = new scala.util.Random(7)
    def randStr() = (0 until (1 + rnd.nextInt(30)))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val e = org.apache.spark.sql.graft.ColumnBridge.expression(lit("x"))
    val cmp = JaroWinkler(e, e)
    for (_ <- 0 until 5000) {
      val a = randStr(); val b = randStr()
      val jw = cmp.compute(UTF8String.fromString(a), UTF8String.fromString(b))
      for (t <- Seq(0.85, 0.9, 0.95)) {
        if (jw >= t) {
          val (lo, hi) = (math.min(a.length, b.length).toDouble,
            math.max(a.length, b.length).toDouble)
          assert(lo >= (5.0 * t - 4.0) * hi,
            s"bound violated: jw=$jw t=$t a='$a' b='$b'")
        }
      }
    }
  }

  test("rule preserves fuzzyLink results exactly") {
    val plain = Dedup.fuzzyLink(names, "name", "id", minSim = 0.9)
      .collect().toSet
    val pruned = withRule {
      Dedup.fuzzyLink(names, "name", "id", minSim = 0.9).collect().toSet
    }
    assert(pruned == plain)
    assert(plain.exists(_.getLong(0) == 1L)) // the variant pair is found
  }

  test("guard lands in the optimized plan ahead of the comparator") {
    val df = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id"))
      .where(StringSim.jaroWinkler(col("a.name"), col("b.name")) >= 0.9)
    val optimized = withRule {
      df.queryExecution.optimizedPlan.toString
    }
    assert(optimized.contains("least("))
    assert(optimized.contains("greatest("))
    // idempotent: the rule firing again must not stack a second guard
    val twice = withRule {
      JaroWinklerLengthPrune(df.queryExecution.optimizedPlan).toString
    }
    assert(twice.split("least\\(").length == optimized.split("least\\(").length)
    // without the rule no guard exists (fresh frame — queryExecution above
    // memoized the rule-applied plan)
    val fresh = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .where(StringSim.jaroWinkler(col("a.name"), col("b.name")) >= 0.9)
    assert(!fresh.queryExecution.optimizedPlan.toString.contains("least("))
  }

  test("below the 0.8 threshold the rule leaves the plan alone") {
    val df = names.as("a").join(names.as("b"), col("a.id") < col("b.id"))
      .where(StringSim.jaroWinkler(col("a.name"), col("b.name")) >= 0.5)
    val optimized = withRule { df.queryExecution.optimizedPlan.toString }
    assert(!optimized.contains("least("))
  }
}
