package graft.ops

import graft.SparkSpec

class ValidateSpec extends SparkSpec {
  import spark.implicits._
  import Validate._

  test("each rule counts exactly its planted violations") {
    val df = Seq(
      (Some(1L), Some(10.0), Some("1-URGENT"), 100L),
      (Some(2L), Some(-5.0), Some("9-BOGUS"), 101L),   // range + regex
      (None,     Some(20.0), None,            102L),   // null key; null text OK for Matches
      (Some(3L), None,       Some("2-HIGH"),  100L))   // null range viol; dup id 100
      .toDF("k", "v", "p", "id")
    val dim = Seq(1L, 2L).toDF("dk") // 3 is dangling; NULL k dangles too
    val out = validate(df, Seq(
      NotNull("k"), InRange("v", 0.0, 15.0), Matches("p", "^[1-5]-"),
      Unique(Seq("id")), RefIntegrity("k", dim, "dk")))
      .as[(String, String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(out == Map(
      "not_null"      -> ((1L, 4L, false)),
      "in_range"      -> ((3L, 4L, false)), // -5, 20 (hi=15), NULL
      "matches"       -> ((1L, 4L, false)), // 9-BOGUS only; NULL skipped
      "unique"        -> ((1L, 4L, false)), // id 100 twice -> 1 extra
      "ref_integrity" -> ((2L, 4L, false)))) // k=3 and k=NULL dangle
  }

  test("a clean table passes every rule") {
    val df = Seq((1L, 1.0, "1-A", 1L), (2L, 2.0, "2-B", 2L))
      .toDF("k", "v", "p", "id")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = validate(df, Seq(
      NotNull("k"), InRange("v", 0.0, 5.0), Matches("p", "^[1-5]-"),
      Unique(Seq("id")), RefIntegrity("k", dim, "dk")))
      .as[(String, String, Long, Long, Boolean)].collect()
    assert(out.length == 5 && out.forall(r => r._3 == 0L && r._5))
  }

  test("scalar rules share one aggregation pass (single scan)") {
    val df = spark.read.parquet(s"$sf001/orders.parquet")
    val plan = validate(df, Seq(
      NotNull("o_custkey"), InRange("o_totalprice", 0.0, 5.0),
      Matches("o_orderpriority", "^[1-5]-")))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate over ONE parquet scan, however
    // many scalar rules there are
    assert(plan.split("Scan parquet").length - 1 == 1)
    assert(plan.split("HashAggregate").length - 1 == 2)
  }

  test("fkAudit: planted dangling keys, NULL FKs, clean edge") {
    import spark.implicits._
    import Validate.FkEdge
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Option(1L), Option(1L), Option(9L), Option(8L),
      Option(8L), None).toDF("fk")
    val out = Validate.fkAudit(Seq(
        FkEdge("bad", child, "fk", parent, "pk"),
        FkEdge("clean", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 6 child rows, keys {1,9,8}, 1 NULL fk, dangling {9,8}
    assert(out("bad") === ((6L, 3L, 1L, 2L)))
    assert(out("clean") === ((3L, 3L, 0L, 0L)))
  }
}
