package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingPiiSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: per-stratum rates within tolerance, deterministic") {
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1), 0.0, "s1")
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") / 2000.0 - 0.5) < 0.05)
    assert(math.abs(byLang("de") / 2000.0 - 0.1) < 0.05)
    // deterministic: same seed = same rows; different seed = different draw
    val again = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1), 0.0, "s1").as[(Long, String)].collect().toSet
    assert(again == out.as[(Long, String)].collect().toSet)
    val other = Sampling.stratifiedSample(df, "id", "lang",
      Map("en" -> 0.5, "de" -> 0.1), 0.0, "s2").as[(Long, String)].collect().toSet
    assert(other != again)
  }

  test("hexThreshold edges") {
    assert(Sampling.hexThreshold(0.0) == "00000000")
    assert(Sampling.hexThreshold(1.0) == "ffffffff")
    assert(Sampling.hexThreshold(0.5) == "80000000")
  }

  test("negativeSample: k fresh items per user, never a positive, stable") {
    val inter = Seq((1L, 3L), (1L, 7L), (2L, 0L), (2L, 1L), (2L, 2L))
      .toDF("u", "i")
    val out = Sampling.negativeSample(inter, "u", "i", nItems = 10L,
      k = 3, seed = "t")
    val rows = out.as[(Long, Long, Long)].collect()
    val pos = Map(1L -> Set(3L, 7L), 2L -> Set(0L, 1L, 2L))
    rows.foreach { case (u, item, _) =>
      assert(!pos(u).contains(item) && item >= 0 && item < 10) }
    val byUser = rows.groupBy(_._1)
    assert(byUser.keySet == Set(1L, 2L))
    byUser.values.foreach { rs =>
      assert(rs.length == 3 && rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L)) }
    // deterministic across partitioning
    val again = Sampling.negativeSample(inter.repartition(5), "u", "i",
      nItems = 10L, k = 3, seed = "t").as[(Long, Long, Long)].collect()
    assert(again.toSet == rows.toSet)
    // a different seed draws a different sample
    val other = Sampling.negativeSample(inter, "u", "i", nItems = 10L,
      k = 3, seed = "t2").as[(Long, Long, Long)].collect()
    assert(other.toSet != rows.toSet)
  }

  test("negativeSample: a user who saw almost everything comes up short") {
    // user 1 interacted with 9 of 10 items; 9 slots can't always find 3
    // distinct negatives but every emitted negative is correct
    val inter = (0L until 9L).map(i => (1L, i)).toDF("u", "i")
    val out = Sampling.negativeSample(inter, "u", "i", nItems = 10L,
      k = 3, seed = "t").as[(Long, Long, Long)].collect()
    assert(out.forall(_._2 == 9L) && out.length <= 3)
  }

  test("scrubPii redacts emails, phones, IPs and leaves prose alone") {
    val out = Seq(Tuple1(
      "mail a.user+x@sub.example.org or call +12345678901 from 192.168.1.200 ok"))
      .toDF("t").select(TextFunctions.scrubPii($"t")).as[String].collect().head
    assert(out == "mail <EMAIL> or call <PHONE> from <IP> ok")
    val clean = Seq(Tuple1("no contact info here, version 1.2 at 3pm"))
      .toDF("t").select(TextFunctions.scrubPii($"t")).as[String].collect().head
    assert(clean == "no contact info here, version 1.2 at 3pm")
  }
}
