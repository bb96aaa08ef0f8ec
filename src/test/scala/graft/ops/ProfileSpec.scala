package graft.ops

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("columnProfile: rows, nulls, exact NDV, min/max per column in one pass") {
    val df = Seq(
      (1L, Some("a"), Some(10)),
      (2L, None, Some(20)),
      (3L, Some("b"), None),
      (4L, Some("a"), Some(20))
    ).toDF("id", "s", "n")
    val p = Profile.columnProfile(df, Seq("id", "s", "n")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "b")))
    assert(p("n") == ((4L, 1L, 2L, "10", "20")))
  }

  test("output order follows the requested column order") {
    val df = Seq((1, 2)).toDF("x", "y")
    val names = Profile.columnProfile(df, Seq("y", "x")).collect().map(_.getString(0))
    assert(names.toSeq == Seq("y", "x"))
  }
}
