package graft.sources

import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  test("compact rewrites the latest version into fewer files, same rows") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = spark.range(1000).select($"id", ($"id" % 7).as("v"))
    Writers.writeVersioned(df.repartition(16), base)
    val before = Writers.latestVersion(spark, base).get
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(before) == 16)

    val compacted = Writers.compact(spark, base, targetFiles = 2)
    assert(compacted != before)
    assert(Writers.latestVersion(spark, base).contains(compacted))
    assert(parquetFiles(compacted) == 2)
    val a = spark.read.parquet(before).as[(Long, Long)].collect().sorted.toSeq
    val b = Writers.readLatest(spark, base).as[(Long, Long)].collect().sorted.toSeq
    assert(a == b && a.size == 1000)
  }
}
