package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (guide §1, round-15 scale proof): synthesize an `factor`×
  * dataset from an sf dir by unioning `factor` replicas with
  * replica-disjoint keys, so the top queries can be measured at a scale
  * where parallelism actually shows (sf0.1 is too small for most of the
  * suite to demonstrate core scaling — VERDICT r14 §scaling).
  *
  * Faithful-scaling choices (NOT just row duplication):
  *  - every key column is offset per replica (joins stay replica-local,
  *    fact/dim ratios preserved);
  *  - document text is alphabet-ROTATED per replica (translate) so
  *    replicas are NOT near-duplicates of each other — plain duplication
  *    would square the LSH candidate sets (adversarial, not
  *    representative);
  *  - embeddings are cyclically rotated per replica (norm-preserving,
  *    decorrelated) so vector queries do not see `factor` exact twins;
  *  - dims (region, nation) are copied once, as a real scale-up would;
  *  - big tables are written with `factor`-proportional file counts so
  *    scans split naturally (which also makes the conditional fanOut the
  *    no-op it claims to be at scale).
  *
  * NOT oracle-checked: this data is for relative timing only.
  *
  * Usage: runMain graft.ScaleUp <srcDir> <dstDir> <factor>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val (src, dst, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 2, "factor must be >= 2")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scaleup")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep whatever timestamp encoding the source carries
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 100000000L // far above any base key

    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val copyOnce = Seq("region", "nation")
    val outFiles: Map[String, Int] = Map(
      "lineitem" -> 4 * factor, "events" -> 2 * factor,
      "orders" -> factor, "documents" -> factor,
      "embeddings" -> factor, "customer" -> factor,
      "part" -> factor) // supplier + dims stay single-file

    val alpha = ('a' to 'z').mkString + ('A' to 'Z').mkString
    def rot(k: Int): String = {
      val lo = ('a' to 'z').toArray
      val up = ('A' to 'Z').toArray
      (lo.drop(k % 26) ++ lo.take(k % 26)).mkString +
        (up.drop(k % 26) ++ up.take(k % 26)).mkString
    }

    def replica(df: DataFrame, table: String, k: Int): DataFrame = {
      var out = df
      if (k > 0) {
        for (c <- keyCols(table))
          out = out.withColumn(c, col(c) + lit(k * OFF))
        if (table == "documents")
          out = out.withColumn("text", translate(col("text"), alpha, rot(k)))
        if (table == "embeddings") {
          val dim = df.select(size(col("embedding"))).head().getInt(0)
          val s = k % dim
          if (s > 0) out = out.withColumn("embedding",
            concat(slice(col("embedding"), s + 1, dim - s),
              slice(col("embedding"), 1, s)))
        }
      }
      out
    }

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))
    for (t <- copyOnce) {
      spark.read.parquet(s"$src/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t copied once")
    }
    for (t <- keyCols.keys.toSeq.sorted) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled = (0 until factor).map(replica(base, t, _))
        .reduce(_.unionByName(_))
        .repartition(outFiles.getOrElse(t, 1))
      scaled.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scaleup] $t x$factor -> ${outFiles.getOrElse(t, 1)} files")
    }
    spark.stop()
  }
}
