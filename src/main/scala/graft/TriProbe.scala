package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: count wedges passing the bloom pre-filter. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val und = li.as("x").join(li.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("__a"), col("y.l_partkey").as("__b"))
      .distinct()
    val deg = und.select(col("__a").as("__v"))
      .unionAll(und.select(col("__b").as("__v")))
      .groupBy("__v").agg(count(lit(1)).as("__deg"))
    val d = und
      .join(deg.withColumnRenamed("__v", "__a").withColumnRenamed("__deg", "__da"), "__a")
      .join(deg.withColumnRenamed("__v", "__b").withColumnRenamed("__deg", "__db"), "__b")
      .select(
        when(col("__da") < col("__db") ||
          (col("__da") === col("__db") && col("__a") < col("__b")),
          struct(col("__a").as("s"), col("__b").as("t")))
          .otherwise(struct(col("__b").as("s"), col("__a").as("t"))).as("__e"))
      .select(col("__e.s").as("__s"), col("__e.t").as("__t"))
    val dP = d.repartition(32, col("__s"))
    val e1 = dP.select(col("__s"), col("__t").as("__u"))
    val e2 = dP.select(col("__s"), col("__t").as("__v"))
    val wedges = e1.join(e2, "__s").filter(col("__u") < col("__v"))
    val closing = und.select(col("__a").as("__u"), col("__b").as("__v"))
    for (fpp <- Seq(0.03, 0.01)) {
      val bf = closing.select(xxhash64(col("__u"), col("__v")).as("__k"))
        .rdd.treeAggregate(
          org.apache.spark.util.sketch.BloomFilter.create(11999230L, fpp))(
          (f, r) => { f.putLong(r.getLong(0)); f },
          (f1, f2) => { f1.mergeInPlace(f2); f1 })
      val bfB = spark.sparkContext.broadcast(bf)
      val mightClose = udf((k: Long) => bfB.value.mightContainLong(k))
      val n = wedges.where(mightClose(xxhash64(col("__u"), col("__v")))).count()
      println(s"[triprobe] fpp=$fpp survivors=$n bitSize=${bf.bitSize()}")
      bfB.destroy()
    }
    val all = wedges.count()
    println(s"[triprobe] total wedges=$all")
    spark.stop()
  }
}
