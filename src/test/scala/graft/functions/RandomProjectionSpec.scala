package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("matches the hand-derived md5 matrix on a unit vector") {
    // e_i picks out column i of the matrix: proj(e_i)_j = m(j, i)
    val dim = 8
    val basis = (0 until dim).map(i =>
      (i.toLong, Array.tabulate(dim)(k => if (k == i) 1.0f else 0.0f)))
      .toDF("id", "v")
    val got = basis
      .select($"id", Vectors.randomProjection($"v", dim, 4).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val s = math.sqrt(3.0 / 4)
    for (i <- 0 until dim; j <- 0 until 4) {
      val m = ((expressions.Md5Hash64.lower(s"rp|$j|$i") & Long.MaxValue) % 6)
        match {
          case 0L => s; case 1L => -s; case _ => 0.0
        }
      assert(got(i.toLong)(j) == m, s"m($j,$i)")
    }
  }

  test("matrix is ~1/3 dense and both signs occur") {
    val s = math.sqrt(3.0 / 16)
    val entries = for (j <- 0 until 16; i <- 0 until 64) yield {
      ((expressions.Md5Hash64.lower(s"rp|$j|$i") & Long.MaxValue) % 6) match {
        case 0L => s; case 1L => -s; case _ => 0.0
      }
    }
    val nz = entries.count(_ != 0.0)
    assert(nz > entries.size / 5 && nz < entries.size / 2, s"density $nz")
    assert(entries.exists(_ > 0) && entries.exists(_ < 0))
  }

  test("JL: norms are preserved in expectation on real embeddings") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet").limit(100)
    val d = e.select(
        Vectors.dotDouble(
          Vectors.randomProjection(col("embedding"), 64, 16),
          Vectors.randomProjection(col("embedding"), 64, 16)).as("p2"),
        Vectors.dot(col("embedding"), col("embedding")).as("n2"))
      .select(($"p2" / $"n2").as("r")).as[Double].collect()
    val mean = d.sum / d.length
    assert(mean > 0.6 && mean < 1.5, s"mean distortion $mean")
    assert(d.forall(r => r > 0.05 && r < 5.0), "per-vector distortion sane")
  }
}
