package graft.functions

import graft.SparkSpec
import graft.functions.expressions.VectorExprs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The fused assignment kernels must be drop-in equal to the declarative
  * shape they replaced — including EXACT ties (duplicated matrix rows),
  * where the rule is "larger index wins" (≡ struct array_max / reverse
  * array_sort order (dot desc, index desc)). A tie-rule drift here would
  * silently re-cluster every kmeans/IVF/PQ oracle. */
class MatVecKernelSpec extends SparkSpec {
  import spark.implicits._

  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.choose(-4, 4).map(_.toFloat / 2f)).map(_.toArray)

  // coarse component values + a forced duplicated row half the time →
  // real exact ties exercise the larger-index rule
  private def matrixGen(dim: Int): Gen[Array[Array[Double]]] = for {
    k <- Gen.choose(1, 7)
    rows <- Gen.listOfN(k, Gen.listOfN(dim, Gen.choose(-2, 2)
      .map(_.toDouble / 2)).map(_.toArray))
    dupFrom <- Gen.choose(0, k - 1)
    dupAt <- Gen.choose(0, k - 1)
    withDup <- Gen.oneOf(true, false)
  } yield {
    val m = rows.toArray
    if (withDup) m(dupAt) = m(dupFrom).clone()
    m
  }

  /** The pre-r9 declarative shape (dots column + lambda argmax) — kept as
    * the semantic oracle for the kernel. */
  private def declarativeArgMax(vecs: Seq[Array[Float]],
                                m: Array[Array[Double]]): Seq[Int] =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .withColumn("__dots", VectorExprs.matVec(col("v"), m))
      .withColumn("cell", array_max(transform(
          sequence(lit(0), lit(m.length - 1)),
          i => struct(element_at(col("__dots"), i + 1).as("s"), i.as("c"))))
        .getField("c"))
      .orderBy("id").select("cell").as[Int].collect().toSeq

  private def declarativeTop(vecs: Seq[Array[Float]],
                             m: Array[Array[Double]], n: Int): Seq[Seq[Int]] =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .withColumn("__dots", VectorExprs.matVec(col("v"), m))
      .withColumn("top", slice(reverse(array_sort(transform(
          sequence(lit(0), lit(m.length - 1)),
          i => struct(element_at(col("__dots"), i + 1).as("s"), i.as("c"))))),
        1, math.min(n, m.length)).getField("c"))
      .orderBy("id").select("top").as[Seq[Int]].collect().toSeq

  test("MatVecArgMax == declarative struct-max, ties to the larger index") {
    val prop = Prop.forAll(Gen.choose(1, 6).flatMap(d =>
      Gen.zip(Gen.listOfN(8, vecGen(d)), matrixGen(d)))) {
      case (vecs, m) =>
        val kernel = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
          .withColumn("cell", VectorExprs.matVecArgMax(col("v"), m))
          .orderBy("id").select("cell").as[Int].collect().toSeq
        kernel == declarativeArgMax(vecs, m)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("MatVecTopCells == reverse(array_sort) slice, (dot desc, idx desc)") {
    val prop = Prop.forAll(Gen.choose(1, 6).flatMap(d =>
      Gen.zip(Gen.listOfN(6, vecGen(d)), matrixGen(d), Gen.choose(1, 4)))) {
      case (vecs, m, n) =>
        val kernel = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("id", "v")
          .withColumn("top", VectorExprs.matVecTopCells(col("v"), m,
            math.min(n, m.length)))
          .orderBy("id").select("top").as[Seq[Int]].collect().toSeq
        kernel == declarativeTop(vecs, m, n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("NaN components: kernels return a row instead of crashing") {
    val m = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq((1L, Array(Float.NaN, Float.NaN))).toDF("id", "v")
    // exact cell for an all-NaN vector is unspecified; the contract is
    // totality (pre-fix MatVecTopCells indexed at -1 here)
    assert(df.withColumn("c", VectorExprs.matVecArgMax(col("v"), m))
      .collect().length == 1)
    assert(df.withColumn("t", VectorExprs.matVecTopCells(col("v"), m, 2))
      .selectExpr("size(t)").as[Int].collect().head == 2)
  }
}
