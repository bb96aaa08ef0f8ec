package graft.functions

import org.apache.spark.sql.SparkSession
import graft.functions.expressions.{FloatVectorDot, HllUnionEst, JaroWinkler, KgramContainment, KgramJaccard, MinHashSig, SimHash64, WordNgrams}

/** SQL registration of the engine's custom expressions, so SQL
  * transformations (T1) can call them alongside the built-in library —
  * the reference's "full engine SQL surface" contract extended with our
  * additions (SURVEY.md §2.10).
  *
  * Usage in SQL after `Registry.registerAll(spark)`:
  * {{{
  *   SELECT minhash_sig(text, 5, 64), simhash64(tokens),
  *          kgram_jaccard(a, b, 5), fvec_dot(v1, v2) ...
  * }}}
  */
object Registry {

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig", exprs => {
      require(exprs.length == 3, "minhash_sig(text, shingleK, numHashes)")
      MinHashSig(exprs.head, intLit(exprs(1)), intLit(exprs(2)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", exprs => {
      require(exprs.length == 1, "simhash64(array<string>)")
      SimHash64(exprs.head)
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kgram_jaccard", exprs => {
      require(exprs.length == 3, "kgram_jaccard(a, b, shingleK)")
      KgramJaccard(exprs.head, exprs(1), intLit(exprs(2)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("fvec_dot", exprs => {
      require(exprs.length == 2, "fvec_dot(a, b)")
      FloatVectorDot(exprs.head, exprs(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("jaro_winkler", exprs => {
      require(exprs.length == 2, "jaro_winkler(a, b)")
      JaroWinkler(exprs.head, exprs(1))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("word_ngrams", exprs => {
      require(exprs.length == 2, "word_ngrams(text, n)")
      WordNgrams(exprs.head, intLit(exprs(1)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("kgram_containment", exprs => {
      require(exprs.length == 3, "kgram_containment(a, b, shingleK)")
      KgramContainment(exprs.head, exprs(1), intLit(exprs(2)))
    }, "scala_udf")
    reg.createOrReplaceTempFunction("hll_union_est", exprs => {
      require(exprs.length == 2, "hll_union_est(sketch_a, sketch_b)")
      HllUnionEst(exprs.head, exprs(1), 10)
    }, "scala_udf")
  }

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }
}
