package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The audit-checksum invariants the reconciliation story rests on. */
class ChecksumBootstrapSpec extends SparkSpec {
  import spark.implicits._

  private def checksum(rows: Seq[(Long, Long)]): Long =
    rows.toDF("a", "b")
      .agg(bit_xor(expressions.Md5Long(concat_ws("|", col("a"), col("b")))
        .bitwiseAND(lit(Long.MaxValue))).as("c"))
      .collect()(0).getLong(0)

  test("xor checksum is order/partitioning-independent and value-sensitive") {
    val rows = (1L to 100L).map(i => (i, i * 7))
    val base = checksum(rows)
    assert(checksum(rows.reverse) == base)
    val repart = rows.toDF("a", "b").repartition(13)
      .agg(bit_xor(expressions.Md5Long(concat_ws("|", col("a"), col("b")))
        .bitwiseAND(lit(Long.MaxValue))))
      .collect()(0).getLong(0)
    assert(repart == base)
    // one changed value flips the checksum; a dropped row flips it too
    assert(checksum(rows.updated(5, (6L, 999L))) != base)
    assert(checksum(rows.drop(1)) != base)
  }

  test("a duplicated row cancels itself — document the xor caveat") {
    // xor checksums are multiset-blind to EVEN multiplicities: pair the
    // checksum with the row count (audit_checksum emits both)
    val rows = (1L to 10L).map(i => (i, i))
    assert(checksum(rows ++ Seq((3L, 3L), (3L, 3L))) == checksum(rows))
  }
}
