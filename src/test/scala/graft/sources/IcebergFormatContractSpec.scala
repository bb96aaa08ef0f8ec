package graft.sources

import graft.SparkSpec

/** Contract pin for the jar-gated Iceberg binding — the same convention
  * as [[DeltaFormatContractSpec]]: where no iceberg-spark-runtime jar
  * exists to execute against, pin exactly WHAT an Iceberg-enabled
  * cluster will run — identifier mapping, the `create_changelog_view`
  * call (argument order and the start/end option keys), the MERGE/DELETE
  * statements' validity under the vanilla grammar, and the
  * `expire_snapshots` horizon's timezone independence. */
class IcebergFormatContractSpec extends SparkSpec {

  private val fmt = new IcebergFormat("icecat")

  test("ident: deterministic, namespace-isolated, safe for any path") {
    val id = fmt.ident("/data/my table!/v1")
    assert(id.startsWith("icecat.graft.v1_"))
    assert(id.matches("""icecat\.graft\.[A-Za-z0-9_]+_[0-9a-f]{8}"""))
    // deterministic per path; distinct paths with same basename diverge
    assert(fmt.ident("/data/my table!/v1") == id)
    assert(fmt.ident("/other/v1") != id)
  }

  test("changelog view call pins argument order and option keys") {
    assert(fmt.changelogViewSql("graft.t_ab", "100", "200", "v_chg") ==
      """CALL icecat.system.create_changelog_view(
        |  table => 'graft.t_ab',
        |  options => map('start-snapshot-id', '100',
        |                 'end-snapshot-id', '200'),
        |  changelog_view => 'v_chg')""".stripMargin)
  }

  test("expire_snapshots horizon is timezone-independent (+00:00 literal)") {
    val sql = fmt.expireSnapshotsSql("graft.t_ab", "2026-08-15 12:00:00", 3)
    assert(sql ==
      """CALL icecat.system.expire_snapshots(
        |  table => 'graft.t_ab',
        |  older_than => TIMESTAMP '2026-08-15 12:00:00+00:00',
        |  retain_last => 3)""".stripMargin)
    // the zoned literal must resolve to the same instant in ANY session
    // timezone — that is the whole point of the offset suffix
    def instantIn(tz: String): java.sql.Timestamp = {
      val prior = spark.conf.get("spark.sql.session.timeZone")
      spark.conf.set("spark.sql.session.timeZone", tz)
      try spark.sql("SELECT TIMESTAMP '2026-08-15 12:00:00+00:00' AS t")
        .collect()(0).getTimestamp(0)
      finally spark.conf.set("spark.sql.session.timeZone", prior)
    }
    assert(instantIn("UTC").toInstant == instantIn("Asia/Tokyo").toInstant)
  }

  test("MERGE and DELETE statements parse under the vanilla grammar") {
    val m = spark.sessionState.sqlParser
      .parsePlan(fmt.mergeSql("/data/t", "id", "updates_v")).toString
    assert(m.contains("MergeIntoTable") || m.toLowerCase.contains("merge"))
    val d = spark.sessionState.sqlParser
      .parsePlan(fmt.deleteSql("/data/t", "id = 1")).toString
    assert(d.toLowerCase.contains("delete"))
  }
}
