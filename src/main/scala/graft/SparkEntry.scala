package graft

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog._
import graft.functions.{Dedup, TextFunctions => TF, Vectors}
import graft.ops._
import graft.transform.SqlTransform

/** Driver contract (SURVEY.md §7 + builder prompt): one `queries` entry per
  * implemented operator from SURVEY.md §2, with a DuckDB-equivalent oracle SQL
  * for each SQL-expressible one.
  *
  * Determinism rules shared by every query/oracle pair (the driver hash-compares
  * values column-by-column):
  *  - money aggregates go through DECIMAL(18,2) and are cast to DOUBLE at the
  *    end — exact, order-independent, identical in both engines;
  *  - event timestamps are nanosecond parquet; Spark truncates to micros on
  *    read, so oracles `CAST(ts AS TIMESTAMP)` (micros) before comparing and
  *    both sides emit `epoch ms` BIGINT columns, never raw timestamps;
  *  - every window has a total deterministic order (documented tie-breaks);
  *  - float similarity scores are sequential-fold doubles rounded to 6 dp.
  */
object SparkEntry {

  /** Read a harness table; TIMESTAMP_NTZ columns (plain parquet
    * timestamp[ms]) are cast to session-TZ (UTC) TIMESTAMP so epoch math and
    * oracle comparisons agree (DuckDB treats naive parquet timestamps as
    * epoch-UTC; so do we). */
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          acc.withColumn(f.name, col(f.name).cast("timestamp"))
        case _ => acc
      }
    }
  }

  /** events.ts normalized to micros TIMESTAMP whatever the file encodes
    * (nanos int64 or micros NTZ — testdata has shipped both); see
    * [[graft.sources.Readers.normalizeTs]]. */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.Readers.eventsNormalized(s, dir)

  /** Max event time for the streaming sentinel fixtures; epoch on an
    * EMPTY table so the replay harness still runs (to an empty result)
    * instead of NPE-ing — the empty-input robustness contract. */
  private def maxTsOrEpoch(df: DataFrame): java.sql.Timestamp =
    Option(df.agg(max(col("ts"))).collect()(0).getTimestamp(0))
      .getOrElse(new java.sql.Timestamp(0L))

  /** Run independent Spark actions concurrently (guide §2.6 "overlap
    * independent jobs"): the stream-replay fixtures write their left and
    * right inputs as two small jobs the driver otherwise serializes
    * end-to-end — each is a near-single-task job, so overlapping them
    * halves the fixture-setup wall time without contending for cores. */
  private def awaitAll(fs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // Await EVERY future before propagating a failure: throwing on the
    // first would leave sibling fixture writers still appending to the
    // temp dir while the caller unwinds. Secondary failures ride along
    // as suppressed exceptions instead of vanishing.
    val done = fs.map(f => Future(f()))
      .map(fut => scala.util.Try(Await.result(fut, Duration.Inf)))
    val failures = done.collect { case scala.util.Failure(e) => e }
    failures.headOption.foreach { first =>
      failures.drop(1).foreach(first.addSuppressed)
      throw first
    }
  }

  /** Streaming state-store partition count for the stateful replay
    * fixtures. The floor of 8 is MEASURED at this state size (~150
    * entities): cores-sized stores (32) regressed the interval joins
    * 3.78 → 9.9 s because per-store open/commit cost dominates tiny
    * state. It is not a local[32] constant though — state scales with
    * input, so the store count grows with the session's parallelism
    * (a quarter of the cores keeps each store big enough to amortize
    * its commit); `spark.graft.statePartitions` overrides for callers
    * that know their state size. Partition count never affects the
    * emitted rows — only the state-store layout. */
  private def statePartitions(s: SparkSession): String =
    s.conf.getOption("spark.graft.statePartitions").getOrElse(
      math.max(8, s.sparkContext.defaultParallelism / 4).toString)

  // ------------------------------------------------------------------ T1/T2
  // SQL transformation with {{source}} templating, full SparkSQL passthrough.

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc
      |FROM {{lineitem}}
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  private def q1(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s, q1Sql, Map(ResourceId("lineitem") -> t(s, dir, "lineitem")))

  /** TPC-H Q5 shape (local-supplier revenue): the classic 6-table
    * snowflake join — region/nation dims broadcast, the lineitem fact
    * never shuffles more than its pruned columns, and the date filter
    * pushes to the orders scan. Exercises Catalyst's join ordering over
    * the full dim/fact schema through the same T1 SQL surface users get. */
  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_lineitems
      |FROM {{customer}} c
      |JOIN {{orders}} o   ON c.c_custkey = o.o_custkey
      |JOIN {{lineitem}} l ON l.l_orderkey = o.o_orderkey
      |JOIN {{supplier}} s ON l.l_suppkey = s.s_suppkey
      |                   AND c.c_nationkey = s.s_nationkey
      |JOIN {{nation}} n   ON s.s_nationkey = n.n_nationkey
      |JOIN {{region}} r   ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  private def q5(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s, q5Sql,
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .map(n => ResourceId(n) -> t(s, dir, n)).toMap)

  // Chained transformations (T4): t1 = enriched orders, t2 = agg over {{t1}}.
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val cat = new Catalog(s)
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerSource(SourceVariant(ResourceId("customer"),
      PrimaryData(s"$dir/customer.parquet")))
    cat.registerSource(SourceVariant(ResourceId("nation"),
      PrimaryData(s"$dir/nation.parquet")))
    cat.registerSource(SourceVariant(ResourceId("enriched"), SqlTransformation(
      """SELECT o_orderkey, o_totalprice, n_name
        |FROM {{orders}} o JOIN {{customer}} c ON o.o_custkey = c.c_custkey
        |JOIN {{nation}} n ON c.c_nationkey = n.n_nationkey""".stripMargin)))
    cat.registerSource(SourceVariant(ResourceId("by_nation"), SqlTransformation(
      """SELECT n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM {{enriched}} GROUP BY n_name""".stripMargin)))
    cat.resolve(ResourceId("by_nation"))
  }

  // T1 passthrough breadth: the full SparkSQL surface is the transformation
  // language — rollup, window frames, set ops, correlated subqueries.

  private def qRollup(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT n_name, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM {{orders}} o
        |JOIN {{customer}} c ON o.o_custkey = c.c_custkey
        |JOIN {{nation}} n ON c.c_nationkey = n.n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)""".stripMargin,
      Map(ResourceId("orders") -> t(s, dir, "orders"),
        ResourceId("customer") -> t(s, dir, "customer"),
        ResourceId("nation") -> t(s, dir, "nation")))

  private def qWindowRunning(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM {{orders}}""".stripMargin,
      Map(ResourceId("orders") -> t(s, dir, "orders")))

  private def qClicksNoPurchase(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT user_id, CAST(ts AS DATE) AS day FROM {{events}} WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id, CAST(ts AS DATE) AS day FROM {{events}} WHERE event_type = 'purchase'""".stripMargin,
      Map(ResourceId("events") -> events(s, dir)))

  private def qExistsSemi(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT c_custkey, c_acctbal FROM {{customer}} c
        |WHERE EXISTS (SELECT 1 FROM {{orders}} o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin,
      Map(ResourceId("customer") -> t(s, dir, "customer"),
        ResourceId("orders") -> t(s, dir, "orders")))

  private def qTopPerSegment(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM {{orders}} o JOIN {{customer}} c ON o.o_custkey = c.c_custkey)
        |WHERE rn <= 3""".stripMargin,
      Map(ResourceId("orders") -> t(s, dir, "orders"),
        ResourceId("customer") -> t(s, dir, "customer")))

  /** T1 surface: LATERAL correlated subquery — per customer, the top-2
    * orders by price (the "top-k per row" idiom LATERAL makes direct). */
  private def qLateralTopK(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM {{customer}} c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM {{orders}} o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t""".stripMargin,
      Map(ResourceId("customer") -> t(s, dir, "customer"),
        ResourceId("orders") -> t(s, dir, "orders")))

  /** T1 surface: PIVOT — order counts per priority pivoted across order
    * status columns (money stays DECIMAL-free: counts only). */
  private def qPivot(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderstatus FROM {{orders}})
        |PIVOT (COUNT(*)
        |  FOR o_orderstatus IN ('O' AS st_open, 'F' AS st_filled,
        |                        'P' AS st_partial))""".stripMargin,
      Map(ResourceId("orders") -> t(s, dir, "orders")))

  /** T1 surface: EXCEPT / INTERSECT set ops — customers with orders but
    * no high-value orders (EXCEPT) and with both order classes
    * (INTERSECT), tagged and unioned. */
  private def qExceptIntersect(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s,
      """SELECT 'only_small' AS cls, c FROM (
        |  SELECT o_custkey AS c FROM {{orders}}
        |  EXCEPT
        |  SELECT o_custkey FROM {{orders}} WHERE o_totalprice > 200000)
        |UNION ALL
        |SELECT 'both' AS cls, c FROM (
        |  SELECT o_custkey AS c FROM {{orders}} WHERE o_totalprice > 200000
        |  INTERSECT
        |  SELECT o_custkey FROM {{orders}}
        |  WHERE o_totalprice <= 200000)""".stripMargin,
      Map(ResourceId("orders") -> t(s, dir, "orders")))

  // ------------------------------------------------------- M: materialization

  private def featLatestTs(s: SparkSession, dir: String): DataFrame =
    Materialize.latest(
      events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts")),
      "entity", "value", Some("ts"))
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))

  private def featLatestNoTs(s: SparkSession, dir: String): DataFrame =
    Materialize.latestTriple(
      Materialize.toTriple(t(s, dir, "customer"),
        graft.types.ResourceSchema("c_custkey", "c_acctbal", None)))
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))

  private def chunkedExport(s: SparkSession, dir: String): DataFrame = {
    val mat = Materialize.latest(
      events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts")),
      "entity", "value", Some("ts"))
    // scale path: range-exchange + zipWithIndex — contiguous global numbering
    // with NO single-partition window (entity is unique post-latest, so the
    // range order is total and the numbering deterministic)
    val numbered = Materialize.withDistributedRowNumber(mat, Seq(col("entity")))
    Materialize.chunkSlice(numbered, 0, 100)
      .withColumn("chunk_id",
        ascii(substring(md5(col("entity").cast("string")), 1, 1)))
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"),
        col("row_number").cast("long").as("row_number"), col("chunk_id"))
  }

  // --------------------------------------------------- P: point-in-time joins

  private def pitPurchases(s: SparkSession, dir: String,
                           strategy: AsOfStrategy = SortMergeAsOf): DataFrame = {
    val ev = events(s, dir)
    val label = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val feats = Seq(
      FeatureSide(clicks, "user_id", "value", Some("ts"), "f_click"),
      FeatureSide(t(s, dir, "customer"), "c_custkey", "c_acctbal", None, "f_bal"),
      FeatureSide(t(s, dir, "orders"), "o_custkey", "o_totalprice",
        Some("o_orderdate"), "f_orders"))
    AsOfJoin.trainingSet(label, Map("entity" -> "user_id"), "value", Some("ts"),
        feats, strategy)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("f_click"), col("f_bal"), col("f_orders"), col("label"))
  }

  /** Same training set through the zero-exchange broadcast binary-search
    * strategy — the dimension-sized-feature-table plan, under the gate. */
  private def pitBroadcast(s: SparkSession, dir: String): DataFrame =
    pitPurchases(s, dir, BroadcastAsOf())

  /** Feature TTLs (Feast `ttl` role): clicks stale after 3 days, orders
    * after 25 years (the synthetic orders sit 1995-2001 against 2024
    * labels — 25y keeps post-1999 picks and masks older, so BOTH mask
    * outcomes are exercised). Replayed by the oracle as a CASE over the
    * picked feature ts. */
  private def pitMaxAge(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val label = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val feats = Seq(
      FeatureSide(clicks, "user_id", "value", Some("ts"), "f_click",
        maxAgeSeconds = Some(3L * 86400)),
      FeatureSide(t(s, dir, "orders"), "o_custkey", "o_totalprice",
        Some("o_orderdate"), "f_orders", maxAgeSeconds = Some(788940000L)))
    AsOfJoin.trainingSet(label, Map("entity" -> "user_id"), "value",
        Some("ts"), feats)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("f_click"), col("f_orders"), col("label"))
  }

  private def pitNoLabelTs(s: SparkSession, dir: String): DataFrame = {
    val feats = Seq(
      FeatureSide(events(s, dir), "user_id", "value", Some("ts"), "f_ev"),
      FeatureSide(t(s, dir, "orders"), "o_custkey", "o_totalprice",
        Some("o_orderdate"), "f_orders"))
    AsOfJoin.trainingSet(t(s, dir, "customer"), Map("entity" -> "c_custkey"),
        "c_acctbal", None, feats)
      .select(col("c_custkey"), col("f_ev"), col("f_orders"), col("label"))
  }

  private def pitLag(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val label = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val feats = Seq(
      FeatureSide(clicks, "user_id", "value", Some("ts"), "f_click"),
      FeatureSide(clicks, "user_id", "value", Some("ts"), "f_click_lag1h",
        lagSeconds = Some(3600L)))
    AsOfJoin.trainingSet(label, Map("entity" -> "user_id"), "value", Some("ts"), feats)
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("f_click"), col("f_click_lag1h"), col("label"))
  }

  private def pitMultiEntity(s: SparkSession, dir: String): DataFrame = {
    val label = t(s, dir, "lineitem")
    val feats = Seq(
      FeatureSide(t(s, dir, "supplier"), "s_suppkey", "s_acctbal", None,
        "f_supp_bal", entityName = "supplier"),
      FeatureSide(t(s, dir, "part"), "p_partkey", "p_retailprice", None,
        "f_part_price", entityName = "part"))
    AsOfJoin.trainingSet(label,
        Map("supplier" -> "l_suppkey", "part" -> "l_partkey"),
        "l_extendedprice", Some("l_shipdate"), feats)
      .select(col("l_suppkey"), col("l_partkey"),
        unix_millis(col("l_shipdate")).as("ts_ms"),
        col("f_supp_bal"), col("f_part_price"), col("label"))
  }

  /** K6 MERGE-upsert: fold the "new" half of the event stream into a snapshot
    * built from the "old" half; entities untouched by updates keep their row. */
  private def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"), col("event_id"))
    val half = 500 // event_id < 500 exists at every sf
    val snap = Materialize.latestTriple(
      ev.filter(col("event_id") < half).select("entity", "value", "ts"))
    val updates = ev.filter(col("event_id") >= half).select("entity", "value", "ts")
    Materialize.upsert(snap, updates)
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))
  }

  // ------------------------------------------------------------ B: batch join

  private def batchFeatures(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val fClick = Materialize.latest(
      ev.filter(col("event_type") === "click")
        .select(col("user_id").as("entity"), col("value"), col("ts")),
      "entity", "value", Some("ts"))
    val fBal = t(s, dir, "customer")
      .select(col("c_custkey").as("entity"), col("c_acctbal").as("value"))
    val fOrders = Materialize.latest(
      t(s, dir, "orders").select(col("o_custkey").as("entity"),
        col("o_totalprice").as("value"), col("o_orderdate").as("ts")),
      "entity", "value", Some("ts"))
    BatchJoin.batchFeatures(Seq(
      "f_click" -> fClick, "f_bal" -> fBal, "f_orders" -> fOrders))
  }

  // ------------------------------------------------------------ X: split

  private def trainTestSplit(s: SparkSession, dir: String): DataFrame =
    Split.withSplit(
      events(s, dir).select(col("event_id"), col("user_id"), col("value")),
      Seq("event_id"), testSize = 0.25, seed = 42L)

  /** Near-dup-leakage-safe split over the documents corpus: MinHash pair
    * graph → star-contraction clusters → md5 hash split on the CLUSTER
    * id, so no near-duplicate ever straddles train/test. Oracle replays
    * LSH pairs, the recursive closure, and the split hash end-to-end. */
  private def splitLeakageSafe(s: SparkSession, dir: String): DataFrame =
    Split.clusterSafeSplit(
      t(s, dir, "documents").select(col("doc_id")),
      minhashNearDups(s, dir).select(col("idA"), col("idB")),
      "doc_id", testSize = 0.25, seed = 42L)

  // ----------------------------------------------- text / dedup / similarity

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), "text", "doc_id")
      .select(col("doc_id"), TF.fingerprintMd5(col("text")).as("fp"))

  private def docFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      TF.fingerprintMd5(col("text")).as("fp"))

  /** Document sketches, both md5-derived and fully oracle-checked: the 64-bit
    * SimHash as an unsigned-decimal string (DuckDB recomputes the bit votes),
    * and the winnowing fingerprint set reduced to an order-insensitive scalar
    * digest (md5 of the sorted comma-joined values — scalar because the
    * driver's pandas compare can't sort array columns). */
  private def simhashFingerprint(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      conv(hex(Dedup.simhash64(col("text"))), 16, 10).as("simhash"),
      md5(array_join(
        transform(array_sort(Dedup.winnowFingerprints(col("text"))),
          x => x.cast("string")), ",")).as("winnow_digest"))

  private def textStats(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // one TextStats struct per row; the 6 stat columns below are field reads
    // off the SAME expression, deduplicated by subexpression elimination —
    // the document is walked once, not once per column
    val st = TF.textStats(col("text"))
    d.select(col("doc_id"),
      st.getField("n_chars").as("n_chars2"),
      st.getField("n_tokens").as("n_tokens"),
      TF.bpeTokenCount(col("text")).as("n_subwords"),
      round(TF.alphaRatioFrom(st), 6).as("alpha_ratio"),
      round(TF.digitRatioFrom(st), 6).as("digit_ratio"),
      round(TF.stopwordRatioFrom(st), 6).as("stopword_ratio"),
      TF.qualityScoreFrom(st).as("quality"))
  }

  /** The 100 TB use-case in one pipeline: quality-gate the corpus, keep one
    * language, drop exact duplicates — all scan-stage expressions plus one
    * digest-keyed dedup shuffle. */
  private def corpusClean(s: SparkSession, dir: String): DataFrame = {
    // qualityScore and langId share one TextStats subexpression in the gate
    val st = TF.textStats(col("text"))
    val docs = t(s, dir, "documents")
      .where(TF.qualityScoreFrom(st) >= 0.5 && TF.langIdFrom(st) === "en")
    Dedup.exact(docs, "text", "doc_id")
      .select(col("doc_id"), TF.fingerprintMd5(col("text")).as("fp"),
        TF.tokenCount(col("text")).cast("long").as("n_tokens"))
  }

  private def langIdQ(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("lang"),
      TF.langId(col("text")).as("pred_lang"))

  /** Filter-funnel attrition report over the corpus_clean rules plus a
    * repetition gate — see [[graft.ops.Funnel]]. */
  private def filterFunnelQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.filterFunnel(t(s, dir, "documents"), "doc_id", "text",
      qualityMin = 0.5, lang = "en", maxDupFrac = 0.6)

  /** Gopher-family repetition signals: one RepStats struct per row (single
    * document walk in the scan projection), fractions derived as arithmetic
    * over its integer fields so the oracle replays them exactly. */
  private def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    val st = graft.functions.expressions.RepExprs.repStats(col("text"))
    val n = st.getField("n_tokens")
    t(s, dir, "documents").select(col("doc_id"),
      n.as("n_tokens"),
      st.getField("top2_n").as("top2_n"),
      round(when(n === 0, 0.0)
        .otherwise(lit(1.0) - st.getField("n_distinct").cast("double") / n), 6)
        .as("dup_token_frac"),
      round(when(n < 2, 0.0)
        .otherwise(st.getField("top2_n").cast("double") / (n - 1)), 6)
        .as("top2_frac"),
      round(when(n < 3, 0.0)
        .otherwise(st.getField("top3_n").cast("double") / (n - 2)), 6)
        .as("top3_frac"))
  }

  /** int8 embedding quantization under the gate: per-vector symmetric
    * scale, portable round-half-up, and the reconstruction error bounded
    * by scale/2 — integer sums/extrema plus rounded doubles so the oracle
    * replays every element with DuckDB list arithmetic. */
  private def embeddingQuantize(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Vectors
    val base = t(s, dir, "embeddings").select(col("vec_id"),
      col("embedding").as("__e"),
      Vectors.int8Scale(col("embedding")).as("__s"))
    base.select(col("vec_id"), col("__e"), col("__s"),
        Vectors.quantizeInt8(col("__e"), col("__s")).as("__q"))
      .select(col("vec_id"),
        round(col("__s"), 6).as("scale"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("__q")).as("q_min"),
        array_max(col("__q")).as("q_max"),
        round(array_max(zip_with(col("__e"), col("__q"),
          (ev, qv) => abs(ev.cast("double") - qv.cast("double") * col("__s")))), 6)
          .as("max_abs_err"))
  }

  /** PII redaction under the gate. The corpus carries no PII, so a
    * deterministic contact line (email + intl phone + IPv4 derived from
    * doc_id) is injected first — the scrub provably fires on every row and
    * the oracle replays injection + redaction with the same RE2-safe
    * patterns. */
  private def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"),
      lit(" contact doc"), col("doc_id").cast("string"),
      lit("@example.com or +155500012"), (col("doc_id") % 100).cast("string"),
      lit(" at 10.0.0."), (col("doc_id") % 256).cast("string"))
    val scrubbed = TF.scrubPii(injected)
    t(s, dir, "documents").select(col("doc_id"),
      md5(scrubbed).as("scrubbed_md5"),
      length(scrubbed).cast("long").as("n_chars"),
      regexp_count(scrubbed, lit("<EMAIL>|<PHONE>|<IP>")).cast("long")
        .as("n_redactions"))
  }

  /** Deterministic training-mix sampling: languages kept at per-stratum
    * rates via the md5-prefix gate (same X2-split hash bridge), exactly
    * reproduced by the oracle. */
  private def stratifiedSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Sampling.stratifiedSample(
      t(s, dir, "documents").select(col("doc_id"), col("lang")),
      "doc_id", "lang",
      rates = Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1, seed = "mix1")

  /** Eval-set decontamination: documents with doc_id % 10 == 0 stand in for
    * a held-out benchmark; every other document sharing a word 8-gram with
    * them is flagged with its overlap count. Broadcast eval grams — the
    * corpus side never shuffles its text. */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.functions.Decontam.contaminated(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "text", "doc_id", n = 8)
  }

  /** Bloom-filter decontamination — the 100 TB shape of `decontaminate`:
    * the same eval set collapsed to a 2^20-bit / 5-probe Bloom filter
    * (~130 KB regardless of gram count), corpus membership as a scan-stage
    * expression with no gram explode and no join. The exact count rides
    * beside the bloom count, so `bloom >= exact` (one-sided error) is
    * visible in the output itself. */
  private def bloomDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.functions.Decontam.contaminatedBloom(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "text", "doc_id", n = 8, numProbes = 5, mBits = 1 << 20)
  }

  /** Feature drift: PSI of purchase values against the click-value
    * baseline's deciles (the train-vs-serve distribution check). */
  private def driftPsiQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    Drift.psi(ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"), "value", nBins = 10)
  }

  /** Mix plan EXECUTION: the corpus the 1M-token temperature plan
    * describes, with multi-epoch repetition + fractional-epoch sampling. */
  private def mixExecuteQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val plan = graft.functions.Mix.temperatureMix(docs, "source", "text",
      budgetTokens = 1000000L)
    graft.functions.Mix.materializeMix(docs, "source", "doc_id", plan, "mix")
  }

  /** Deterministic negative sampling: 5 never-purchased parts per customer
    * from the dense part-key space (md5 slot hashing, anti-join positives). */
  private def negativeSampleQ(s: SparkSession, dir: String): DataFrame = {
    val inter = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    graft.functions.Sampling.negativeSample(inter, "o_custkey", "l_partkey",
      nItems = 2000L, k = 5, seed = "neg")
  }

  /** Top-50 PMI collocations (corpus phrase detection). */
  private def pmiCollocationsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.UnigramLM.pmiCollocations(
      t(s, dir, "documents"), "text", minCount = 5L, k = 50)

  /** Categorical drift: event-type mix of the second half of the month
    * against the first half. */
  private def driftCatQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cut = lit("2024-01-16").cast("timestamp")
    Drift.psiCategorical(ev.filter(col("ts") < cut),
      ev.filter(col("ts") >= cut), "event_type")
  }

  /** The prefix-sum skew path must give bit-identical answers to the
    * bucket join — same oracle SQL as pit_window_agg. */
  private def pitWindowAggPrefixQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    PitWindowAgg.trailingAggPrefix(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"),
      "user_id", "ts", "ts", "value", windowSec = 3600L)
  }

  /** The window LADDER (1h/6h/24h) in one join: count+sum of clicks per
    * purchase label across all three trailing windows. */
  private def pitWindowLadderQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    PitWindowAgg.trailingAggLadder(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"),
      "user_id", "ts", "ts", "value",
      windowsSec = Seq(3600L, 21600L, 86400L))
  }

  /** Expectation-suite validation over orders: one full-scan aggregate for
    * the scalar rules + a uniqueness groupBy + an FK anti-join. The range
    * rule is deliberately tight so the report shows non-zero violations. */
  private def validateGate(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Validate._
    validate(t(s, dir, "orders"), Seq(
      NotNull("o_custkey"),
      InRange("o_totalprice", 0.0, 200000.0),
      Matches("o_orderpriority", "^[1-5]-"),
      Unique(Seq("o_orderkey")),
      RefIntegrity("o_custkey", t(s, dir, "customer"), "c_custkey")))
  }

  /** PIT trailing-window aggregate features: per purchase label, the count
    * and sum of the user's clicks in the preceding hour (half-open — the
    * label instant excluded, as-of no-leakage discipline). */
  private def pitWindowAggQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    PitWindowAgg.trailingAgg(
      ev.filter(col("event_type") === "purchase"),
      ev.filter(col("event_type") === "click"),
      "user_id", "ts", "ts", "value", windowSec = 3600L)
  }

  /** FORWARD label windows — the mirror of pit_window_agg: per click
    * anchor, did the user purchase within the NEXT hour (label), how many
    * times, for how much, and when first — training labels minted from
    * future outcomes, strict "> anchor" start. */
  private def labelWindowQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    graft.ops.LabelWindow.forwardLabel(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "user_id", "ts", "ts", "value", horizonSec = 3600L)
  }

  /** Top-5 TF-IDF keywords per document (tagging / topic seeding). */
  private def tfidfKeywordsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Retrieval.tfidfKeywords(
      t(s, dir, "documents"), "doc_id", "text", k = 5)

  /** JSONL export roundtrip: documents → md5-sharded shard=N/ jsonl dirs →
    * read back with a pinned schema. The read-back rows (incl. the
    * recovered shard partition column) must equal the table + the shard
    * rule — write/read fidelity and sharding determinism in one gate. */
  private def jsonlExport(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    graft.sources.Writers.exportJsonl(
      t(s, dir, "documents").select(col("doc_id"), col("source"), col("text")),
      tmp, "doc_id", shards = 8)
    graft.sources.Writers.readJsonl(s, tmp,
      org.apache.spark.sql.types.StructType.fromDDL(
        "doc_id BIGINT, source STRING, text STRING, shard BIGINT"))
      .select(col("doc_id"), col("source"), col("text"), col("shard"))
  }

  /** Token-budget selection: best-quality docs per source until the running
    * token total crosses the budget (first-fit greedy). */
  private def tokenBudgetSelectQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Mix.tokenBudgetSelect(t(s, dir, "documents"), "source",
      "doc_id", "text", budgetTokens = 600L)

  /** Span-level exact duplication (Lee et al. ExactSubstr): 10-grams shared
    * by >= 2 documents, merged per doc into islands with covered-token
    * fractions — catches boilerplate stitched into otherwise-unique docs. */
  private def dupSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(t(s, dir, "documents"), "text", "doc_id", n = 10)

  /** Exact-substring removal: every duplicated-span island cut out of the
    * text (the destructive half of Lee et al. ExactSubstr). */
  private def scrubDupSpansQ(s: SparkSession, dir: String): DataFrame =
    Dedup.scrubDupSpans(t(s, dir, "documents"), "text", "doc_id", n = 10)

  private def annTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Vectors.annTopK(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") < 10), "vec_id", "embedding", k = 10)
  }

  private def minhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)

  private def simhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(t(s, dir, "documents"), "text", "doc_id", maxHamming = 6)

  /** Bounded simhash scale path (Manku et al. 6-choose-3 block keys):
    * full recall at Hamming ≤ 3 by pigeonhole + exact verify, so the
    * oracle is the plain all-pairs Hamming predicate — no banding replica
    * needed. */
  private def simhashNearDupsBounded(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupsBounded(t(s, dir, "documents"), "text", "doc_id",
      maxHamming = 3)

  /** Incremental dedup under the gate: corpus signatures (docs with
    * doc_id % 5 != 4) are persisted as a versioned table and READ BACK —
    * the reuse artifact — then the "new batch" (doc_id % 5 == 4) is
    * deduped against them; only pairs touching the batch are reported.
    * Oracle = the full-corpus LSH replay filtered to those pairs. */
  private def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val isNew = col("doc_id") % 5 === 4
    val tmp = java.nio.file.Files.createTempDirectory("graft_sigs").toString
    graft.sources.Writers.writeVersioned(
      Dedup.minhashSignatureTable(docs.filter(!isNew), "text", "doc_id",
        shingleK = 5, numHashes = 64), s"$tmp/sigs")
    Dedup.minhashNearDupsIncremental(
      graft.sources.Writers.readLatest(s, s"$tmp/sigs"),
      docs, docs.filter(isNew), "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)
  }

  /** Pair → cluster resolution over the MinHash near-dup graph (same
    * parameters as minhash_near_dups): each duplicate-involved document
    * mapped to the min id reachable through the pair graph; the oracle
    * recomputes the pairs with the full LSH replay and closes them with a
    * recursive transitive closure. */
  private def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterPairs(
      minhashNearDups(s, dir).select(col("idA"), col("idB")))

  /** Same cluster closure via large-star/small-star contraction — the
    * O(log n)-round scale path for high-diameter pair graphs; SAME
    * oracle as dedup_clusters (one truth, two algorithms). */
  private def dedupClustersStar(s: SparkSession, dir: String): DataFrame =
    Dedup.clusterPairsStar(
      minhashNearDups(s, dir).select(col("idA"), col("idB")))

  /** Incremental closure maintenance under the gate: the corpus labeling
    * (pairs among doc_id % 5 != 4) is built first, then the batch's pairs
    * (any pair touching % 5 == 4) fold in via clusterPairsIncremental —
    * historical pairs never re-closed. SAME oracle as dedup_clusters:
    * incremental ≡ full recompute, proven by DuckDB's closure over ALL
    * pairs (the third algorithm on the one truth). */
  private def dedupClustersIncremental(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashNearDups(s, dir).select(col("idA"), col("idB"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isNew = (c: org.apache.spark.sql.Column) => c % 5 === 4
    val oldPairs = pairs.where(!isNew(col("idA")) && !isNew(col("idB")))
    val newPairs = pairs.where(isNew(col("idA")) || isNew(col("idB")))
    val labels = Dedup.clusterPairsStar(oldPairs)
    val out = Dedup.clusterPairsIncremental(labels, newPairs)
    pairs.unpersist()
    out
  }

  private def cosineNearDups(s: SparkSession, dir: String): DataFrame =
    Vectors.cosineNearDups(t(s, dir, "embeddings"), "vec_id", "embedding",
      numPlanes = 16, threshold = 0.4)

  /** Survivorship merge over the near-dup clusters: per cluster, each
    * field independently from the highest-(n_chars, doc_id) member that
    * has it non-null (lang/source deterministically nulled on some
    * members to exercise cross-member completion). */
  private def goldenRecordQ(s: SparkSession, dir: String): DataFrame = {
    // adaptive closure (degree-probe picks propagation on shallow dup
    // graphs, star on sparse/chain ones, star fallback if unconverged);
    // the fixed-algorithm cross-checks live in dedup_clusters (propagation)
    // and dedup_clusters_star on the same oracle
    val clusters = Dedup.clusterPairsAuto(
      minhashNearDups(s, dir).select(col("idA"), col("idB")))
    val recs = t(s, dir, "documents").join(clusters, "doc_id")
      .select(col("cluster_id"),
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"),
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .otherwise(col("source")).as("source"),
        col("n_chars"),
        (col("n_chars") * 10000000L + col("doc_id")).as("__prio"))
    Dedup.goldenRecord(recs, "cluster_id", col("__prio"),
      Seq("lang", "source", "n_chars"))
  }

  /** Per-session ordered event-type journeys (30-min gap) — the
    * sequence-model export beside session_stats' scalar rollup. */
  private def sessionExportQ(s: SparkSession, dir: String): DataFrame =
    ops.Sessionize.sessionExport(events(s, dir), "user_id", "ts",
      "event_id", "event_type", gapSec = 1800L)

  /** Split-conformal regression interval: OLS price-from-quantity on the
    * train split, |residual| q90 on the calibration split (nearest-rank
    * at ⌈0.9·(n+1)⌉), coverage measured on the held-out test split —
    * leakage-safe uncertainty the judged model never saw. */
  private def conformalInterval(s: SparkSession, dir: String): DataFrame = {
    // fanOut + persist: the split-keyed projection feeds FIVE downstream
    // passes (train agg, two calibration row-number passes, quantile agg,
    // test coverage) — profiled as five ~0.6-1.0 s scan+md5 stages on the
    // 3-partition lineitem scan. One fanned materialization replaces them
    // (Bench's per-query cleanup clears the cache after the timer).
    val li = Dedup.fanOut(t(s, dir, "lineitem")
        .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"))
            .as("__k"),
          col("l_quantity").cast("long").as("x"),
          col("l_extendedprice").cast("decimal(18,2)").as("y")))
      .withColumn("__split",
        functions.expressions.Md5Long(concat(col("__k"), lit("|cf")))
          .bitwiseAND(lit(Long.MaxValue)) % 4)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val train = li.where(col("__split") <= 1)
    val t0 = train.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx")).collect()(0)
    val empty = t0.getLong(0) == 0L // empty-table sums are NULL
    val nD = t0.getLong(0).toDouble
    val sxD = if (empty) 0.0 else t0.getLong(1).toDouble
    val syD = if (empty) 0.0 else t0.getDecimal(2).doubleValue
    val sxyD = if (empty) 0.0 else t0.getDecimal(3).doubleValue
    val sxxD = if (empty) 0.0 else t0.getLong(4).toDouble
    val b1 = if (empty) 0.0
      else (nD * sxyD - sxD * syD) / (nD * sxxD - sxD * sxD)
    val b0 = if (empty) 0.0 else (syD - b1 * sxD) / nD
    val resid = round(abs(col("y").cast("double") -
      (lit(b0) + lit(b1) * col("x").cast("double"))), 9)
    val cal = li.where(col("__split") === 2)
      .select(col("__k"), resid.as("__r"))
    val nCal = broadcast(cal.agg(count(lit(1)).as("__nc")))
    val q = broadcast(Materialize
      .withDistributedRowNumber(cal, Seq(col("__r"), col("__k")))
      .crossJoin(nCal)
      .where(col("row_number") ===
        least(expr("(9 * (__nc + 1) + 9) div 10"), col("__nc")))
      .agg(min(col("__r")).as("__q"), min(col("__nc")).as("__ncal")))
    val test = li.where(col("__split") === 3)
      .select(resid.as("__r"))
    test.crossJoin(q)
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__r") <= col("__q"), 1L).otherwise(0L)).as("__hits"),
        min(col("__q")).as("__qv"), min(col("__ncal")).as("__nc"))
      .select(lit(t0.getLong(0)).as("n_train"), col("__nc").as("n_cal"),
        col("n_test"), round(lit(b0), 6).as("b0"), round(lit(b1), 6).as("b1"),
        col("__qv").as("q90"),
        round(col("__hits").cast("double") / col("n_test"), 6)
          .as("coverage"))
  }

  // ------------------------------------------------------------ O6: preview

  private def sourcePreview(s: SparkSession, dir: String): DataFrame =
    events(s, dir).orderBy(col("event_id")).limit(20)
      .select(col("event_id"), col("event_type"), col("value"))

  // ---------------------------------------- T3: DataFrame transformation

  /** T3 through the catalog: a Scala-closure transformation over two
    * registered primary sources, resolved via the DAG. */
  private def dfTransform(s: SparkSession, dir: String): DataFrame = {
    val cat = new Catalog(s)
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerSource(SourceVariant(ResourceId("customer"),
      PrimaryData(s"$dir/customer.parquet")))
    cat.registerSource(SourceVariant(ResourceId("seg_rev"), DfTransformation(
      Seq(ResourceId("orders"), ResourceId("customer")),
      { case Seq(o, c) =>
        o.join(c, o("o_custkey") === c("c_custkey"))
          .groupBy(c("c_mktsegment"))
          .agg(count("*").as("n"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
      })))
    cat.resolve(ResourceId("seg_rev"))
  }

  // ----------------------- T5/M6: incremental refresh over version dirs

  /** Two incremental refresh cycles: batch 1 builds the snapshot, batch 2
    * upserts only the delta; the final snapshot must equal a full recompute
    * (which is exactly what the oracle computes). */
  private def incrementalRefresh(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val ev = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"), col("event_id"))
    graft.sources.Writers.writeVersioned(
      ev.filter(col("event_id") < 500).select("entity", "value", "ts"), s"$tmp/ev")
    graft.streaming.IncrementalRunner.refreshLatest(s, s"$tmp/ev", s"$tmp/snap")
    graft.sources.Writers.writeVersioned(
      ev.filter(col("event_id") >= 500).select("entity", "value", "ts"), s"$tmp/ev")
    graft.streaming.IncrementalRunner.refreshLatest(s, s"$tmp/ev", s"$tmp/snap")
    graft.sources.Writers.readLatest(s, s"$tmp/snap")
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))
  }

  // --------------------- K1/K5/T7: versioned/partitioned write round-trip

  /** K5 date-partitioned versioned write, read-back through the partition
    * column, then a T7 atomic replace with a filtered set; the final
    * readLatest sees only the replaced version. */
  private def versionedWriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_vw").toString
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < "1995-04-01") // one quarter ≈ 90 partitions
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    graft.sources.Writers.writeVersioned(o, s"$tmp/t",
      Some(graft.catalog.DailyPartition("o_orderdate")))
    val back = graft.sources.Writers.readLatest(s, s"$tmp/t") // has __date partition col
    graft.sources.Writers.atomicReplace(s,
      back.filter(col("__date") < "1995-02-15"), s"$tmp/t")
    graft.sources.Writers.readLatest(s, s"$tmp/t")
      // partition-column type inference may read __date back as DATE —
      // normalize to the yyyy-MM-dd string for the oracle compare
      .groupBy(date_format(col("__date").cast("date"), "yyyy-MM-dd").as("day"))
      .agg(count("*").as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
  }

  // ------------------------------------------- S1/K2: CSV write + scan

  private def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"))
    val out = graft.sources.Writers.writeCsv(src, tmp)
    graft.sources.Readers.csv(s, out)
      .filter(col("event_id") < 1000)
      .select(col("event_id").cast("long"), col("user_id").cast("long"),
        col("event_type"), col("value").cast("double"))
  }

  /** ORC round trip — the second columnar lake format: events written to
    * a versioned ORC dir and read back through the vectorized ORC scan;
    * oracle is the identity (timestamps re-emitted as epoch ms). */
  private def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), col("ts"))
    val out = graft.sources.Writers.writeOrc(src, tmp)
    graft.sources.Readers.orc(s, out)
      .filter(col("event_id") < 1000)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), unix_millis(col("ts")).as("ts_ms"))
  }

  // ------------------- O1/O2/O3/K7: online store load + serving rows

  /** Chunk-copies the click materialization into the online store, then
    * assembles serving rows (precomputed + on-demand) for the full entity
    * domain; missing entities exercise the None path. */
  private def onlineServing(s: SparkSession, dir: String): DataFrame = {
    val store = new graft.serving.OnlineStore
    val fClick = Materialize.latest(
      events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("entity"), col("value"), col("ts")),
      "entity", "value", Some("ts"))
    store.load("f_click", fClick)
    store.registerOnDemand("f_dbl", (_, pre) =>
      pre.headOption.map(_.asInstanceOf[Double] * 2.0).getOrElse(-1.0))
    val rows = (0L until 150L).map { e =>
      val Seq(click, dbl) = store.features(Seq("f_click", "f_dbl"), e)
      org.apache.spark.sql.Row(e, click.map(_.asInstanceOf[Double]).orNull,
        dbl.get.asInstanceOf[Double])
    }
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("entity",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("f_click",
          org.apache.spark.sql.types.DoubleType, nullable = true),
        org.apache.spark.sql.types.StructField("f_dbl",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
  }

  /** The gRPC serving WIRE under the correctness gate: the same
    * latest-click materialization as online_serving, loaded into an
    * [[graft.serving.OnlineStore]] and served back over
    * [[graft.serving.GrpcServe]]'s real gRPC/HTTP2 endpoint — one
    * multi-entity FeatureServe request whose bytes are hand-decoded from
    * the published protobuf wire spec. The oracle recomputes the latest
    * value per entity, so the ENTIRE wire path (request encode → HTTP2 →
    * server parse → store lookup → Value-oneof encode → client decode)
    * is hash-checked, not just spec-tested. Entity set is the fixed
    * 150-user domain (the online_serving convention). */
  private def grpcServeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.{R, W}
    val store = new OnlineStore(new InProcessKv)
    val fClick = Materialize.latest(
      events(s, dir).filter(col("event_type") === "click")
        .select(col("user_id").as("entity"), col("value"), col("ts")),
      "entity", "value", Some("ts"))
    store.load("f_click", fClick)
    val srv = new GrpcServe(store).start()
    val ch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", srv.boundPort).usePlaintext().build()
    try {
      val req = new W
      req.msg(1)(_.str(1, "f_click"))
      (0L until 150L).foreach(e =>
        req.msg(2)(m => { m.str(1, "user"); m.str(3, e.toString) }))
      val resp = org.sparkproject.connect.grpc.stub.ClientCalls
        .blockingUnaryCall(ch,
          GrpcServe.method("FeatureServe",
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, req.result())
      // FeatureRow.value_lists: one ValueList per requested entity, in order
      val r = new R(resp)
      val values = scala.collection.mutable.ArrayBuffer.empty[Any]
      var more = true
      while (more) r.readTag() match {
        case (0, _) => more = false
        case (2, _) =>
          val vl = r.readSlice()
          var got: Any = null
          var vm = true
          while (vm) vl.readTag() match {
            case (0, _) => vm = false
            case (1, _) => got = GrpcServe.readValue(vl.readSlice())
            case (_, wt) => vl.skip(wt)
          }
          values += got
        case (_, wt) => r.skip(wt)
      }
      val rows = values.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong,
          Option(v).map(_.asInstanceOf[Double].asInstanceOf[Any]).orNull)
      }
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("entity",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("f_click",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    } finally { ch.shutdownNow(); srv.stop() }
  }

  /** The Metadata REGISTRATION plane under the correctness gate: a
    * hand-encoded wire client registers a primary source and a SQL
    * transformation over [[graft.serving.MetadataServe]]'s real gRPC/HTTP2
    * endpoint (the `featureform.serving.metadata.proto.Metadata` service,
    * reference metadata.proto:19-71), then reads the registration BACK over
    * the wire via GetEquivalent, decodes the returned SourceVariant's
    * SQLTransformation.query from raw response bytes, and executes the
    * DECODED text through the server-mutated catalog. The entire
    * registration path (request encode → HTTP2 → server parse → catalog →
    * variant re-encode → client decode → Spark execution) feeds the
    * hash-compared result — if any wire stage corrupted the query or the
    * source binding, the aggregate would not match the oracle. */
  private def grpcMetadataRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.W
    val cat = new Catalog(s)
    val srv = new MetadataServe(cat).start()
    val ch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", srv.boundPort).usePlaintext().build()
    try {
      def unary(rpc: String, req: Array[Byte]): Array[Byte] =
        org.sparkproject.connect.grpc.stub.ClientCalls.blockingUnaryCall(ch,
          MetadataServe.method(MetadataServe.ServiceName, rpc,
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, req)
      // register the primary source, then the templated SQL transformation
      val p = new W
      p.msg(1) { sv =>
        sv.str(1, "orders_src"); sv.str(2, "v1")
        sv.msg(15)(_.msg(3)(_.str(1, s"$dir/orders.parquet")))
      }
      unary("CreateSourceVariant", p.result())
      val q =
        """SELECT o_custkey AS entity,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
          |  COUNT(*) AS n
          |FROM {{orders_src.v1}} GROUP BY o_custkey""".stripMargin
      val tr = new W
      tr.msg(1) { sv =>
        sv.str(1, "cust_rev"); sv.str(2, "v1")
        sv.msg(14)(_.msg(1)(_.str(1, q)))
      }
      unary("CreateSourceVariant", tr.result())
      // read it back over the wire: GetEquivalent returns the FULL stored
      // SourceVariant for an equivalent probe under a different variant
      val eq = new W
      eq.msg(2)(_.msg(4) { sv =>
        sv.str(1, "cust_rev"); sv.str(2, "probe")
        sv.msg(14)(_.msg(1)(_.str(1, q)))
      })
      val hit = unary("GetEquivalent", eq.result())
      // decode ResourceVariant{source_variant=4{transformation=14{sql=1{query=1}}}}
      val sv = MetadataServe.firstSlice(hit, 4).getOrElse(
        sys.error("GetEquivalent returned no source_variant"))
      var decoded = ""
      var variant = ""
      var more = true
      while (more) sv.readTag() match {
        case (0, _) => more = false
        case (2, _) => variant = sv.readString()
        case (14, _) =>
          val t = sv.readSlice()
          var tm = true
          while (tm) t.readTag() match {
            case (0, _) => tm = false
            case (1, _) =>
              val sql = t.readSlice()
              var sm = true
              while (sm) sql.readTag() match {
                case (0, _) => sm = false
                case (1, _) => decoded = sql.readString()
                case (_, wt) => sql.skip(wt)
              }
            case (_, wt) => t.skip(wt)
          }
        case (_, wt) => sv.skip(wt)
      }
      require(variant == "v1", s"equivalent matched wrong variant '$variant'")
      require(decoded.nonEmpty, "decoded transformation query is empty")
      // execute the DECODED query text through the server-mutated catalog
      graft.transform.SqlTransform.run(s, decoded, rid => cat.resolve(rid))
    } finally { ch.shutdownNow(); srv.stop() }
  }

  /** Arrow Flight under the correctness gate: the click events served
    * over [[graft.serving.FlightServe]]'s real gRPC/HTTP2 FlightService
    * endpoint (the public Flight.proto the reference's streamer speaks),
    * DoGet frames hand-decoded, the IPC stream reassembled client-side,
    * and the values read back through Arrow's own ArrowStreamReader into
    * the result frame — so the server's header/body split, the transport,
    * and the IPC encoding are all inside the hash compare. */
  private def flightRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.W
    import scala.jdk.CollectionConverters._
    val served = events(s, dir).filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
    val srv = new FlightServe().start()
    srv.register("events/clicks", served)
    val ch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", srv.boundPort).usePlaintext().build()
    try {
      val ticket = { val w = new W; w.str(1, "events/clicks"); w.result() }
      val frames = org.sparkproject.connect.grpc.stub.ClientCalls
        .blockingServerStreamingCall(ch,
          FlightServe.method("DoGet",
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.SERVER_STREAMING),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, ticket)
        .asScala.toSeq
      val alloc = new org.apache.arrow.memory.RootAllocator(Long.MaxValue)
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(FlightServe.reassembleIpc(frames)),
        alloc)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      try {
        val root = reader.getVectorSchemaRoot
        while (reader.loadNextBatch()) {
          val idV = root.getVector("event_id")
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          val userV = root.getVector("user_id")
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          val tsV = root.getVector("ts_ms")
            .asInstanceOf[org.apache.arrow.vector.BigIntVector]
          val valV = root.getVector("value")
            .asInstanceOf[org.apache.arrow.vector.Float8Vector]
          var i = 0
          while (i < root.getRowCount) {
            rows.add(org.apache.spark.sql.Row(
              idV.get(i), userV.get(i), tsV.get(i), valV.get(i)))
            i += 1
          }
        }
      } finally { reader.close(); alloc.close() }
      s.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ts_ms",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    } finally { ch.shutdownNow(); srv.stop() }
  }

  /** Staged deletion lifecycle under the correctness gate — the reference's
    * MarkForDeletion → staged → FinalizeDeletion / PruneResource two-phase
    * protocol (metadata.proto:46-51, resources_repository.go:251-420) on a
    * planted catalog DAG. Deterministic by construction, so the oracle is
    * the literal expected step trace: a mark with live dependents is
    * blocked (and counts them), finalizing a staged resource fires the
    * physical hook exactly once, pruning stages the whole downstream
    * closure, and finalizing the closure leaves zero live resources. */
  private def stagedDeletion(s: SparkSession, dir: String): DataFrame = {
    val cat = new Catalog(s)
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerFeature(FeatureVariant(ResourceId("f_rev"), ResourceId("orders"),
      graft.types.ResourceSchema("o_custkey", "o_totalprice", Some("o_orderdate"))))
    cat.registerLabel(LabelVariant(ResourceId("lbl"), ResourceId("orders"),
      Seq(EntityMapping("customer", "o_custkey")), "o_totalprice"))
    cat.registerTrainingSet(TrainingSetVariant(ResourceId("ts1"),
      ResourceId("lbl"), Seq(ResourceId("f_rev"))))
    val srcKey = ResourceKey("SOURCE", "orders.default")
    val tsKey = ResourceKey("TRAINING_SET", "ts1.default")
    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    // 1. marking the source is blocked by its live dependents
    val blocked =
      try { cat.markForDeletion(srcKey); 0L }
      catch { case _: IllegalStateException => 1L }
    steps += (("mark_source", "blocked", blocked))
    steps += (("mark_source", "live_dependents", cat.dependentsOf(srcKey).size.toLong))
    // 2. the leaf (training set) marks cleanly and finalizes with the
    //    physical hook firing exactly once
    cat.markForDeletion(tsKey)
    steps += (("mark_tset", "staged", cat.allStaged.size.toLong))
    var fired = 0L
    cat.finalizeDeletion(tsKey, _ => fired += 1)
    steps += (("finalize_tset", "physical_fired", fired))
    steps += (("finalize_tset", "live_tsets", cat.allTrainingSets.size.toLong))
    // 3. prune cascades: feature + label + the source itself
    val pruned = cat.pruneResource(srcKey)
    steps += (("prune_source", "staged", pruned.size.toLong))
    // 4. finalize the closure — nothing live remains
    pruned.foreach(cat.finalizeDeletion(_))
    steps += (("finalize_all", "live_resources",
      (cat.allSources.size + cat.allFeatures.size + cat.allLabels.size +
        cat.allTrainingSets.size).toLong))
    import s.implicits._
    steps.toSeq.toDF("step", "metric", "value")
  }

  /** Blocking unary call on the Metadata gRPC service over `ch` — the
    * wire-lifecycle gates' shared client helper (one definition, so a
    * future call-option/deadline change cannot drift between gates). */
  private def metaUnary(ch: org.sparkproject.connect.grpc.ManagedChannel,
                        rpc: String, req: Array[Byte]): Array[Byte] =
    org.sparkproject.connect.grpc.stub.ClientCalls.blockingUnaryCall(ch,
      graft.serving.MetadataServe.method(
        graft.serving.MetadataServe.ServiceName, rpc,
        org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
      org.sparkproject.connect.grpc.CallOptions.DEFAULT, req)

  /** Await a ledger run reaching `want` (bounded poll) — the gated
    * lifecycle queries' deterministic rendezvous with the daemon. */
  private def awaitRun(runner: graft.sched.TaskRunner, task: String,
                       key: String, want: String,
                       timeoutMs: Long = 120000L): graft.sched.TaskRun = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var cur = runner.latestRun(task, key)
    while (!cur.exists(_.status == want) &&
           System.currentTimeMillis() < deadline) {
      Thread.sleep(20)
      cur = runner.latestRun(task, key)
    }
    cur.filter(_.status == want).getOrElse(sys.error(
      s"run $task/$key never reached '$want' (now ${cur.map(_.status)})"))
  }

  /** The always-on coordinator daemon under the correctness gate — the
    * reference's scheduler loop (coordinator/scheduler.go:60-91 spawning
    * executor.go:42-117 per unfinished run) closing REGISTRATION into
    * EXECUTION: a wire client's CreateTaskRun lands a `created` ledger row,
    * the polling [[graft.sched.Scheduler]] claims it through the
    * cross-process locker, executes the bound body (a Spark count over
    * orders), stamps its scheduler id, and GetRunMetadata reads back READY
    * over the wire. Then a second, deliberately-blocking run is cancelled
    * MID-FLIGHT over the wire — SetRunStatus(CANCELLED) kills the attempt
    * (Spark job group + body thread) — and lands terminal `cancelled` with
    * zero failed-retry rows. Oracle = the literal step trace, with the
    * body's row count replayed from the same parquet. */
  private def schedulerLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.{R, W}
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft_sched_gate").toString
    val runner = new graft.sched.TaskRunner(s, stateDir,
      maxAttempts = 3, backoffMs = 1)
    val srv = new MetadataServe(new Catalog(s), tasks = Some(runner)).start()
    val ch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", srv.boundPort).usePlaintext().build()
    @volatile var taskRows = -1L
    val spinStarted = new java.util.concurrent.CountDownLatch(1)
    val daemon = new graft.sched.Scheduler(runner, "sched-gate", {
      case "count_orders" => Some(() => {
        taskRows = s.read.parquet(s"$dir/orders.parquet").count(); taskRows
      })
      case "spin" => Some(() => {
        spinStarted.countDown()
        Thread.sleep(600000L) // interruptible: only the cancel ends this
        ()
      })
      case "cron_count" => Some(() => 1L)
      case _ => None
    }, pollIntervalMs = 25L,
      // the SCHEDULE trigger leg: a cron string alone, no client call,
      // must turn into a minted + executed run
      schedules = () => Seq("cron_count" -> "* * * * *"))
    try {
      def unary(rpc: String, req: Array[Byte]): Array[Byte] =
        org.sparkproject.connect.grpc.stub.ClientCalls.blockingUnaryCall(ch,
          MetadataServe.method(MetadataServe.TasksServiceName, rpc,
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, req)
      def createRun(task: String, name: String): Unit = {
        val w = new W; w.msg(1)(_.str(1, task)); w.str(2, name)
        unary("CreateTaskRun", w.result()); ()
      }
      /** (status enum, scheduler id, trigger type) from GetRunMetadata
        * over the wire — trigger type is proto3-default SCHEDULE(0)
        * unless the ON_APPLY enum is present; a SCHEDULE report must
        * also carry the ScheduleTrigger message (field 5). */
      def wireRun(task: String, run: String): (Long, String, Long) = {
        val w = new W
        w.msg(1)(_.str(1, run)); w.msg(2)(_.str(1, task))
        val r = new R(unary("GetRunMetadata", w.result()))
        var st = -1L; var sched = ""; var trig = 0L; var sawSchedMsg = false
        var more = true
        while (more) r.readTag() match {
          case (0, _) => more = false
          case (5, _) => sawSchedMsg = true; r.readSlice()
          case (6, _) => trig = r.readVarint()
          case (13, _) =>
            val sm = r.readSlice()
            var m2 = true
            while (m2) sm.readTag() match {
              case (0, _) => m2 = false
              case (1, _) => st = sm.readVarint()
              case (_, wt) => sm.skip(wt)
            }
          case (17, _) => sched = r.readString()
          case (_, wt) => r.skip(wt)
        }
        require(trig != 0L || sawSchedMsg,
          s"run $run reports SCHEDULE trigger without a ScheduleTrigger message")
        (st, sched, trig)
      }
      val steps =
        scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      // 1. registration alone does NOT execute: created over the wire
      createRun("count_orders", "mat-1")
      steps += (("create", "status", wireRun("count_orders", "mat-1")._1))
      // 2. the daemon turns it into execution
      daemon.start()
      awaitRun(runner, "count_orders", "mat-1", "success")
      val (st1, sched1, trig1) = wireRun("count_orders", "mat-1")
      steps += (("execute", "status", st1)) // READY
      steps += (("execute", "scheduler_id", if (sched1 == "sched-gate") 1L else 0L))
      steps += (("execute", "trigger", trig1)) // ON_APPLY
      steps += (("execute", "rows", taskRows))
      // 3. cancellation mid-run over the wire
      createRun("spin", "mat-2")
      require(spinStarted.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "spin run never started")
      val cw = new W
      cw.msg(1)(_.str(1, "mat-2")); cw.msg(2)(_.str(1, "spin"))
      cw.msg(3)(_.enum(1, 6)) // ResourceStatus.CANCELLED
      unary("SetRunStatus", cw.result())
      awaitRun(runner, "spin", "mat-2", "cancelled")
      steps += (("cancel", "status", wireRun("spin", "mat-2")._1))
      steps += (("cancel", "retried",
        runner.runs().count(r => r.task == "spin" && r.status == "failed").toLong))
      // 4. the SCHEDULE trigger: the cron schedule mints its due-tick run
      //    and the daemon executes it — registration + a schedule string
      //    becomes execution with no client in the loop
      val deadline = System.currentTimeMillis() + 120000L
      def cronRun() = runner.latestRuns()
        .find(r => r.task == "cron_count" && r.status == "success")
      var cr = cronRun()
      while (cr.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(20); cr = cronRun()
      }
      val cronRec = cr.getOrElse(sys.error("scheduled run never executed"))
      val (st3, sched3, trig3) = wireRun("cron_count", cronRec.runKey)
      steps += (("schedule", "status", st3))
      steps += (("schedule", "scheduler_id", if (sched3 == "sched-gate") 1L else 0L))
      steps += (("schedule", "trigger", trig3)) // SCHEDULE (proto3 default 0)
      import s.implicits._
      steps.toSeq.toDF("step", "metric", "value")
    } finally { daemon.stop(); ch.shutdownNow(); srv.stop() }
  }

  /** The daemon fleet's SELF-HEALING under the gate — the reference
    * scheduler's TaskStatusSyncInterval reconcile (coordinator/
    * scheduler.go:66-72, 94) with no client RPC in the loop: a crashed
    * coordinator's orphaned `running` ledger row (claim held by nobody)
    * is re-queued as `pending` by a surviving daemon's own sync pass,
    * then claimed and executed to success — with the outcome attempt
    * seeded PAST the re-queue row so the max-attempt index surfaces
    * READY, never a forever-PENDING burial. Oracle = the literal heal
    * trace, with the body's row count replayed from the same parquet. */
  private def schedRecovery(s: SparkSession, dir: String): DataFrame = {
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft_sched_heal").toString
    val runner = new graft.sched.TaskRunner(s, stateDir,
      maxAttempts = 3, backoffMs = 1)
    @volatile var orphanRows = -1L
    val daemon = new graft.sched.Scheduler(runner, "sched-heal", {
      case "mat_orders" => Some(() => {
        orphanRows = s.read.parquet(s"$dir/orders.parquet").count(); orphanRows
      })
      case _ => None
    }, pollIntervalMs = 25L, syncIntervalMs = 1L)
    try {
      // the crash artifact a dead coordinator leaves behind: a durable
      // running row whose execution claim nobody holds — backdated an
      // hour (the daemon's automatic sync only treats rows older than
      // orphanAfterMs as crashes, so a live external executor's fresh
      // RUNNING report is never swept)
      runner.record(graft.sched.TaskRun("mat_orders", "k1", 0, "running",
        System.currentTimeMillis() - 3600000L, 0L, None))
      daemon.start()
      awaitRun(runner, "mat_orders", "k1", "success")
      val trace = runner.runs().filter(_.task == "mat_orders")
      val fin = runner.latestRun("mat_orders", "k1").get
      val steps = Seq[(String, String, Long)](
        ("heal", "requeued", trace.count(r => r.status == "pending" &&
          r.error.exists(_.contains("re-queued by SyncUnfinishedRuns"))).toLong),
        ("heal", "attempt", fin.attempt.toLong),
        ("heal", "ready", if (fin.status == "success") 1L else 0L),
        ("heal", "rows", orphanRows),
        ("heal", "failed_rows",
          trace.count(_.status == "failed").toLong))
      import s.implicits._
      steps.toDF("step", "metric", "value")
    } finally daemon.stop()
  }

  /** One feature's WHOLE life across every wire plane in a single gated
    * chain — the reference client workflow end-to-end: provider + entity +
    * primary source + templated SQL transformation + feature registered
    * over the Metadata gRPC service → CreateTaskRun over the Tasks service
    * → the coordinator daemon materializes the feature into the online
    * store → served back over the FeatureServe gRPC endpoint (150 entities,
    * one multi-entity request) → MarkForDeletion / FinalizeDeletion over
    * the wire → the finalized feature is NOT_FOUND. The served values are
    * the hash-compared payload; the lifecycle assertions ride as negative
    * sentinel entities. */
  private def wireLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.{R, W}
    val cat = new Catalog(s)
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft_wire_life").toString
    val runner = new graft.sched.TaskRunner(s, stateDir,
      maxAttempts = 2, backoffMs = 1)
    val store = new OnlineStore(new InProcessKv)
    val msrv = new MetadataServe(cat, tasks = Some(runner)).start()
    val gsrv = new GrpcServe(store).start()
    val mch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", msrv.boundPort).usePlaintext().build()
    val gch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", gsrv.boundPort).usePlaintext().build()
    val daemon = new graft.sched.Scheduler(runner, "sched-life", {
      case "materialize_f_rev" => Some(() => {
        // the executor body the reference spawns per run: resolve the
        // registered transformation DAG, project the feature triple,
        // materialize one-row-per-entity into the online store
        val triple = cat.featureTriple(ResourceId("f_rev", "v1"))
        store.load("f_rev", Materialize.latestTriple(triple))
      })
      case _ => None
    }, pollIntervalMs = 25L)
    try {
      def munary(rpc: String, req: Array[Byte]): Array[Byte] =
        metaUnary(mch, rpc, req)
      def tunary(rpc: String, req: Array[Byte]): Array[Byte] =
        org.sparkproject.connect.grpc.stub.ClientCalls.blockingUnaryCall(mch,
          MetadataServe.method(MetadataServe.TasksServiceName, rpc,
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, req)
      // -------- 1. the registration plane (Metadata service, all wire)
      munary("CreateUser", { val w = new W; w.msg(1)(_.str(1, "alice")); w.result() })
      munary("CreateProvider", {
        val w = new W
        w.msg(1) { p =>
          p.str(1, "spark_prov"); p.str(2, "local spark")
          p.str(3, "SPARK_OFFLINE"); p.str(4, "spark"); p.str(5, "core")
        }
        w.result()
      })
      munary("CreateEntity", {
        val w = new W; w.msg(1)(e => { e.str(1, "customer"); e.str(2, "cust") })
        w.result()
      })
      munary("CreateSourceVariant", {
        val w = new W
        w.msg(1) { sv =>
          sv.str(1, "orders_raw"); sv.str(2, "v1")
          sv.msg(15)(_.msg(3)(_.str(1, s"$dir/orders.parquet")))
          sv.str(4, "alice"); sv.str(6, "spark_prov")
        }
        w.result()
      })
      val q =
        """SELECT o_custkey AS entity,
          |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
          |FROM {{orders_raw.v1}} GROUP BY o_custkey""".stripMargin
      munary("CreateSourceVariant", {
        val w = new W
        w.msg(1) { sv =>
          sv.str(1, "cust_rev"); sv.str(2, "v1")
          sv.msg(14)(_.msg(1)(_.str(1, q)))
          sv.str(4, "alice"); sv.str(6, "spark_prov")
        }
        w.result()
      })
      munary("CreateFeatureVariant", {
        val w = new W
        w.msg(1) { fv =>
          fv.str(1, "f_rev"); fv.str(2, "v1")
          fv.msg(3)(nv => { nv.str(1, "cust_rev"); nv.str(2, "v1") })
          fv.str(5, "customer"); fv.str(7, "alice")
          fv.msg(12)(c => { c.str(1, "entity"); c.str(2, "rev") })
          fv.msg(25)(_.enum(1, 3)) // FLOAT64
        }
        w.result()
      })
      // -------- 2. execution plane: Tasks service + the daemon
      daemon.start()
      tunary("CreateTaskRun", {
        val w = new W; w.msg(1)(_.str(1, "materialize_f_rev"))
        w.str(2, "mat-1"); w.result()
      })
      awaitRun(runner, "materialize_f_rev", "mat-1", "success")
      // -------- 3. serving plane: one multi-entity FeatureServe request
      val req = new W
      req.msg(1)(_.str(1, "f_rev"))
      (0L until 150L).foreach(e =>
        req.msg(2)(m => { m.str(1, "customer"); m.str(3, e.toString) }))
      val resp = org.sparkproject.connect.grpc.stub.ClientCalls
        .blockingUnaryCall(gch,
          GrpcServe.method("FeatureServe",
            org.sparkproject.connect.grpc.MethodDescriptor.MethodType.UNARY),
          org.sparkproject.connect.grpc.CallOptions.DEFAULT, req.result())
      val r = new R(resp)
      val values = scala.collection.mutable.ArrayBuffer.empty[Any]
      var more = true
      while (more) r.readTag() match {
        case (0, _) => more = false
        case (2, _) =>
          val vl = r.readSlice()
          var got: Any = null
          var vm = true
          while (vm) vl.readTag() match {
            case (0, _) => vm = false
            case (1, _) => got = GrpcServe.readValue(vl.readSlice())
            case (_, wt) => vl.skip(wt)
          }
          values += got
        case (_, wt) => r.skip(wt)
      }
      // -------- 4. deletion plane: mark → staged-readable → finalize → gone
      def featureId(): Array[Byte] = {
        val w = new W
        w.msg(1) { rid =>
          rid.msg(1)(nv => { nv.str(1, "f_rev"); nv.str(2, "v1") })
          rid.enum(2, 4) // FEATURE_VARIANT
        }
        w.result()
      }
      munary("MarkForDeletion", featureId())
      val stagedReadable =
        if (munary("GetStagedForDeletionResource", featureId()).nonEmpty) 1L else 0L
      munary("FinalizeDeletion", featureId())
      val goneAfterFinalize =
        try { munary("GetStagedForDeletionResource", featureId()); 0L }
        catch {
          case e: org.sparkproject.connect.grpc.StatusRuntimeException
            if e.getStatus.getCode.toString == "NOT_FOUND" => 1L
        }
      val rows = values.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong,
          Option(v).map(_.asInstanceOf[Double].asInstanceOf[Any]).orNull)
      } ++ Seq(
        org.apache.spark.sql.Row(-1L, stagedReadable.toDouble),
        org.apache.spark.sql.Row(-2L, goneAfterFinalize.toDouble),
        org.apache.spark.sql.Row(-3L,
          if (cat.allFeatures.isEmpty) 1.0 else 0.0))
      s.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("entity",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("f_rev",
            org.apache.spark.sql.types.DoubleType, nullable = true))))
    } finally {
      daemon.stop()
      mch.shutdownNow(); gch.shutdownNow(); msrv.stop(); gsrv.stop()
    }
  }

  // ----------------------- B3/O5: training-set stream combinators

  /** The LLM-pipeline mirror of [[wireLifecycle]] — one CORPUS's whole
    * life across the scheduler, streaming, curation, and export seams in
    * a single gated chain:
    *   1. a primary documents source + a templated SQL clean
    *      (`WHERE length(trim(text)) > 0`) registered over the Metadata
    *      gRPC wire, then a cron cadence registered on the resource via
    *      wire RequestScheduleChange (the reference's register step);
    *   2. the daemon reads the schedule back through
    *      [[graft.sched.Scheduler.catalogSchedules]], MINTS the refresh
    *      run at the due tick — no client in the loop — claims it,
    *      resolves the SERVER-registered transformation through the
    *      catalog DAG, and atomically publishes a versioned parquet
    *      snapshot (Writers.atomicReplace);
    *   3. the published snapshot is replayed through a STREAMING exact-
    *      dedup aggregation (fingerprint → min-id keeper,
    *      [[graft.streaming.StreamingDedup.exactKeepersFileStream]]);
    *   4. temperature mix weights are computed over the surviving corpus;
    *   5. survivors export as sharded JSONL and are READ BACK — the rows
    *      hashed against the oracle are the read-back joined to the
    *      weights, so registration, scheduling, execution, publish,
    *      streaming, curation, and export are ALL inside the compare.
    * Lifecycle assertions (cron-minted trigger, run READY, the daemon's
    * claim-time owner stamp, stream completeness, LATEST-pointer publish)
    * ride as negative-id sentinel rows the oracle pins literally. */
  private def corpusLifecycle(s: SparkSession, dir: String): DataFrame = {
    import graft.serving._
    import graft.serving.ProtoWire.W
    val cat = new Catalog(s)
    val stateDir =
      java.nio.file.Files.createTempDirectory("graft_corpus_life").toString
    val outBase =
      java.nio.file.Files.createTempDirectory("graft_corpus_pub").toString
    val runner = new graft.sched.TaskRunner(s, stateDir,
      maxAttempts = 2, backoffMs = 1)
    val msrv = new MetadataServe(cat, tasks = Some(runner)).start()
    val ch = org.sparkproject.connect.grpc.netty.NettyChannelBuilder
      .forAddress("127.0.0.1", msrv.boundPort).usePlaintext().build()
    @volatile var published: String = null
    val daemon = new graft.sched.Scheduler(runner, "sched-corpus", {
      case "docs_clean" => Some(() => {
        // the executor body: resolve the wire-registered transformation
        // through the catalog DAG and publish a versioned snapshot
        published = graft.sources.Writers.atomicReplace(s,
          cat.resolve(ResourceId("docs_clean", "v1")), outBase)
        published
      })
      case _ => None
    }, pollIntervalMs = 25L,
      // schedules come from the CATALOG — the wire RequestScheduleChange
      // below lands a `__schedule` property that catalogSchedules turns
      // into (task, cron) pairs, the reference's full register→schedule→
      // mint chain with no local schedule list; first sight mints the
      // latest past minute tick, so one run lands in the gate window
      schedules = () => graft.sched.Scheduler.catalogSchedules(cat))
    try {
      def munary(rpc: String, req: Array[Byte]): Array[Byte] =
        metaUnary(ch, rpc, req)
      // -------- 1. registration plane (all over the wire)
      munary("CreateSourceVariant", {
        val w = new W
        w.msg(1) { sv =>
          sv.str(1, "docs_raw"); sv.str(2, "v1")
          sv.msg(15)(_.msg(3)(_.str(1, s"$dir/documents.parquet")))
        }
        w.result()
      })
      munary("CreateSourceVariant", {
        val w = new W
        w.msg(1) { sv =>
          sv.str(1, "docs_clean"); sv.str(2, "v1")
          sv.msg(14)(_.msg(1)(_.str(1,
            "SELECT doc_id, source, text FROM {{docs_raw.v1}} " +
              "WHERE length(trim(text)) > 0")))
        }
        w.result()
      })
      // the refresh cadence registered OVER THE WIRE on the resource
      // (reference RequestScheduleChange, metadata.proto) — the daemon
      // reads it back via catalogSchedules, no client in the loop after
      munary("RequestScheduleChange", {
        val w = new W
        w.msg(1) { rid =>
          rid.msg(1)(nv => { nv.str(1, "docs_clean"); nv.str(2, "v1") })
          rid.enum(2, 7) // SOURCE_VARIANT
        }
        w.str(2, "* * * * *")
        w.result()
      })
      // -------- 2. scheduled execution plane: cron mint + daemon claim
      daemon.start()
      val deadline = System.currentTimeMillis() + 120000L
      def refreshRun(): Option[graft.sched.TaskRun] =
        runner.latestRuns().find(r => r.task == "docs_clean" &&
          r.status == "success")
      while (refreshRun().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val run = refreshRun().getOrElse(
        sys.error("cron-minted docs_clean refresh never reached success"))
      // DRAIN the daemon before assembling results: if the gate window
      // crosses a minute boundary the cron mints a SECOND refresh run,
      // and a concurrent atomicReplace could race the LATEST read below
      // (a torn publishOk sentinel, or a read inside the pointer flip's
      // delete→rename gap). stop() drains in-flight runs, so after it
      // either no second publish happened or it completed — both var and
      // pointer are stable and consistent either way (the transformation
      // is deterministic, so any published version carries identical
      // rows). The finally-stop below is then an idempotent no-op.
      daemon.stop()
      val logs = runner.runLogs("docs_clean", run.runKey)
      val cronMinted =
        if (logs.exists(_.startsWith(graft.sched.Scheduler.CronLogPrefix))) 1.0 else 0.0
      val ownerStamped =
        if (logs.contains(graft.sched.Scheduler.OwnerPrefix + "sched-corpus")) 1.0
        else 0.0
      // the LATEST pointer must resolve to the snapshot the body published
      val latestBytes = {
        val p = new org.apache.hadoop.fs.Path(s"$outBase/LATEST")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      val publishOk = if (latestBytes == published) 1.0 else 0.0
      // -------- 3. streaming curation over the published snapshot
      val snapshot = s.read.parquet(published)
      // state-partition floor for the keepers stream — this was the one
      // streaming site without it (JobProf r15: its stateful aggregate ran
      // one state store per session shuffle partition)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
      val keepers = try graft.streaming.StreamingDedup
        .exactKeepersFileStream(s, published)
      finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
      val cleanCount = snapshot.count()
      // coalesce: SUM over an EMPTY keeper table is NULL (the empty-input
      // robustness contract — an empty corpus must chain through cleanly)
      val streamComplete =
        if (keepers.agg(coalesce(sum(col("copies")), lit(0L)))
              .head.getLong(0) == cleanCount) 1.0
        else 0.0
      val survivors = keepers.select(col("fp"), col("doc_id"))
        .join(snapshot, Seq("doc_id"))
      // -------- 4. mix plan over the survivors
      val weights = graft.functions.Mix.temperatureMix(survivors, "source",
        "text", budgetTokens = 1000000L).select(col("source"), col("weight"))
      // -------- 5. JSONL export + read-back
      val exp =
        java.nio.file.Files.createTempDirectory("graft_corpus_jsonl").toString
      graft.sources.Writers.exportJsonl(
        survivors.select(col("doc_id"), col("source"), col("fp")),
        exp, "doc_id", shards = 4)
      val back = graft.sources.Writers.readJsonl(s, exp,
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id BIGINT, source STRING, fp STRING, shard BIGINT"))
      val out = back.join(weights, Seq("source"))
        .select(col("doc_id"), col("source"), col("fp"), col("shard"),
          col("weight"))
      val sentinels = Seq(
        (-1L, "__sentinel__", "cron_minted", 0L, cronMinted),
        (-2L, "__sentinel__", "run_ready", 0L, 1.0), // refreshRun() gated
        (-3L, "__sentinel__", "owner_stamped", 0L, ownerStamped),
        (-4L, "__sentinel__", "stream_complete", 0L, streamComplete),
        (-5L, "__sentinel__", "versioned_publish", 0L, publishOk))
      import s.implicits._
      out.unionByName(
        sentinels.toDF("doc_id", "source", "fp", "shard", "weight"))
    } finally {
      daemon.stop()
      ch.shutdownNow(); msrv.stop()
    }
  }

  /** Two epochs through the training-set iterator with a buffered shuffle —
    * a permutation of 2× the base rows, which the sorted hash-compare checks
    * as a multiset (= CROSS JOIN with a 2-row epoch table in the oracle). */
  private def trainingStream(s: SparkSession, dir: String): DataFrame = {
    val base = events(s, dir).select(col("event_id"), col("value"))
    val it = graft.serving.TrainingSetIterator.shuffled(
      graft.serving.TrainingSetIterator.repeat(base, 2), bufferSize = 256, seed = 7L)
    val rows = it.toSeq
    s.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](rows.asJava), base.schema)
  }

  // ------------------------------------- X3: split-serving protocol

  private def splitServe(s: SparkSession, dir: String): DataFrame = {
    val session = new SplitSession(
      events(s, dir).select(col("event_id"), col("user_id"), col("value")),
      Seq("event_id"), testSize = 0.25, seed = 42L).initialize()
    val out = session.trainFrame.withColumn("role", lit("train"))
      .unionByName(session.testFrame.withColumn("role", lit("test")))
    out
  }

  // --------------------------- K6 wide: multi-feature upsert + evolution

  /** Wide online table: batch 1 has click+purchase features, batch 2 adds
    * `f_view` — the upsert grows the schema (reference ALTER ADD COLUMNS)
    * while folding newer per-feature values in. */
  private def mergeUpsertWide(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("user_id").as("entity"),
      concat(lit("f_"), col("event_type")).as("feature"),
      col("value"), col("ts"), col("event_id"))
    val batch1 = ev.filter(col("event_id") < 500 &&
      col("feature").isin("f_click", "f_purchase"))
    val batch2 = ev.filter(col("event_id") >= 500 &&
      col("feature").isin("f_click", "f_purchase", "f_view"))
    val snap = Materialize.wideSnapshot(
      batch1.select("entity", "feature", "value", "ts"),
      Seq("f_click", "f_purchase"))
    val wide = Materialize.upsertWide(snap, batch2)
    // schema stability under missing features (EMPTY update batches add no
    // columns): absent features serve as typed NULL columns
    val stable = Seq("f_click", "f_purchase", "f_view").foldLeft(wide) {
      (d, f) =>
        val d1 = if (d.columns.contains(f)) d
          else d.withColumn(f, lit(null).cast("double"))
        if (d1.columns.contains(s"${f}__ts")) d1
        else d1.withColumn(s"${f}__ts", lit(null).cast("timestamp"))
    }
    stable.select(col("entity"),
      col("f_click"), unix_millis(col("f_click__ts")).as("f_click_ts_ms"),
      col("f_purchase"), unix_millis(col("f_purchase__ts")).as("f_purchase_ts_ms"),
      col("f_view"), unix_millis(col("f_view__ts")).as("f_view_ts_ms"))
  }

  // ------------------------- catalog persistence + on-demand durability

  /** Registry round-trip inside one query: build a catalog (primaries, SQL
    * transformation, on-demand expression feature), persist it, load it into
    * a FRESH catalog (the restarted-process path), and resolve through the
    * reloaded definitions only. */
  private def catalogPersist(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_meta").toString
    val cat = new Catalog(s)
    cat.registerEntity(EntityDef("customer"))
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerSource(SourceVariant(ResourceId("cust_rev"), SqlTransformation(
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  COUNT(*) AS n
        |FROM {{orders}} GROUP BY o_custkey""".stripMargin)))
    cat.registerOnDemand(OnDemandVariant(ResourceId("rev_tax"),
      "CAST(rev * 0.1 AS DOUBLE)"))
    CatalogStore.save(cat, s, tmp)
    val reloaded = CatalogStore.load(s, tmp) // fresh catalog ≡ restarted process
    reloaded.onDemand(ResourceId("rev_tax"))(
      reloaded.resolve(ResourceId("cust_rev")))
  }

  /** Lineage export — the dashboard data contract: the resource DAG
    * (source → transformation → feature/label → training set → model
    * edges) joined with each node's latest task-run state from the
    * durable ledger. The catalog and the DAG run are deterministic, so
    * the oracle is the literal expected document. The JSON single-file
    * form (Lineage.exportJson) is exercised by LineageSpec. */
  private def lineageExport(s: SparkSession, dir: String): DataFrame = {
    val cat = new Catalog(s)
    cat.registerSource(SourceVariant(ResourceId("events"),
      PrimaryData(s"$dir/events.parquet")))
    cat.registerSource(SourceVariant(ResourceId("clicks"), SqlTransformation(
      "SELECT user_id, ts, value FROM {{events}} WHERE event_type = 'click'")))
    cat.registerFeature(FeatureVariant(ResourceId("f_click"),
      ResourceId("clicks"),
      graft.types.ResourceSchema("user_id", "value", Some("ts"))))
    cat.registerLabel(LabelVariant(ResourceId("purchase"),
      ResourceId("events"),
      Seq(EntityMapping("user", "user_id")), "value", Some("ts")))
    cat.registerTrainingSet(TrainingSetVariant(ResourceId("ts1"),
      ResourceId("purchase"), Seq(ResourceId("f_click"))))
    cat.registerModel(ModelDef("m1",
      features = Seq(ResourceId("f_click")),
      trainingSets = Seq(ResourceId("ts1"))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_lineage").toString
    val runner = new graft.sched.TaskRunner(s, tmp, maxAttempts = 2,
      backoffMs = 1)
    graft.sched.Dag.run(runner, "2024-02-01",
      tasks = Map(
        "events" -> (() => 1L),
        "clicks" -> (() => 2L),
        "f_click" -> (() => sys.error("materialization quota")),
        "purchase" -> (() => 3L),
        "ts1" -> (() => 4L)),
      deps = Map(
        "clicks" -> Seq("events"),
        "f_click" -> Seq("clicks"),
        "purchase" -> Seq("events"),
        "ts1" -> Seq("purchase", "f_click")))
    graft.catalog.Lineage.export(s, cat, runner.runs())
  }

  // ------------------------------------ O4 scale path: IVF approximate ANN

  /** IVF ANN vs the exact baseline: recall@10 over the 10-query set must
    * clear 0.5 — emitted as a checked row, so a recall regression turns the
    * CORRECTNESS row red. Bound note: the synthetic embeddings are
    * UNCLUSTERED (uniform), where IVF recall ≈ the scanned corpus fraction
    * by construction (nprobe/nlist = 1/2 here → measured 0.62-0.73 across
    * SFs); on clustered real-world embeddings the same shape concentrates
    * neighbors in probed cells and recall climbs far above the scan
    * fraction. */
  private def annTopKIVFQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val ivf = Vectors.annTopKIVF(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10, nlist = 8, nprobe = 4)
    val exact = Vectors.annTopK(emb, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 10)
    val hit = ivf.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .agg(count("*").as("hits"))
    val tot = exact.agg(count("*").as("total"))
    hit.crossJoin(tot).select(lit("recall_at_10_ge_0.5").as("metric"),
      when(col("total") === 0, 1L) // empty corpus: vacuously ok, no 0-div
        .otherwise((col("hits").cast("double") / col("total") >= 0.5)
          .cast("long")).as("ok"))
  }

  /** Corpus-scale kNN self-join ([[graft.functions.Vectors.knnJoinIVF]]):
    * every embedding's top-5 neighbors through the IVF topology — one
    * refinement round of the deterministic kmeans codebook, argmax cell per
    * corpus row, top-2 probe cells per query row, shuffle join on cell,
    * exact-cosine rerank. Unlike ann_topk_ivf's recall gate, the oracle
    * replays the ENTIRE pipeline (codebook init + round, both leg
    * assignments, candidate join, rank) — cell-exact, not a threshold. */
  private def knnGraphQ(s: SparkSession, dir: String): DataFrame =
    // the √n operating rule is the DEFAULT entry (knnJoinIVFAuto), not an
    // opt-in; the oracle replays nlist = round(sqrt(n)) via the same rule
    Vectors.knnJoinIVFAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
      k = 5, nprobe = 2, iters = 1)

  /** Incremental kNN-graph maintenance under the gate
    * ([[graft.functions.Vectors.knnJoinIncrement]]): the codebook is
    * FROZEN on the old corpus (vec_id % 5 ≠ 0 — the incremental_kmeans
    * split), the old graph is built, then the batch (vec_id % 5 = 0) is
    * folded in WITHOUT re-searching old-vs-old. The oracle is the FULL
    * recompute over the whole corpus against the same frozen codebook, so
    * the top-k merge identity (prevTopK ∪ batch candidates ≡ full
    * candidate set per query) is asserted cell-exactly on every row. */
  private def knnGraphIncrQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val old = emb.filter(col("vec_id") % 5 =!= 0)
    val batch = emb.filter(col("vec_id") % 5 === 0)
    // codebook at the √n rule over the OLD corpus (the frozen side)
    val (_, cents) = Vectors.kmeansModel(old, "vec_id", "embedding",
      k = Vectors.nlistForCorpus(old.count()), iters = 1)
    // empty old corpus → no codebook, no graph (new-tenant robustness —
    // same schema-correct empty contract as knnJoinIVF)
    if (cents.isEmpty)
      return emb.select(col("vec_id").as("query_id"),
        col("vec_id").as("neighbor_id"), lit(0.0).as("cosine"),
        lit(0L).as("rank")).limit(0)
    val prevTopK = Vectors.knnJoinWithCodebook(old, "vec_id", "embedding",
      k = 5, nprobe = 2, cents = cents)
    Vectors.knnJoinIncrement(prevTopK, old, batch, "vec_id", "embedding",
      k = 5, nprobe = 2, cents = cents)
  }

  /** IVF-PQ kNN self-join ([[graft.functions.Vectors.knnJoinIVFPQ]]): the
    * symmetric-distance (SDC) topology — candidates carry only their m
    * subspace CODES through the cell-keyed shuffle, score as m lookups in
    * the broadcast m×k×k raw-centroid-dot table, top-`rerank` shortlist
    * per query, exact-cosine rerank. The oracle replays the WHOLE thing:
    * the IVF codebook round, all four PQ codebook rounds, both legs' cell
    * and code assignments, the SDC sums, the shortlist cut, the rerank. */
  private def knnGraphPqQ(s: SparkSession, dir: String): DataFrame =
    // IVF codebook at the √n rule (auto); PQ subspace codebooks stay at
    // their fixed quantizer resolution
    Vectors.knnJoinIVFPQAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
      k = 5, nprobe = 2, iters = 1, m = 4, subDim = 16,
      codebookK = 8, pqIters = 1, rerank = 20)

  /** The int8-rerank twin — the shuffle-payload scale lever the r11
    * measurement motivated (the rerank joins dominate PQ's shuffle
    * bytes; tinyint arrays cut that payload 4×). Same topology as
    * knn_graph_pq; the oracle replays the rerank on the SAME quantized
    * integer vectors, so the rounding trade is hash-gated, not waved at. */
  private def knnGraphPqInt8Q(s: SparkSession, dir: String): DataFrame =
    Vectors.knnJoinIVFPQAuto(t(s, dir, "embeddings"), "vec_id", "embedding",
      k = 5, nprobe = 2, iters = 1, m = 4, subDim = 16,
      codebookK = 8, pqIters = 1, rerank = 20, int8Rerank = true)

  // ------------------------------- multimodal: real-codec round-trip

  /** Real-codec media pipeline, oracle-checked end-to-end: synthesize PNG
    * images / PCM WAV audio with dimensions that are arithmetic functions of
    * the id, decode with the real JDK codecs, bilinear-resize the images,
    * re-decode — the oracle recomputes every expected dimension in SQL, so
    * a codec that lied about width/height/sample-rate/frames turns the row
    * red. */
  private def mediaPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.{Codecs, Multimodal}
    // the documents parquet is one file → one partition; spread the codec
    // work across the executor threads before the per-item map
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long"))
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    val media = ids.map { id =>
      if (id % 2 == 0)
        Multimodal.MediaRow(id, "image",
          Codecs.syntheticPng((8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, id))
      else
        Multimodal.MediaRow(id, "audio",
          Codecs.syntheticWav((8000 + (id % 8) * 1000).toInt, (1000 + id % 500).toInt, id))
    }.toDF()
    val decoded = Multimodal.decodeFeatures(s, media).toDF()
    val resized = Multimodal.decodeFeatures(s,
      Multimodal.resizeImages(s, media.filter(col("kind") === "image"), 12, 9)).toDF()
      .select(col("media_id"), col("width").as("rw"), col("height").as("rh"))
    // pixel-exact decode proof: PNG is lossless, so the decoded integer
    // luminance checksum equals the arithmetic function of the generator
    // formula the oracle recomputes in SQL
    val lums = media.as[Multimodal.MediaRow].map { r =>
      (r.media_id,
        if (r.kind == "image")
          Codecs.decodeImage(r.bytes).map(Codecs.luminanceSum).getOrElse(-2L)
        else -1L)
    }.toDF("media_id", "lum_sum")
    decoded.join(resized, Seq("media_id"), "left")
      .join(lums, Seq("media_id"))
      .select(col("media_id"), col("kind"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sampleRate").cast("long").as("sample_rate"),
        col("nFrames").cast("long").as("n_frames"),
        coalesce(col("rw"), lit(-1)).cast("long").as("resized_w"),
        coalesce(col("rh"), lit(-1)).cast("long").as("resized_h"),
        col("lum_sum"))
  }

  // ---------------------------------------- skew-salted join (plan-pinned)

  /** Salted join vs its plain equivalent: lineitem (large, o_orderkey can be
    * hot) × orders (replicated small side) — result must equal the plain
    * join, which is exactly what the oracle computes. */
  private def skewSaltedJoin(s: SparkSession, dir: String): DataFrame =
    Skew.saltedJoin(
      t(s, dir, "lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      "o_orderkey", buckets = 8)
      .groupBy(col("o_orderkey"))
      .agg(count("*").as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        max(col("o_totalprice")).as("o_totalprice"))

  // ------------------------------- S8/M6: streaming latest-value snapshot

  /** The streaming operator graph under the correctness gate: triples →
    * file-source stream (multiple micro-batches) → stateful latest-value →
    * update-mode emissions; the final state per entity (max emission by the
    * batch tie-break) must equal the batch materialization, which is what
    * the oracle computes. */
  private def streamingLatest(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts"))
      .repartition(4).write.parquet(s"$tmp/in") // 4 files → 2 micro-batches
    val stream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/in",
      maxFilesPerTrigger = 2)
    val table = s"stream_latest_${System.nanoTime()}"
    // small state partitioning for the 150-entity state (see streamAsOf)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    val q = try graft.streaming.StreamingLatest.latestValueStream(s, stream)
      .writeStream.outputMode("update").format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("entity"))
      .orderBy(col("ts").desc, col("value").desc)
    s.table(table)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))
  }

  /** The stream-to-serving loop under the gate: the same micro-batched
    * latest-value stream, but sunk through StreamingOnline.onlineSink into
    * a DiskKv (partition-side upserts, time-ordered segments) and then
    * read BACK from the serving store. The store's final state must equal
    * the batch materialization — the streaming_latest oracle. The scan
    * readback is driver-side serving-state fixture access (store-sized,
    * not corpus-sized), not an engine path. */
  private def streamOnlineServe(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_so").toString
    events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts"))
      .repartition(4).write.parquet(s"$tmp/in")
    val stream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/in",
      maxFilesPerTrigger = 2)
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    val kvDir = s"$tmp/kv"
    val q = try graft.streaming.StreamingOnline.onlineSink(
      graft.streaming.StreamingLatest.latestValueStream(s, stream).toDF(),
      "so_feat", () => new graft.serving.DiskKv(kvDir), s"$tmp/ckpt",
      availableNow = true)
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    import s.implicits._
    new graft.serving.DiskKv(kvDir).scan("so_feat").map { case (e, v) =>
      val r = v.asInstanceOf[org.apache.spark.sql.Row]
      (e.asInstanceOf[Long], r.getDouble(0), r.getLong(1))
    }.toSeq.toDF("entity", "value", "ts_ms")
  }

  /** Streaming vector upkeep under the gate: the embeddings table streamed
    * into the online vector store ([[graft.streaming.StreamingOnline
    * .vectorSink]] — partition-side versioned puts), then an OVERWRITE
    * stream negates every `vec_id % 10 == 0` vector (`versionBase` orders
    * the second stream's batches after the first's, or its writes would
    * lose the version race). Exact-scan nearest for three probes — one of
    * them an overwritten id — must rank against the POST-overwrite
    * corpus, which the oracle replays with the same negation rule. */
  private def streamVectorServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_svec").toString
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("entity"),
        col("embedding").as("vector"))
    awaitAll(
      () => emb.repartition(4).write.parquet(s"$tmp/in1"),
      () => emb.filter(col("entity") % 10 === 0)
        .withColumn("vector", transform(col("vector"), x => -x))
        .repartition(2).write.parquet(s"$tmp/in2"))
    val kvDir = s"$tmp/kv"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    try {
      def run(in: String, ckpt: String, base: Long): Unit = {
        val stream = s.readStream.schema("entity long, vector array<float>")
          .option("maxFilesPerTrigger", 2).parquet(in)
        val q = graft.streaming.StreamingOnline.vectorSink(stream, "sv_emb",
          () => new graft.serving.DiskKv(kvDir), ckpt, versionBase = base,
          availableNow = true)
        graft.streaming.StreamRun.await(q)
      }
      run(s"$tmp/in1", s"$tmp/ckpt1", 0L)
      run(s"$tmp/in2", s"$tmp/ckpt2", 1000L)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    val store = new graft.serving.OnlineStore(new graft.serving.DiskKv(kvDir))
    // probe vectors = the post-overwrite state, derived independently of
    // the store (negation rule re-applied driver-side)
    val probes: Map[Long, Array[Float]] = emb
      .filter(col("entity").isin(1L, 2L, 10L)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      .map { case (id, v) => id -> (if (id % 10 == 0) v.map(x => -x) else v) }
    probes.keys.toSeq.sorted.flatMap { qid =>
      store.nearest("sv_emb", probes(qid), 5).zipWithIndex.map {
        case ((nid, sim), i) =>
          (qid, nid.asInstanceOf[Long],
            BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, (i + 1).toLong)
      }
    }.toDF("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Streaming near-dup detection under the gate: the documents table
    * replayed through a file stream; the per-bucket stateful matcher
    * ([[graft.streaming.StreamingDedup]], quarter-band simhash keys,
    * flatMapGroupsWithState) must emit — as distinct canonical pairs —
    * exactly the batch all-pairs Hamming ≤ 3 answer (the
    * simhash_near_dups_bounded oracle): the pigeonhole recall guarantee
    * holds online, micro-batch boundaries included. */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .repartition(6).write.parquet(s"$tmp/in")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    try graft.streaming.StreamingDedup.runFileStream(s, s"$tmp/in")
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Recent-window streaming near-dup under the gate: every doc gets a
    * deterministic event time (`2024-01-01 + (doc_id % 1440) minutes`, a
    * day of minute slots) and only pairs within a 30-minute window count.
    * The watermark delay exceeds the whole ts span, so nothing is pruned
    * or late and the per-pair event-time rule alone decides — making the
    * streamed answer EXACTLY the batch all-pairs Hamming ≤ 3 set
    * restricted to `|Δts| ≤ 30 min`, which the oracle replays as a pure
    * doc_id predicate. (Pruning/GC behavior is proven separately in
    * StreamingDedupTtlSpec with stepped watermarks.) */
  private def streamDedupTtl(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedupt").toString
    t(s, dir, "documents").select(col("doc_id"),
        expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0, " +
          "cast(doc_id % 1440 as int), 0)").as("ts"),
        col("text"))
      .repartition(6).write.parquet(s"$tmp/in")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    try graft.streaming.StreamingDedup.runFileStreamTtl(s, s"$tmp/in",
      ttlMs = 30L * 60 * 1000, delay = "2 days")
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Streaming decontamination under the gate: the corpus replayed through
    * a file stream against the eval-set Bloom built batch-side
    * ([[graft.streaming.StreamingDecontam]] — STATELESS scan-projection
    * screen, asserted so in the runner), then the batch exact-hit
    * confirmation joined back — the result must equal the batch
    * contaminatedBloom column-for-column (bloom_decontam's oracle
    * verbatim), micro-batch boundaries included. */
  private def streamDecontam(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Decontam
    val docs = t(s, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val eval = docs.filter(col("doc_id") % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdecon").toString
    corpus.select(col("doc_id"), col("text")).repartition(6)
      .write.parquet(s"$tmp/in")
    val flagged = graft.streaming.StreamingDecontam.runFileStream(
      s, s"$tmp/in", eval, n = 8, numProbes = 5, mBits = 1 << 20)
    flagged
      .join(Decontam.contaminated(corpus, eval, "text", "doc_id", n = 8)
        .withColumnRenamed("n_hits", "n_exact_hits"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bloom_hits"),
        coalesce(col("n_exact_hits"), lit(0L)).as("n_exact_hits"))
  }

  // ----------------------------- orchestration: task runs, retry, resume

  /** TaskRunner lifecycle under the gate: a flaky materialization (fails
    * twice, then succeeds), a resumed re-run (skipped), and an
    * exhausted-failure task — the recorded (task, attempt, status) ledger is
    * fully deterministic and the oracle pins it. */
  private def taskRuns(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_runs").toString
    val runner = new graft.sched.TaskRunner(s, tmp, maxAttempts = 3, backoffMs = 1)
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    runner.run("materialize", "v1") {
      if (calls.incrementAndGet() < 3) sys.error("flaky")
      Materialize.latestTriple(
        events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts")))
        .queryExecution.toRdd.count()
    }
    runner.run("materialize", "v1") { 0L } // resumed → skipped, not recorded
    runner.run("doomed", "v1") { sys.error("always") }
    import s.implicits._
    runner.runs().map(r => (r.task, r.attempt, r.status))
      .toDF("task", "attempt", "status")
      .select(col("task"), col("attempt").cast("long").as("attempt"), col("status"))
  }

  // ------------------------------- watermarked sliding-window aggregation

  /** The streaming windowed-agg operator graph evaluated on the batch frame
    * (identical `window()` assignment logic); oracle re-derives the two
    * 10-minute/5-minute-slide windows per event arithmetically. */
  private def windowedCounts(s: SparkSession, dir: String): DataFrame = {
    val triples = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    graft.streaming.StreamingLatest.windowedCounts(triples,
        "10 minutes", "5 minutes", "30 minutes")
      .select(unix_millis(col("window.start")).as("ws_ms"), col("entity"),
        col("n"))
  }

  // ------------------------------------ stream-stream as-of, end-to-end

  /** Stream-stream as-of join under the gate: click-features and
    * purchase-labels replayed through two file-source streams; a
    * beyond-horizon watermark delay guarantees no late-drops, and sentinel
    * rows (entity -1) pushed into BOTH streams advance the min-watermark so
    * every label flushes. The emitted set must equal the batch as-of join,
    * which the oracle computes. */
  private def streamAsOf(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sasof").toString
    val ev = events(s, dir)
    val feats = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    val lbls = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    @volatile var maxTs = new java.sql.Timestamp(0L)
    awaitAll(
      () => feats.coalesce(1).write.parquet(s"$tmp/f"),
      () => lbls.coalesce(1).write.parquet(s"$tmp/l"),
      () => maxTs = maxTsOrEpoch(ev))
    def sentinel(offsetDays: Int): DataFrame = {
      import s.implicits._
      Seq((-1L, 0.0, new java.sql.Timestamp(
        maxTs.getTime + (3650L + offsetDays) * 86400000L)))
        .toDF("entity", "value", "ts")
    }
    // The sentinel lands BEFORE the query starts, so micro-batch 1 ingests
    // data + watermark-push together (watermark is still 0 during the batch
    // ⇒ every label pends and arms its wm+1 timeout, and the batch's max
    // event time lifts the watermark past every label). The engine then
    // runs ONE no-data micro-batch — AvailableNow's continue condition
    // includes `lastExecutionRequiresAnotherBatch`, so this is a guaranteed
    // step before self-termination, not a race — whose watermark fires
    // every armed timeout: a 2-stateful-batch lifecycle instead of the
    // previous 4-5. The finer multi-batch interleavings are covered by
    // StreamingAsOfSpec.
    awaitAll(
      () => sentinel(1).write.mode("append").parquet(s"$tmp/f"),
      () => sentinel(1).write.mode("append").parquet(s"$tmp/l"))

    val fStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/f", 8)
    val lStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/l", 8)
    // delay > the whole data span ⇒ nothing is ever watermark-late
    val joined = graft.streaming.StreamingAsOf.asOfStream(s, lStream, fStream,
      delayThreshold = "3650 days")
    val table = s"stream_asof_${System.nanoTime()}"
    // 150 entities don't need 32 state-store partitions; the query pins its
    // state partitioning at start, so the conf is restored right after
    // (partition count never affects results). Measured: the RocksDB state
    // store provider is ~20% SLOWER here (per-instance native init dwarfs
    // this tiny state) — it's the right provider only once per-partition
    // state outgrows the heap, so the default HDFS-backed store stays.
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    // pin the no-data-batch contract the lifecycle above relies on (it is
    // the Spark default, but the flush would silently hang without it)
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q = try joined.writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.table(table).filter(col("entity") >= 0)
      .select(col("entity"), unix_millis(col("ts")).as("ts_ms"),
        col("label"), col("feature"))
  }

  // --------------------------------------- K8: Kafka-write emulation (sink)

  /** K8 under the gate, through the [[graft.streaming.StreamBus]] seam:
    * produce the event triples onto an input topic, consume them as a
    * stream, sink them onto an output topic, then replay that topic —
    * the full produce → consume → sink → replay cycle against whichever
    * binding `spark.graft.streamBus` resolves (real `format("kafka")`
    * when the connector jar + brokers are present; the dir-as-topic file
    * bus here). The replay is aggregated per entity with
    * order-independent stats; the oracle recomputes them from the batch
    * table — proving the bus dropped and duplicated nothing. */
  private def kafkaWriteRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val bus = graft.streaming.StreamBus.resolve(s)
    val tmp = java.nio.file.Files.createTempDirectory("graft_kw").toString
    bus.produce(
      events(s, dir).select(col("user_id").as("entity"), col("value"),
        col("ts")).repartition(4), // 4 files → 2 micro-batches on the file bus
      s"$tmp/in")
    val q = bus.sinkTriples(bus.readTriples(s, s"$tmp/in", 2),
      s"$tmp/topic", s"$tmp/chk", availableNow = true)
    graft.streaming.StreamRun.await(q)
    bus.readAll(s, s"$tmp/topic")
      .groupBy(col("entity"))
      .agg(count("*").as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        max(unix_millis(col("ts"))).as("max_ts_ms"))
  }

  // ------------------------------------------- right-to-erasure lifecycle

  /** The GDPR deletion path under the gate: events → versioned offline
    * table + DiskKv online table, then entity 7's full erasure — online
    * point-delete (tombstone + compact), offline scrubLatest (new version
    * without the entity) + gcVersions (old copies physically dropped).
    * Output proves each half: offline row counts before/after, one
    * surviving version, online hit before and miss after. Oracle
    * recomputes the counts from the batch table; the flags are the
    * lifecycle contract. */
  private def forgetEntity(s: SparkSession, dir: String): DataFrame = {
    val entity = 7L
    val tmp = java.nio.file.Files.createTempDirectory("graft_forget").toString
    val triples = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    graft.sources.Writers.writeVersioned(triples, s"$tmp/tbl")
    val store = new graft.serving.OnlineStore(
      new graft.serving.DiskKv(s"$tmp/kv"))
    store.load("val", graft.ops.Materialize.latestTriple(triples)
      .select(col("entity"), col("value")))
    val beforeRows = graft.sources.Writers.readLatest(s, s"$tmp/tbl").count()
    val onlineBefore = store.get("val", entity).isDefined
    // erase: online tombstone (+compact drops it physically), offline
    // scrub into a new version, retention drops the historical copy
    store.forget(entity, Seq("val"))
    graft.sources.Writers.scrubLatest(s, s"$tmp/tbl",
      col("entity") === entity)
    val gone = graft.sources.Writers.gcVersions(s, s"$tmp/tbl", keepLast = 1)
    val afterRows = graft.sources.Writers.readLatest(s, s"$tmp/tbl").count()
    val onlineAfter = store.get("val", entity).isDefined
    val nVersions = graft.sources.Writers.latestVersion(s, s"$tmp/tbl").size +
      0L // latest exists; gc left exactly one dir
    import s.implicits._
    Seq((beforeRows, afterRows, gone.length.toLong + nVersions,
      if (onlineBefore) 1L else 0L, if (onlineAfter) 1L else 0L))
      .toDF("rows_before", "rows_after", "n_versions_touched",
        "online_before", "online_after")
  }

  /** Partition PRUNING under the gate: the event triples written through
    * the DailyPartition layout (K5 — one `__date=` directory per day),
    * read back with a date-range predicate. The range is a PARTITION
    * filter: Spark prunes whole directories at planning time
    * (`PartitionFilters` in the scan node — snapshot in PLANS.md,
    * asserted in DatePruneSpec), so a 100 TB table scans 3 days, not 30.
    * The oracle recomputes the same aggregate from the raw table. */
  private def datePrunedScan(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dp").toString
    val v = graft.sources.Writers.writeVersioned(
      events(s, dir).select(col("user_id"), col("value"), col("ts")),
      s"$tmp/t", Some(graft.catalog.DailyPartition("ts")))
    s.read.parquet(v)
      .where(col("__date") >= "2024-01-10" && col("__date") <= "2024-01-12")
      // partition-column type inference reads __date back as DATE; the
      // output contract (and the oracle) use the directory string
      .groupBy(col("__date").cast("string").as("__date"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
  }

  // -------------------------- custom expressions on the SQL surface (T1)

  /** The registered custom Catalyst expressions called FROM SQL — adjacent-
    * doc k-gram Jaccard and the 64-bit SimHash, both recomputed indepen-
    * dently by the oracle (substr-shingle set math / md5 bit votes). */
  private def qCustomFn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.registerAll(s)
    SqlTransform.runWith(s,
      raw"""WITH d AS (SELECT doc_id, text,
           |    trim(regexp_replace(lower(text), '\\s+', ' ')) AS nt
           |  FROM {{documents}})
           |SELECT a.doc_id,
           |  round(kgram_jaccard(a.nt, b.nt, 5), 6) AS next_jaccard,
           |  conv(hex(simhash64(filter(split(trim(a.text), '\\s+'),
           |    t -> length(t) > 0))), 16, 10) AS simhash
           |FROM d a JOIN d b ON b.doc_id = a.doc_id + 1""".stripMargin,
      Map(ResourceId("documents") -> t(s, dir, "documents")))
  }

  // ----------------------- winnowing near-dups (MOSS-style shared substrings)

  /** Document pairs sharing ≥3 winnowing fingerprints (k=20 char shingles,
    * window 24 — any shared substring of 43+ chars is guaranteed a shared
    * fingerprint). Bucketed self-join on the fingerprint value — never
    * all-pairs, hot fingerprints frequency-capped — and, like the other
    * sketches, fully replayed by the oracle. */
  private def winnowNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowNearDups(t(s, dir, "documents"), "text", "doc_id",
      shingleK = 20, window = 24, minShared = 3)

  /** Incremental clustering maintenance: the codebook trained on the
    * vec_id %5 != 0 corpus (2 Lloyd's rounds), the held-out batch
    * assigned against the PERSISTED centroids with no retraining — the
    * k-means twin of the incremental signature tables. */
  private def incrementalKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val old = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val (_, cents) = Vectors.kmeansModel(old, "vec_id", "embedding",
      k = 8, iters = 2)
    if (cents.isEmpty) // empty-input robustness: no codebook, no rows
      batch.select(col("vec_id")).withColumn("cell", lit(0L)).limit(0)
    else Vectors.assignToCentroids(batch, "vec_id", "embedding", cents)
  }

  /** Quote-inclusion detection: winnowing candidates verified by k-gram
    * CONTAINMENT of the shorter normalized text in the longer — the
    * asymmetric pairs a Jaccard gate structurally misses. */
  private def containmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "text", "doc_id",
      shingleK = 20, window = 24, minShared = 2, minContainment = 0.5)

  /** Stupid Backoff bigram scoring on the md5-held-out half (α = 0.4):
    * conditional bigram frequency with unigram backoff; the backoff
    * rate is the out-of-distribution phrasing signal. */
  private def stupidBackoffQ(s: SparkSession, dir: String): DataFrame =
    functions.UnigramLM.stupidBackoff(t(s, dir, "documents"), "doc_id",
      "text")

  // --------------------------------- bucketed co-located join (no shuffle)

  /** Two tables bucketed on the join key (8 buckets each) joined with a
    * forced sort-merge join — the bucket layout satisfies the join's
    * distribution requirement, so the join itself runs with zero exchanges
    * (asserted in BucketedJoinSpec); here the result is oracle-checked
    * against the plain join. */
  private def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bj").toString
    val n = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    graft.sources.Writers.writeBucketed(t(s, dir, "orders"),
      s"b_orders_$n", s"$tmp/o", "o_custkey", 8, Seq("o_custkey"))
    graft.sources.Writers.writeBucketed(
      t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey"),
      s"b_cust_$n", s"$tmp/c", "o_custkey", 8, Seq("o_custkey"))
    s.table(s"b_orders_$n").hint("merge")
      .join(s.table(s"b_cust_$n"), Seq("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count("*").as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
  }

  // ================================================================ contract

  /** Flagship: the full feature-store slice (transform → PIT training set). */
  def entry(spark: SparkSession): DataFrame =
    pitPurchases(spark, "/root/testdata/sf0.001")

  // --------------------- compaction / hash-bucketed write round-trips

  /** Small-file compaction with a preserved DailyPartition layout: a
    * 16-file fragmented version is compacted into a date-partitioned one;
    * the read-back content (grouped per day) must equal a direct recompute
    * over the source table — proving compaction changed layout, not data. */
  private def compactRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cmp").toString
    // one quarter of orders: enough days (~90 partition dirs) to prove the
    // layout survives, without a full partition-discovery pass over years
    // of daily dirs dominating the round-trip
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= "1995-01-01" && col("o_orderdate") < "1995-04-01")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    graft.sources.Writers.writeVersioned(o.repartition(16), s"$tmp/t")
    graft.sources.Writers.compact(s, s"$tmp/t",
      partition = Some(graft.catalog.DailyPartition("o_orderdate")))
    graft.sources.Writers.readLatest(s, s"$tmp/t")
      .groupBy(date_format(col("__date").cast("date"), "yyyy-MM-dd").as("day"))
      .agg(count("*").as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("rev"))
  }

  /** HashPartition versioned write (the pre-bucketing primitive for
    * co-located downstream joins): 8 hash buckets on the key, content
    * round-trips exactly. */
  private def hashPartitionedWrite(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_hpw").toString
    val c = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double").as("acctbal"))
    graft.sources.Writers.writeVersioned(c, s"$tmp/t",
      Some(graft.catalog.HashPartition("c_custkey", 8)))
    graft.sources.Writers.readLatest(s, s"$tmp/t")
  }

  /** Dedup quality readout: MinHash-LSH pairs vs the EXACT 5-gram-Jaccard
    * ground truth on a FIXED-SIZE audit panel (doc_id < 500 — the
    * all-pairs truth is quadratic, so the eval pins a constant-cost
    * panel: the whole corpus at sf0.01, a 125k-pair audit at any SF).
    * Precision is 1.0 by construction (the LSH pipeline ends in the same
    * exact verify — the row asserts that) and recall measures what the
    * banding + estimate gate DROPS: the quality number behind the
    * bands/threshold parameter choice. */
  private def dedupPrEval(s: SparkSession, dir: String): DataFrame = {
    val sub = t(s, dir, "documents").filter(col("doc_id") < 500)
    // gram sets hashed+sorted ONCE per doc in the leg projections; the
    // quadratic pair stage is then a linear merge per pair
    // (SortedLongsJaccard ≡ KgramJaccard on the texts, spec-asserted) —
    // the panel previously re-derived each doc's gram set once per
    // PARTNER (~500×) inside the cross join
    val txt = Dedup.fanOut(sub.select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        functions.expressions.HashExprs.kgramSet(
          functions.TextFunctions.normalizedText(col("text")), 5).as("__g"))
    val a = txt.select(col("doc_id").as("idA"), col("__g").as("__ga"))
    val b = txt.select(col("doc_id").as("idB"), col("__g").as("__gb"))
    val truth = a.crossJoin(b).where(col("idA") < col("idB"))
      .where(functions.expressions.HashExprs
        .sortedLongsJaccard(col("__ga"), col("__gb")) >= 0.5)
      .select("idA", "idB")
    val pred = Dedup.minhashNearDups(sub, "text", "doc_id",
      shingleK = 5, numHashes = 64, bands = 16, threshold = 0.5)
      .select("idA", "idB")
    val counts = truth.agg(count(lit(1)).as("n_true"))
      .crossJoin(pred.agg(count(lit(1)).as("n_pred")))
      .crossJoin(pred.join(truth, Seq("idA", "idB"))
        .agg(count(lit(1)).as("n_hit")))
    counts.select(col("n_true"), col("n_pred"), col("n_hit"),
      round(when(col("n_pred") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_pred")), 6)
        .as("prec"),
      round(when(col("n_true") === 0, 1.0)
        .otherwise(col("n_hit").cast("double") / col("n_true")), 6)
        .as("recall"))
  }

  // ------------------------------- n-gram jaccard over an explicit pair set

  /** Exact k-gram Jaccard for an explicit candidate pair list (the verify
    * primitive exposed standalone): consecutive doc-id pairs, k=3. */
  private def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = docs.select(col("doc_id").as("idA"),
      (col("doc_id") + 1).as("idB"))
    Dedup.ngramJaccard(docs, pairs, "text", "doc_id", k = 3)
  }

  // ------------------------------------ serving ANN index vs linear scan

  /** The serving-side ANN path end-to-end: a deterministic clustered corpus
    * (bases from the embeddings table + members perturbed by other table
    * vectors), served through OnlineStore — linear scan before buildIndex,
    * multi-probe LSH index after. Checks (a) every self-query returns itself
    * first at cosine ~1 and (b) recall@10 vs the pre-index linear scan ≥ 0.9
    * — emitted as a checked row so an index regression turns the gate red.
    * (On the raw UNIFORM embeddings LSH recall degrades to the probed
    * fraction by construction — clusters are the workload ANN exists for.) */
  private def vectorIndexServe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings").select(col("vec_id").cast("long"),
        col("embedding")).as[(Long, Array[Float])]
      .filter(_._1 < 330).collect().sortBy(_._1).toMap
    // empty-input contract: nothing to index, nothing to assert
    if (emb.isEmpty) return Seq.empty[(String, Long)].toDF("metric", "ok")
    val corpus: Seq[(Long, Array[Float])] =
      (0 until 30).flatMap { b =>
        val base = emb(b.toLong)
        val members = (0 until 9).map { j =>
          val o = emb(30L + b * 9 + j)
          (b * 100L + j + 1, base.indices.map(i => base(i) + 0.05f * o(i)).toArray)
        }
        (b * 100L, base) +: members
      }
    val store = new graft.serving.OnlineStore
    store.loadVectors("emb", corpus.toDF("entity", "vector"))
    val queries = (0 until 30).map(b => b * 100L -> emb(b.toLong))
    val scanTop = queries.map { case (id, v) =>
      id -> store.nearest("emb", v, 10).map(_._1).toSet
    }.toMap
    store.buildIndex("emb")
    var hits = 0
    var selfOk = true
    queries.foreach { case (id, v) =>
      val top = store.nearest("emb", v, 10)
      selfOk &&= top.head._1 == id && top.head._2 > 0.999999
      hits += top.map(_._1).count(scanTop(id).contains)
    }
    val recallOk = hits.toDouble / (queries.length * 10) >= 0.9
    val ok = if (selfOk && recallOk) 1L else 0L
    Seq(("vector_index_recall_ge_0.9", ok)).toDF("metric", "ok")
  }

  // ---------------- metadata breadth: providers/users/models/tags/lineage

  /** Provider / User / Model resources, tags & properties, and the two
    * dashboard lineage queries ("which features does model M consume" —
    * directly or through its training sets — and "which models consume
    * feature F"), all persisted and answered from a RELOADED catalog so the
    * round-trip itself is part of the check. */
  /** The lineage/search fixture catalog: built, persisted, and RELOADED
    * (≡ restarted process) — shared by catalog_lineage and catalog_search. */
  private def lineageFixtureCatalog(s: SparkSession, dir: String): Catalog = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lin").toString
    val cat = new Catalog(s)
    cat.registerEntity(EntityDef("customer"))
    cat.registerSource(SourceVariant(ResourceId("orders"),
      PrimaryData(s"$dir/orders.parquet")))
    cat.registerSource(SourceVariant(ResourceId("cust_rev"), SqlTransformation(
      """SELECT o_custkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev,
        |  COUNT(*) AS n
        |FROM {{orders}} GROUP BY o_custkey""".stripMargin)))
    cat.registerFeature(FeatureVariant(ResourceId("f_rev"), ResourceId("cust_rev"),
      graft.types.ResourceSchema("o_custkey", "rev", None), "customer"))
    cat.registerFeature(FeatureVariant(ResourceId("f_cnt"), ResourceId("cust_rev"),
      graft.types.ResourceSchema("o_custkey", "n", None), "customer"))
    cat.registerLabel(LabelVariant(ResourceId("l_big"), ResourceId("cust_rev"),
      Seq(EntityMapping("customer", "o_custkey")), "rev"))
    cat.registerTrainingSet(TrainingSetVariant(ResourceId("ts_churn"),
      ResourceId("l_big"), Seq(ResourceId("f_rev"), ResourceId("f_cnt"))))
    cat.registerProvider(ProviderDef("local_spark", "SPARK_OFFLINE", "in-proc"))
    cat.registerUser(UserDef("alice"))
    // churn_model consumes through its training set; fraud_model directly
    cat.registerModel(ModelDef("churn_model",
      trainingSets = Seq(ResourceId("ts_churn"))))
    cat.registerModel(ModelDef("fraud_model", features = Seq(ResourceId("f_rev"))))
    cat.addTags(ResourceKey("SOURCE", "cust_rev.default"), Seq("core"))
    cat.addTags(ResourceKey("FEATURE", "f_rev.default"), Seq("core", "pii"))
    cat.setProperties(ResourceKey("PROVIDER", "local_spark"), Map("team" -> "data"))

    CatalogStore.save(cat, s, tmp)
    CatalogStore.load(s, tmp) // fresh catalog ≡ restarted process
  }

  private def catalogLineage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val re = lineageFixtureCatalog(s, dir)
    val rows =
      re.featuresConsumedBy("churn_model").map(f =>
        ("features_of_model", "churn_model", f.toString)) ++
      re.featuresConsumedBy("fraud_model").map(f =>
        ("features_of_model", "fraud_model", f.toString)) ++
      re.modelsConsuming(ResourceId("f_rev")).map(m =>
        ("models_consuming", "f_rev.default", m)) ++
      re.resourcesTagged("core").map(k => ("tagged_core", k.kind, k.id)) ++
      re.allProviders.map(p => ("provider_type", p.name, p.providerType)) ++
      re.allProviders.map(p => ("provider_prop_team", p.name,
        re.properties(ResourceKey("PROVIDER", p.name)).getOrElse("team", "-"))) ++
      re.allUsers.map(u => ("registered_user", u.name, "-"))
    rows.toDF("query", "subject", "related")
  }

  /** Free-text resource search over the reloaded fixture catalog — the
    * reference dashboard's metadata search (typesense role) with
    * deterministic prefix-match scoring; multi-term, tag, property, and
    * prefix cases all exercised. Oracle pins the expected ranking. */
  private def catalogSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val re = lineageFixtureCatalog(s, dir)
    val rows = Seq("rev", "core pii", "spark data", "churn", "cust")
      .flatMap { q =>
        re.search(q).zipWithIndex.map { case ((k, score), i) =>
          (q, (i + 1).toLong, k.kind, k.id, score.toLong)
        }
      }
    rows.toDF("query", "rank", "kind", "id", "score")
  }

  // ----------------- orchestrated refresh: cron + task runner + incremental

  /** The production refresh loop composed from its parts: a CronSchedule
    * decides ticks, the TaskRunner executes each refresh with durable run
    * records (and skips an already-completed tick on crash-replay), and
    * IncrementalRunner folds only the delta version dirs. Final snapshot
    * must equal a full recompute (the oracle), and the ledger must hold
    * exactly two successful runs. */
  private def orchestratedRefresh(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_orch").toString
    val ev = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"), col("event_id"))
    val cron = graft.sched.CronSchedule("*/10 * * * *")
    val runner = new graft.sched.TaskRunner(s, s"$tmp/state", maxAttempts = 2,
      backoffMs = 1)
    def msAt(minute: Int): Long = minute * 60000L
    var lastTick: Option[Long] = None

    // tick 1 (t=00:15): first delta lands, cron fires at the 00:10 tick
    graft.sources.Writers.writeVersioned(
      ev.filter(col("event_id") < 500).select("entity", "value", "ts"), s"$tmp/ev")
    require(cron.isDue(msAt(15), lastTick))
    val t1 = cron.lastDue(msAt(15)).get
    runner.run("refresh", s"tick-$t1") {
      graft.streaming.IncrementalRunner.refreshLatest(s, s"$tmp/ev", s"$tmp/snap").get
    }
    lastTick = Some(t1)
    require(!cron.isDue(msAt(15), lastTick)) // same tick never re-fires
    // crash-replay of the same tick resumes instead of re-running
    val (replay, _) = runner.run("refresh", s"tick-$t1") {
      throw new IllegalStateException("must not re-execute a completed tick")
    }
    require(replay.status == "skipped")

    // tick 2 (t=00:25): second delta, next cron tick, incremental fold
    graft.sources.Writers.writeVersioned(
      ev.filter(col("event_id") >= 500).select("entity", "value", "ts"), s"$tmp/ev")
    require(cron.isDue(msAt(25), lastTick))
    val t2 = cron.lastDue(msAt(25)).get
    runner.run("refresh", s"tick-$t2") {
      graft.streaming.IncrementalRunner.refreshLatest(s, s"$tmp/ev", s"$tmp/snap").get
    }
    val nSuccess = runner.runs().count(_.status == "success").toLong
    graft.sources.Writers.readLatest(s, s"$tmp/snap")
      .select(col("entity"), col("value"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("n_runs", lit(nSuccess))
  }

  // --------------------- sequence packing (training-run layout)

  /** Concatenate-and-chunk packing of the documents table into 512-token
    * sequences across 8 md5 shards — the GPT-style layout pass. Output is
    * the (doc, sequence) overlap map; the full pipeline (shard assignment,
    * per-shard cumulative token offsets, boundary chunking) is integer
    * arithmetic replayed exactly by the oracle. */
  private def seqPack(s: SparkSession, dir: String): DataFrame =
    graft.functions.Pack.packChunks(t(s, dir, "documents"), "doc_id", "text",
      budget = 512, nShards = 8)

  /** First-fit greedy packing (no document splits): the sequential
    * running-capacity fold runs as a sorted mapPartitions per shard; the
    * oracle replays it with a recursive CTE stepping doc-rank by doc-rank
    * within every shard in lockstep. */
  private def seqPackGreedy(s: SparkSession, dir: String): DataFrame =
    graft.functions.Pack.packGreedy(t(s, dir, "documents"), "doc_id", "text",
      budget = 512, nShards = 8)

  // --------------------- unigram-LM corpus scoring + vocabulary

  /** Per-document corpus-frequency quality score (the unigram reduction of
    * a perplexity gate): integer-exact token/frequency sums, ratios rounded
    * at the end. rare = corpus frequency < 5. */
  private def unigramLmScore(s: SparkSession, dir: String): DataFrame =
    graft.functions.UnigramLM.corpusFreqScore(
      t(s, dir, "documents"), "doc_id", "text", rareBelow = 5)

  /** Top-200 frequency-ranked vocabulary with dense deterministic ids. */
  private def vocabTopK(s: SparkSession, dir: String): DataFrame =
    graft.functions.UnigramLM.vocab(t(s, dir, "documents"), "text", topK = 200)

  /** BPE vocabulary TRAINING on the corpus (12 merges), the oracle
    * replaying every pair-count + argmax + merge round — closes the loop
    * with bpe application (text_stats n_subwords) and vocab_topk. */
  private def bpeTrainQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.BpeTrain.train(t(s, dir, "documents"), "text",
      numMerges = 12)

  /** Batched BPE training — the realistic-vocab scale path: up to 30
    * rounds × top-64 greedy symbol-disjoint accepts, ~batch/2 merges per
    * Spark job instead of one job per merge; the oracle replays the
    * greedy accept and the batched apply with recursive CTEs. On this
    * synthetic corpus (31 distinct [a-z]+ words) the trainer SATURATES:
    * 89 merges — the complete merge closure, every word fused to one
    * symbol — in 13 jobs, after which it stops on pair exhaustion; a
    * natural-language vocabulary keeps it producing ~32 merges/job to
    * any target size. */
  private def bpeTrainScaledQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.BpeTrain.trainBatched(t(s, dir, "documents"), "text",
      rounds = 30, batch = 64)

  /** The production trainer: ONE distributed word-count aggregation, then
    * the whole merge closure driver-side over incrementally-maintained
    * pair counts (~3 Spark jobs for ANY vocabulary target — a 32k vocab
    * costs the same job count as this 12-merge run). Exact sequential
    * BPE, so it shares bpe_train's replay oracle verbatim — the
    * correctness gate proving the driver closure ≡ the per-round Spark
    * loop ≡ the DuckDB replay. */
  private def bpeTrainExactQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.BpeTrain.trainScaled(t(s, dir, "documents"), "text",
      numMerges = 12)

  /** Order-2 corpus-frequency score: rare-bigram ratios catch word salad a
    * unigram gate cannot see. Same integer-exact shape as the unigram row. */
  private def bigramLmScore(s: SparkSession, dir: String): DataFrame =
    graft.functions.UnigramLM.bigramScore(
      t(s, dir, "documents"), "doc_id", "text", rareBelow = 5)

  /** Gap-based sessionization of the events stream (30-minute inactivity
    * gap): per (user, session) counts, value totals, and bounds via
    * Spark's native session_window; the oracle replays the same boundary
    * rule with a gaps-and-islands LAG. */
  private def sessionStats(s: SparkSession, dir: String): DataFrame =
    ops.Sessionize.sessionStats(
      events(s, dir), "user_id", "ts", "value", gap = "30 minutes")

  /** Image near-duplicates by perceptual average-hash: the synthetic PNG
    * corpus (media_pipeline's even-id images) decoded with the REAL codec,
    * aHash computed from the decoded pixels (exact integer
    * cross-multiplication — PNG is lossless, so the oracle re-derives the
    * hash from the generator formula), then the shared Hamming-banding
    * near-dup core (quarter pigeonhole, capped bands, bit_count verify). */
  /** Decoded-pixel aHash table for the synthetic PNG corpus (even doc ids),
    * optionally restricted — the real-codec work both image dedup queries
    * share. */
  private def imageAHashes(s: SparkSession, dir: String,
                           keep: org.apache.spark.sql.Column): DataFrame = {
    import s.implicits._
    import graft.multimodal.Codecs
    val ids = t(s, dir, "documents").select(col("doc_id").cast("long"))
      .where(col("doc_id") % 2 === 0).where(keep)
      .repartition(s.sparkContext.defaultParallelism).as[Long]
    ids.map { id =>
      val png = Codecs.syntheticPng(
        (8 + id % 24).toInt, (8 + (id * 7) % 24).toInt, id)
      (id, Codecs.averageHash(Codecs.decodeImage(png).get))
    }.toDF("media_id", "ahash")
  }

  private def imageNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.hammingNearDups(imageAHashes(s, dir, lit(true)),
      "media_id", "ahash", maxHamming = 4,
      maxBandFreq = 2000, what = "imageNearDups")

  /** Fixed-window chunking of the documents (size 120, overlap 20) — the
    * embedding-pipeline splitter, pure scan-stage arithmetic. */
  private def docChunks(s: SparkSession, dir: String): DataFrame =
    graft.functions.TextFunctions.chunkDocs(
      t(s, dir, "documents"), "doc_id", "text", size = 120, overlap = 20)

  /** Deterministic spherical k-means over the embeddings (k=8, 2 Lloyd's
    * rounds) — every refinement round replayed by the oracle (md5-order
    * init, integer-scaled centroid sums, pre-normalized dot assignment). */
  private def kmeansClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Vectors.kmeansAssign(
        t(s, dir, "embeddings"), "vec_id", "embedding", k = 8, iters = 2)
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cell"))).cast("long"))
  }

  /** Cluster-balanced diversity sample: 10 md5-picked members per k-means
    * cell — the cluster-then-sample spread primitive. */
  private def diversitySampleQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Vectors.diversitySample(
      t(s, dir, "embeddings"), "vec_id", "embedding",
      k = 8, iters = 1, perCluster = 10)

  /** SemDeDup: near-dup search confined to k-means cells (k=8, 1 round) —
    * exact cosine inside a cell only, min-id survivor rule. The whole
    * pipeline (Lloyd's loop + within-cell pairs) replays in the oracle. */
  private def semanticDedupQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Vectors.semanticDedup(
      t(s, dir, "embeddings"), "vec_id", "embedding",
      k = 8, iters = 1, threshold = 0.35)

  /** In-engine classifier training: 3 full-batch GD rounds of a hashed
    * bag-of-words linear model on the is-English label — the trained
    * model AND its scores replay exactly in the oracle (order-independent
    * quantized gradient sums). */
  private def qualityClassifierQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Classifier.trainLinearScores(
      t(s, dir, "documents"), "doc_id", "text",
      (col("lang") === "en").cast("int"), dim = 32, iters = 3)

  /** Tokenizer train → encode loop closed: learn 12 merges, then encode
    * every document with them — per-doc BPE token count + an order-pinned
    * segmentation digest, both replayed from scratch by the oracle. */
  private def bpeEncodeQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = graft.functions.BpeTrain.train(docs, "text", 12)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.functions.BpeTrain.encodeDigest(docs, "doc_id", "text", merges)
  }

  /** Tokenizer-efficiency audit: chars per BPE token per source under
    * the corpus-trained 12-merge vocabulary — the compression-ratio
    * readout a tokenizer team tracks per domain. */
  private def bpeEfficiency(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val merges = graft.functions.BpeTrain.train(docs, "text", 12)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    graft.functions.BpeTrain.encodeDigest(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_bpe_tokens")).as("total_tokens"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        col("total_tokens"),
        round(col("total_chars").cast("double") /
          col("total_tokens").cast("double"), 6).as("chars_per_token"))
  }

  /** Embedding-table quality audit per label group: dims, zero vectors,
    * non-finite components, nearest-rank median norm. */
  private def embeddingAudit(s: SparkSession, dir: String): DataFrame =
    Vectors.embeddingAudit(t(s, dir, "embeddings"), "vec_id", "embedding",
      "label", expectedDim = 8)

  /** The join advisor exercised across its three regimes on the same
    * fact×dim join — the rollup is identical, the strategy column pins
    * which plan the statistics picked. */
  private def adaptiveJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val dim = ev.select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(7)))
    def rollup(maxB: Long, skewF: Long, name: String): DataFrame = {
      val (joined, strat) = ops.Skew.adaptiveJoin(ev, dim, "user_id",
        maxBroadcastRows = maxB, skewFactor = skewF)
      joined.groupBy("segment")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total"))
        .withColumn("config", lit(name))
        .withColumn("strategy", lit(strat))
    }
    rollup(1000000L, 10L, "default")
      .unionByName(rollup(10L, 10L, "nobroadcast"))
      .unionByName(rollup(10L, 1L, "skewsensitive"))
  }

  /** Cold-start feature fallback: the as-of click feature with NULLs
    * (no history yet) filled from the global click prior — the
    * feature-store backfill rule for brand-new entities. */
  private def pitColdStart(s: SparkSession, dir: String): DataFrame = {
    val prior = broadcast(events(s, dir)
      .filter(col("event_type") === "click")
      .agg(round(sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)), 6).as("__prior")))
    pitPurchases(s, dir).crossJoin(prior)
      .select(col("user_id"), col("ts_ms"),
        col("f_click").isNull.cast("long").as("was_cold"),
        coalesce(col("f_click"), col("__prior")).as("f_click_filled"),
        col("label"))
  }

  /** Referential-integrity audit over the star schema's four FK edges:
    * child rows, distinct keys, NULL FKs, dangling keys per edge. */
  private def fkAuditQ(s: SparkSession, dir: String): DataFrame = {
    import ops.Validate.FkEdge
    ops.Validate.fkAudit(Seq(
      FkEdge("lineitem.orderkey->orders", t(s, dir, "lineitem"),
        "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
      FkEdge("orders.custkey->customer", t(s, dir, "orders"),
        "o_custkey", t(s, dir, "customer"), "c_custkey"),
      FkEdge("lineitem.partkey->part", t(s, dir, "lineitem"),
        "l_partkey", t(s, dir, "part"), "p_partkey"),
      FkEdge("lineitem.suppkey->supplier", t(s, dir, "lineitem"),
        "l_suppkey", t(s, dir, "supplier"), "s_suppkey")))
  }

  /** Staleness distribution of each user's latest value per event type
    * (nearest-rank p50/p90 minutes) — the TTL-sizing table. */
  private def featureFreshness(s: SparkSession, dir: String): DataFrame =
    ops.Profile.freshnessProfile(events(s, dir), "event_type", "user_id",
      "ts")

  /** BM25 hyperparameter stability: top-20 Jaccard overlap and Kendall τ
    * between (k1 = 1.2, b = 0.75) and (k1 = 2.0, b = 0.25). */
  private def rankStabilityQ(s: SparkSession, dir: String): DataFrame =
    functions.Retrieval.rankStability(t(s, dir, "documents"), "doc_id",
      "text", Seq("join", "vector", "stream"), k = 20,
      k1a = 1.2, bA = 0.75, k1b = 2.0, bB = 0.25)

  /** Held-out unigram perplexity: Laplace model on the md5-even half,
    * exp(mean NLL) on the other half — the LM-drift eval. */
  private def heldoutPerplexity(s: SparkSession, dir: String): DataFrame =
    functions.UnigramLM.heldoutPerplexity(t(s, dir, "documents"),
      "doc_id", "text")

  /** Padding-waste table for bucket lengths 32/64/128 — the sizing
    * audit behind the bucketed-batching vs sequence-packing decision. */
  private def padWasteQ(s: SparkSession, dir: String): DataFrame =
    functions.Pack.padWaste(t(s, dir, "documents"), "text",
      Seq(32, 64, 128))

  /** DAG orchestration: a 5-task pipeline where `clean` fails — its
    * downstream records upstream_failed without running, siblings
    * proceed; the durable ledger is the output. */
  private def dagRuns(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dag").toString
    val runner = new graft.sched.TaskRunner(s, tmp, maxAttempts = 2,
      backoffMs = 1)
    val ev = events(s, dir)
    graft.sched.Dag.run(runner, "2024-01-01",
      tasks = Map(
        "ingest" -> (() => ev.queryExecution.toRdd.count()),
        "clean" -> (() => sys.error("schema drift")),
        "features" -> (() => Materialize.latestTriple(
          ev.select(col("user_id").as("entity"), col("value"), col("ts")))
          .queryExecution.toRdd.count()),
        "train" -> (() => 1L),
        "report" -> (() => 2L)),
      deps = Map(
        "clean" -> Seq("ingest"),
        "features" -> Seq("ingest"),
        "train" -> Seq("clean", "features"),
        "report" -> Seq("train")))
    import s.implicits._
    runner.runs().map(r => (r.task, r.attempt, r.status))
      .toDF("task", "attempt", "status")
      .select(col("task"), col("attempt").cast("long").as("attempt"),
        col("status"))
  }

  /** Record-linkage fuzzy dedup: prefix blocking + Levenshtein verify at
    * 20% relative distance — the in-place-edit near-dup family, distinct
    * from the shingle pipelines. */
  private def editNearDupsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.editNearDups(
      t(s, dir, "documents"), "text", "doc_id")

  /** S5/CDF: write customer v1, then a v2 with planted deletes (%10==3),
    * updates (%10==4, +100) and inserts (%10==5 clones at key+100000);
    * `versionDiff` recovers exactly the change feed. Oracle = the planted
    * mutation rules replayed directly on the base table. */
  private def versionDiffQ(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val v2 = base.filter(col("c_custkey") % 10 =!= 3)
      .withColumn("c_acctbal", when(col("c_custkey") % 10 === 4,
        col("c_acctbal") + 100.0).otherwise(col("c_acctbal")))
      .unionByName(base.filter(col("c_custkey") % 10 === 5)
        .withColumn("c_custkey", col("c_custkey") + 100000))
    val tmp = java.nio.file.Files.createTempDirectory("graft_vdiff").toString
    val d1 = graft.sources.Writers.writeVersioned(base, s"$tmp/t")
    val d2 = graft.sources.Writers.writeVersioned(v2, s"$tmp/t")
    graft.sources.Writers.versionDiff(s, d1, d2, "c_custkey")
  }

  /** Z-order layout: orders written Morton-ordered on (custkey, cents),
    * read back through the z-range pre-filter (pushed to row-group stats)
    * plus the exact 2-D box. The result is layout-invariant — the oracle
    * is the plain box filter, with the curve arithmetic replayed in SQL. */
  private def zorderLayout(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    graft.functions.ZOrder.writeZOrdered(
      t(s, dir, "orders").withColumn("__cents", cents),
      col("o_custkey"), col("__cents"), bits = 26, numFiles = 8, s"$tmp/z")
    graft.functions.ZOrder.readBox(s, s"$tmp/z", "o_custkey", "__cents",
        bits = 26, aLo = 100, aHi = 400, bLo = 2000000, bHi = 6000000)
      .select(col("o_orderkey"), col("o_custkey"),
        col("__cents").as("cents"), col("zkey"))
  }

  /** Table-format seam on the gate: write → MERGE upsert → change feed
    * through the [[graft.sources.TableFormat]] interface (the version-dir
    * binding — the one this sandbox can run; the Delta binding shares the
    * contract via TableFormatSpec). Planted mutations: +100 balance for
    * custkey % 10 == 4 (updates), clones at key+100000 for % 10 == 5
    * (inserts); the feed must recover exactly those. */
  private def tableFormatRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val fmt = graft.sources.VersionDirFormat
    val tmp = java.nio.file.Files.createTempDirectory("graft_tfmt").toString + "/t"
    val base = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .filter(col("c_custkey") <= 300)
    val v1 = fmt.write(s, base, tmp)
    val updates = base.filter(col("c_custkey") % 10 === 4)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .unionByName(base.filter(col("c_custkey") % 10 === 5)
        .withColumn("c_custkey", col("c_custkey") + 100000))
    fmt.mergeUpsert(s, tmp, updates, "c_custkey")
    val v2 = fmt.versions(s, tmp).last
    fmt.changes(s, tmp, v1, v2, "c_custkey")
      .select(col("c_custkey"), col("change_type"),
        col("c_acctbal"), col("c_mktsegment"))
  }

  /** Incremental image dedup — the Hamming-family steady state: corpus
    * aHashes (media_id % 10 != 8) persisted as a versioned table and READ
    * BACK (8 B/image of reusable state, no re-decode), then the "new
    * batch" (media_id % 10 == 8) is decoded, hashed, and banded against
    * the union; only pairs touching the batch are reported. Oracle = the
    * full-corpus aHash replay filtered to those pairs. */
  private def incrementalImageDedup(s: SparkSession, dir: String): DataFrame = {
    val isNew = col("doc_id") % 10 === 8
    val tmp = java.nio.file.Files.createTempDirectory("graft_ahash").toString
    graft.sources.Writers.writeVersioned(
      imageAHashes(s, dir, !isNew), s"$tmp/ahash")
    Dedup.hammingNearDupsIncremental(
      graft.sources.Writers.readLatest(s, s"$tmp/ahash"),
      imageAHashes(s, dir, isNew),
      "media_id", "ahash", maxHamming = 4,
      what = "incrementalImageDedup")
  }

  /** Incremental BOUNDED simhash dedup — the Manku block keys on the
    * steady-state path: corpus simhashes (doc_id % 5 != 4) persisted as a
    * versioned table and READ BACK (8 B/doc of state), the new batch
    * banded against the union through ~32-bit combo keys; only pairs
    * touching the batch are reported. Full recall at Hamming ≤ 3 by
    * pigeonhole, so the oracle is the plain all-pairs predicate filtered
    * to batch-touching pairs. */
  private def incrementalSimhashBounded(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val isNew = col("doc_id") % 5 === 4
    val hashes = docs.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("sh"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_simh").toString
    graft.sources.Writers.writeVersioned(hashes.where(!isNew), s"$tmp/sh")
    Dedup.hammingNearDupsIncrementalBounded(
      graft.sources.Writers.readLatest(s, s"$tmp/sh"),
      hashes.where(isNew), "doc_id", "sh", maxHamming = 3)
  }

  /** Count-min heavy hitters over the token stream (depth 4 × width 16 —
    * deliberately narrow so collisions are visible): every distinct token's
    * exact count beside its sketch estimate. One-sided error (est ≥ exact)
    * shows up in the data; the oracle rebuilds the identical md5 sketch. */
  private def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    // ONE corpus pass: the exact frequency table (vocabulary-size) is the
    // barrier; the sketch builds weighted from it and the probes are its
    // keys, so nothing re-reads the token stream
    val exact = graft.functions.Dedup.barrier(
      t(s, dir, "documents")
        .select(explode(TF.tokens(lower(trim(col("text"))))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("exact_cnt")),
      checkpoint = false)
    val sketch = graft.functions.CountMin.buildWeighted(
      exact, "token", "exact_cnt", 4, 16)
    val est = graft.functions.CountMin.estimate(
      sketch, exact.select("token"), "token", 4, 16)
    exact.join(est, Seq("token"))
  }

  /** JL random projection of the embedding corpus 64 → 16 dims
    * (md5-derived Achlioptas matrix, inlined as literals): per vector the
    * first projected component, projected/original squared norms, and the
    * norm distortion the JL lemma bounds. Array outputs are reduced to
    * these scalars for the hash compare (the quantize-query convention). */
  private def embeddingProject(s: SparkSession, dir: String): DataFrame = {
    val df = t(s, dir, "embeddings")
    val proj = Vectors.randomProjection(col("embedding"), 64, 16)
    df.select(col("vec_id"), proj.as("__p"),
        Vectors.dot(col("embedding"), col("embedding")).as("__n2"))
      .select(col("vec_id"),
        round(element_at(col("__p"), 1), 6).as("y0"),
        round(Vectors.dotDouble(col("__p"), col("__p")), 6).as("proj_norm2"),
        round(col("__n2"), 6).as("orig_norm2"),
        round(Vectors.dotDouble(col("__p"), col("__p")) / col("__n2"), 6)
          .as("distortion"))
  }

  /** DSIR importance weights (hashed uni+bigram model, 4096 buckets):
    * every document scored by how much more target-like (English docs)
    * than corpus-average its n-gram bag is. One corpus-size shuffle
    * (doc×bucket partial agg); distributions and the log-ratio table are
    * bucket-bounded and broadcast; the dot product is exact DECIMAL. */
  private def dsirWeightsQ(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    graft.functions.Importance.dsirWeights(
      docs, docs.where(col("lang") === "en"), "text", "doc_id",
      buckets = 4096)
  }

  /** BM25 top-k keyword retrieval ("the 50 documents most about
    * join/vector/stream") — per-term tf/df/idf with exact integer corpus
    * statistics and fixed-order double arithmetic, so the oracle replays
    * the score bit-for-bit; top-k is TakeOrderedAndProject (partial top-k
    * per partition, never a global sort). */
  private def bm25TopKQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Retrieval.bm25TopK(
      t(s, dir, "documents"), "doc_id", "text",
      terms = Seq("join", "vector", "stream"), k = 50)

  /** Keyless interval join through the bucketized RangeJoin: high-severity
    * errors open a 30-minute incident window; every event inside a window
    * (any user — there is no equality key to lean on) rolls up to the
    * incident's blast radius. Spark alone plans the inequality join as a
    * nested loop; the operator turns it into one bucket equi-join. */
  private def rangeJoinBlast(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val incidents = ev
      .where(col("event_type") === "error" && col("value") > 200)
      .select(col("event_id").as("incident_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
    ops.RangeJoin.pointsInIntervals(
        ev.select(col("ts"), col("event_type"), col("value")), "ts",
        incidents, "w_start", "w_end", bucketMicros = 30L * 60 * 1000000)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("sum_value"))
  }

  /** Streaming counterpart of session_stats: the events table delivered
    * through a watermarked file-source stream, sessionized with the same
    * native session_window in APPEND mode (sessions emit only when the
    * watermark passes their end — the correct-by-construction finalization
    * rule), flushed by a far-future sentinel row that advances the
    * watermark past every real session. Output must equal the batch
    * sessionization, which the oracle computes. */
  private def streamingSessions(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssess").toString
    val ev = events(s, dir).select(col("user_id"), col("value"), col("ts"))
    @volatile var maxTs = new java.sql.Timestamp(0L) // scalar sentinel anchor
    awaitAll(
      () => ev.repartition(4).write.parquet(s"$tmp/in"),
      () => maxTs = maxTsOrEpoch(ev))
    import s.implicits._
    Seq((-1L, 0.0, new java.sql.Timestamp(maxTs.getTime + 86400000L)))
      .toDF("user_id", "value", "ts")
      .write.mode("append").parquet(s"$tmp/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s)) // 150-user state
    val q = try s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4).parquet(s"$tmp/in")
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        max(unix_millis(col("ts"))).as("last_ts_ms"))
      .select(col("user_id"),
        unix_millis(col("__w.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"), col("last_ts_ms"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.read.parquet(s"$tmp/out").where(col("user_id") =!= -1L)
  }

  /** Exact NDV next to the md5-HLL estimate per source — the custom
    * TypedImperativeAggregate under the gate: the oracle rebuilds the
    * registers with a GROUP BY and replays the estimator, so even the
    * approximate path is hash-checked, not trusted. */
  private def hllProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy("source")
      .agg(
        countDistinct(col("text")).as("n_exact"),
        graft.functions.expressions.Sketches.hllNdv(col("text")).as("n_hll"))

  // --------------------- per-source corpus statistics (training-mix table)

  /** The per-source rollup a training-mix decision reads: doc counts,
    * exact-dup counts (md5 digest collisions within the source), token and
    * char totals, language spread. Pure integer aggregation — one shuffle,
    * map-side partials. */
  private def domainStats(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("source"), col("lang"),
        TF.tokenCount(col("text")).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("digest"))
    docs.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("digest"))).as("n_dup_docs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("mean_chars",
        round(col("total_chars").cast("double") / col("n_docs"), 6))
  }

  // --------------------- catalog column profiling

  /** Source-registration column profile over customer (with a
    * deterministically injected null column so null counting is actually
    * exercised): rows / nulls / exact NDV / min / max per column. */
  private def columnProfile(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(
      col("c_custkey"),
      col("c_nationkey"),
      col("c_mktsegment"),
      col("c_acctbal").cast("decimal(18,2)").as("c_acctbal_dec"),
      nullif(col("c_mktsegment"), lit("BUILDING")).as("c_seg_nullable"))
    graft.ops.Profile.columnProfile(c,
      Seq("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal_dec",
        "c_seg_nullable"))
  }

  // --------------------- deterministic global shuffle (training order)

  /** Reproducible corpus shuffle for a training run: order by md5(doc_id)
    * (uniform, engine-reproducible), number rows with the distributed
    * range-exchange + zipWithIndex path (no single-partition window), emit
    * the (position, doc) manifest. */
  private def shuffleExport(s: SparkSession, dir: String): DataFrame = {
    val keyed = t(s, dir, "documents").select(col("doc_id"),
      // masked ⇒ non-negative, so the signed-Long sort order matches the
      // oracle's UBIGINT (md5_number_lower % 2^63) order
      graft.functions.expressions.Md5Long(col("doc_id").cast("string"))
        .bitwiseAND(lit(Long.MaxValue)).as("__h"))
    ops.Materialize.withDistributedRowNumber(keyed, Seq(col("__h"), col("doc_id")))
      .select(col("row_number"), col("doc_id"))
  }

  // --------------------- streaming exact dedup

  /** Streaming exact dedup: the events table is delivered TWICE through a
    * file-source stream (4+4 files over multiple micro-batches), a stateful
    * dropDuplicates on event_id keeps the first arrival of each, and the
    * per-user rollup of the deduped sink must equal the single-copy batch
    * aggregate — if the state failed to suppress a re-delivery, every count
    * doubles and the gate goes red. State is keyed by event_id only
    * (bounded by the id domain; a production pipeline bounds it with
    * dropDuplicatesWithinWatermark on the event-time column instead). */
  private def streamingDedup(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdd").toString
    // persist: both delivery writes (which must stay SEQUENTIAL — the
    // second delivery's later file mtimes put the duplicates in a later
    // micro-batch, the cross-batch state the gate exercises) re-read the
    // same projected events scan
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.repartition(4).write.parquet(s"$tmp/in")
    ev.repartition(4).write.mode("append").parquet(s"$tmp/in") // second delivery
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s)) // 150-entity state, not 32 stores
    val q = try s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4).parquet(s"$tmp/in")
      .dropDuplicates("event_id")
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.read.parquet(s"$tmp/out")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        max(unix_millis(col("ts"))).as("max_ts_ms"))
  }

  /** The production-bounded form of streaming_dedup:
    * `dropDuplicatesWithinWatermark` keys state by event_id but EVICTS
    * entries once the watermark passes their event time + delay — state
    * is time-bounded instead of id-domain-bounded. The doubled delivery
    * lands within one watermark window here, so the result must equal
    * the unbounded dedup (and the same batch oracle). */
  private def streamingDedupWm(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdw").toString
    // persist: same two-sequential-delivery shape as streamingDedup
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), col("value"), col("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ev.repartition(4).write.parquet(s"$tmp/in")
    ev.repartition(4).write.mode("append").parquet(s"$tmp/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    val q = try s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 4).parquet(s"$tmp/in")
      // delay >= the whole corpus span: every duplicate arrives while its
      // first copy's state is still live (the correctness precondition
      // the operator's docs pin; shrink the delay to trade memory for a
      // duplicate-horizon bound)
      .withWatermark("ts", "60 days")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/chk")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.read.parquet(s"$tmp/out")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        max(unix_millis(col("ts"))).as("max_ts_ms"))
  }

  /** Semi-structured JSON properties: extract `$.k` from the events
    * props column in the scan projection (codegen'd path expression, no
    * UDF) and roll up exact integer stats per event type. */
  private def jsonPropsRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"),
        count_distinct(col("k")).as("ndv_k"))

  // --------------------- training-mix planning + corpus diagnostics

  /** Temperature-1/2 mix plan over the documents table: per-source token
    * totals → sqrt-weighted sampling plan for a 1M-token budget. sqrt is
    * IEEE-exact in both engines; everything else is integer or round(…,6). */
  private def mixPlan(s: SparkSession, dir: String): DataFrame =
    graft.functions.Mix.temperatureMix(t(s, dir, "documents"), "source",
      "text", budgetTokens = 1000000L)

  /** Equal-count curriculum bins by quality rank: integer rank arithmetic
    * over the distributed row numbering — no ntile, no float thresholds. */
  private def curriculumBinsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Mix.curriculumBins(t(s, dir, "documents"), "doc_id",
      "text", nBins = 4)

  /** Cross-source duplicate provenance matrix: MinHash near-dup pairs
    * (same parameters as minhash_near_dups) rolled up per source pair. */
  private def crossSourceDupsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Dedup.crossSourceDups(t(s, dir, "documents"), "text",
      "doc_id", "source", threshold = 0.5)

  /** End-to-end corpus curation — the "v2" of corpus_clean composing the
    * whole family: MinHash near-dup pairs → connected-component clusters →
    * keep the best-quality document per cluster (singletons keep
    * themselves) → quality gate. Output `(doc_id, cluster_id, n_members,
    * quality)` of the survivors. All heavy stages are the already-bucketed
    * LSH pipeline + one cluster-keyed window; the oracle replays pairs,
    * closure, quality, and the keep-best window end-to-end. */
  private def corpusCurate(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = minhashNearDups(s, dir).select(col("idA"), col("idB"))
    val clusters = Dedup.clusterPairsAuto(pairs) // degree-probe dispatch
    val st = TF.textStats(col("text"))
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), TF.qualityScoreFrom(st).as("quality"))
    val withCluster = scored.join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"),
        col("quality"))
    val byCluster = Window.partitionBy(col("cluster_id"))
    withCluster
      .withColumn("__rn", row_number().over(
        byCluster.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .where(col("__rn") === 1 && col("quality") >= 0.5)
      .select("doc_id", "cluster_id", "n_members", "quality")
  }

  /** Nearest-rank percentile profile of order totals per priority class —
    * the numeric-column catalog profile (p_q = value at rank ceil(q·n);
    * rank selection, never interpolation). */
  private def numericProfileQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.numericProfile(
      t(s, dir, "orders").select(col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price")),
      "o_orderpriority", "price")

  /** Sketch-path percentiles beside numeric_profile's exact nearest-rank:
    * the mergeable bottom-k sample aggregate (k-bounded partial buffers —
    * the 100 TB path where the exact per-group sort window doesn't hold),
    * fully replayed by the oracle via the md5-order QUALIFY. */
  private def sketchQuantilesQ(s: SparkSession, dir: String): DataFrame =
    graft.ops.Profile.sketchQuantiles(
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price")),
      "o_orderpriority", "price", "o_orderkey", k = 1024)

  // --------------------- behavioral analytics + tabular-ML feature ops

  /** view → click → purchase funnel, 24 h horizon anchored at the first
    * view: the windowFunnel greedy earliest-chain rule, replayed by the
    * oracle as the same K−1 min-aggregate CTE chain. */
  private def eventFunnelQ(s: SparkSession, dir: String): DataFrame =
    ops.EventFunnel.funnel(events(s, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), horizonSeconds = 86400)

  /** Daily cohort retention matrix over the events table (cohort = a
    * user's first active day, offset in days). */
  private def retentionQ(s: SparkSession, dir: String): DataFrame =
    ops.Cohorts.retention(events(s, dir), "user_id", "ts", bucket = "day")

  /** SCD2 dimension build from the event stream: per-user `event_type`
    * run-length compressed into `[valid_from, valid_to)` validity
    * intervals (NULL-open current run). */
  private def scd2Q(s: SparkSession, dir: String): DataFrame =
    ops.Scd2.build(events(s, dir), "user_id", Seq("event_type"), "ts",
        "event_id")
      .select(col("user_id"), col("event_type"),
        unix_millis(col("valid_from")).as("valid_from_ms"),
        unix_millis(col("valid_to")).as("valid_to_ms"),
        col("is_current"))

  /** Market-basket pairs over lineitem (basket = order, item = part):
    * top-100 by lift at support ≥ 2. */
  private def itemCooccurQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Basket.cooccurrence(t(s, dir, "lineitem"),
      "l_orderkey", "l_partkey", minSupport = 2, topK = 100)

  /** Smoothed target encoding of the customer market segment against
    * order totals (m = 20 pseudo-counts toward the global prior). */
  private def targetEncodeQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Encoding.targetEncode(
      t(s, dir, "orders").join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey")),
      "c_mktsegment", col("o_totalprice"), smoothing = 20)

  /** Shannon entropy per customer column (one melted scan for all four;
    * per-category terms pinned to DECIMAL before the exact sum). */
  private def columnEntropyQ(s: SparkSession, dir: String): DataFrame =
    ops.InfoTheory.entropyProfile(t(s, dir, "customer"),
      Seq("c_name", "c_nationkey", "c_mktsegment", "c_acctbal"))

  /** Mutual-information contingency table between market segment and
    * nation — the categorical feature-relevance audit. */
  private def mutualInfoQ(s: SparkSession, dir: String): DataFrame =
    ops.InfoTheory.mutualInfo(t(s, dir, "customer"),
      "c_mktsegment", "c_nationkey")

  /** Weighted PageRank (3 rounds, d = 0.85) over the nation trade graph
    * (customer nation → supplier nation, weight = lineitem count); every
    * round replays in the oracle via the pinned DECIMAL rank chain. */
  private def pagerankQ(s: SparkSession, dir: String): DataFrame = {
    val edges = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.functions.Graph.pageRank(edges, "src", "dst", "w", iters = 3)
  }

  /** Group-leak-safe 5-fold assignment over events (group = user):
    * per-fold row and user counts; Σ n_users = 150 proves no user
    * straddles folds. */
  private def kfoldSplitQ(s: SparkSession, dir: String): DataFrame =
    ops.Split.withKFold(events(s, dir), Seq("user_id"), k = 5, seed = 7)
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"))

  /** Efraimidis–Spirakis weighted sample: 100 documents drawn
    * length-proportionally (weight = n_chars) via the md5-exponential
    * sort key. */
  private def weightedSampleQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Sampling.weightedSample(
      t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
      "doc_id", col("n_chars"), k = 100, seed = "ws1")

  /** Deterministic word-dropout augmentation (15% at seed aug1): per doc
    * the kept-token text plus before/after token counts. */
  private def augmentDropoutQ(s: SparkSession, dir: String): DataFrame = {
    val aug = TF.dropoutTokens(col("doc_id"), col("text"), 15, "aug1")
    t(s, dir, "documents")
      .select(col("doc_id"), TF.tokenCount(col("text")).cast("long").as("n_tokens"),
        aug.as("text_aug"))
      .withColumn("n_kept", TF.tokenCount(col("text_aug")).cast("long"))
  }

  /** SCD2 intervals consumed: the user's non-purchase activity stream
    * becomes a state dimension, and each purchase looks up the state that
    * was live at its timestamp via the keyed interval join — the classic
    * warehouse "dimension at event time" pattern (open current intervals
    * closed with a far-future sentinel for the join). */
  private def scd2LookupQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val iv = ops.Scd2.build(ev.where(col("event_type") =!= "purchase"),
        "user_id", Seq("event_type"), "ts", "event_id")
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from"),
        coalesce(col("valid_to"),
          lit("9999-01-01 00:00:00").cast("timestamp")).as("valid_to_c"))
    val pts = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    ops.RangeJoin.pointsInIntervalsKeyed(pts, "ts", "user_id",
        iv, "valid_from", "valid_to_c")
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("state"),
        unix_millis(col("valid_from")).as("state_since_ms"))
  }

  /** First-order Markov transition matrix over per-user event sequences
    * (25 cells for the 5-state alphabet). */
  private def transitionMatrixQ(s: SparkSession, dir: String): DataFrame =
    ops.Markov.transitions(events(s, dir), "user_id", "ts", "event_id",
      "event_type")

  /** Deterministic A/B readout: customers hash-assigned to 2 arms at
    * experiment exp1, order totals aggregated per arm. */
  private def experimentReadoutQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Experiment.readout(t(s, dir, "orders"), "o_custkey",
      col("o_totalprice"), experiment = "exp1", nArms = 2)

  /** Per-event-type z-score outliers of event values (|z| > 3 — the
    * heavy-tailed column; order totals are near-uniform and never reach
    * 2σ), pinned mean/sd arithmetic replayed by the oracle. */
  private def outlierZscoreQ(s: SparkSession, dir: String): DataFrame =
    ops.Outliers.zscore(events(s, dir).where(col("value").isNotNull),
        "event_type", "event_id", col("value"), zMax = 3.0)
      .withColumnRenamed("event_type", "g")

  /** Per-event-type MAD outlier screen over the same heavy-tailed value
    * column as outlier_zscore — the robust (50% breakdown) variant; all
    * comparisons exact DECIMAL, so the flagged set replays bit-for-bit. */
  private def madOutliersQ(s: SparkSession, dir: String): DataFrame =
    ops.Outliers.madOutliers(events(s, dir).where(col("value").isNotNull),
        "event_type", "event_id", col("value"), k = 6)
      .withColumnRenamed("event_type", "g")

  /** Winsorized order totals within each priority class: nearest-rank
    * p5/p95 clamp bounds per group, every row kept with its clipped
    * value — the robust-tail treatment beside the outlier screens. */
  private def winsorizeClip(s: SparkSession, dir: String): DataFrame =
    ops.Normalize.winsorize(t(s, dir, "orders"), "o_orderkey",
        "o_orderpriority", col("o_totalprice"), pctLo = 5, pctHi = 95)
      .withColumnRenamed("o_orderpriority", "g")

  /** RFM segmentation of customers from their orders (quintile scores
    * by integer rank arithmetic; recency inverted so recent = 5). */
  private def rfmSegments(s: SparkSession, dir: String): DataFrame =
    ops.Behavior.rfm(t(s, dir, "orders"), "o_custkey", "o_orderdate",
      col("o_totalprice"), nBins = 5)

  /** Sparse lexical similarity search: top-5 TF-IDF-cosine neighbors per
    * document (tokens in > 50 docs dropped before pairing — the hot-key
    * cap; weights pinned to DECIMAL so dots/norms are exact). */
  private def tfidfNeighborsQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Retrieval.tfidfNeighbors(
      t(s, dir, "documents"), "doc_id", "text", k = 5, maxDf = 50)

  /** Percentile-rank transform of order totals within each priority
    * class — the rank normalization beside the z-score screen. */
  private def percentileRankQ(s: SparkSession, dir: String): DataFrame =
    ops.Profile.percentileRank(t(s, dir, "orders"), "o_orderpriority",
      "o_orderkey", col("o_totalprice"))

  /** Inverted PHRASE-index build over the documents (bigram terms — the
    * unigram vocab of the synthetic corpus is 31 near-stopwords, all
    * above any useful df cap; bigrams spread 916 ways): per phrase the
    * sorted doc ids + aligned tfs, df > 100 phrases dropped. */
  private def postingIndexQ(s: SparkSession, dir: String): DataFrame =
    graft.functions.Postings.buildFlat(t(s, dir, "documents"), "doc_id",
      "text", maxDf = 100, ngram = 2)

  /** Per-user hour-of-day activity profile: 24-bin histogram, activity
    * entropy (pinned-decimal sum), night share. */
  private def behaviorProfileQ(s: SparkSession, dir: String): DataFrame =
    ops.Behavior.hourProfile(events(s, dir), "user_id", "ts")

  /** Per-user activity-trend slope: OLS over (day index, daily event
    * count) with exact integer sums. */
  private def activityTrendQ(s: SparkSession, dir: String): DataFrame =
    ops.Behavior.activityTrend(events(s, dir), "user_id", "ts")

  /** Quantile-normalize per-source document lengths onto the global
    * length distribution (rank selection, never interpolation). */
  private def quantileNormalizeQ(s: SparkSession, dir: String): DataFrame =
    ops.Normalize.quantileNormalize(t(s, dir, "documents"), "doc_id",
      "source", col("n_chars"), "doc_id")

  /** k-anonymity audit of the (nation, segment) quasi-identifier pair at
    * k = 10: per-group sizes with the at-risk flag. */
  private def kAnonymityQ(s: SparkSession, dir: String): DataFrame =
    ops.Privacy.kAnonymity(t(s, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"), k = 10)

  /** Seeded-Laplace private release of event-type counts (b = 2 ≙ ε = ½
    * for a count query): reproducible given the seed. */
  private def dpCountsQ(s: SparkSession, dir: String): DataFrame =
    ops.Privacy.dpNoisyCounts(events(s, dir), "event_type", b = 2.0,
      seed = "dp1")

  /** Streaming funnel under the gate: the same view→click→purchase
    * funnel as event_funnel, computed by the watermark-finalized
    * streaming state machine over a file stream, rolled up to the SAME
    * per-step counts — one oracle, two execution models (the
    * stream_asof convention, incl. the watermark-push sentinel and the
    * 2-stateful-batch lifecycle). */
  private def streamingFunnelQ(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sfun").toString
    val ev = events(s, dir)
      .select(col("user_id").as("user"), col("event_type").as("typ"),
        col("ts"))
      .where(col("typ").isin("view", "click", "purchase"))
    @volatile var maxTs = new java.sql.Timestamp(0L)
    awaitAll(
      () => ev.coalesce(1).write.parquet(s"$tmp/in"),
      () => maxTs = maxTsOrEpoch(events(s, dir)))
    locally { // sentinel pushes the final watermark past anchor + horizon
      import s.implicits._
      Seq((-1L, "view", new java.sql.Timestamp(
        maxTs.getTime + 3652L * 86400000L)))
        .toDF("user", "typ", "ts")
        .write.mode("append").parquet(s"$tmp/in")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("typ",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(s"$tmp/in")
    val depths = graft.streaming.StreamingFunnel.funnelStream(
      s, stream, Seq("view", "click", "purchase"), horizonSeconds = 86400,
      delayThreshold = "3650 days")
    val table = s"stream_funnel_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q = try depths.writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    val d = s.table(table).where(col("user") >= 0)
    Seq(("view", 1), ("click", 2), ("purchase", 3)).map { case (name, k) =>
      d.agg(sum(when(col("depth") >= k, 1L).otherwise(0L)).as("__n"))
        .select(lit(k).cast("int").as("step_idx"), lit(name).as("step"),
          coalesce(col("__n"), lit(0L)).as("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Streaming CUSUM under the gate: the same per-user drift monitor as
    * cusum_drift, folded by the watermark-finalized streaming state
    * machine ([[graft.streaming.StreamingCusum]]) over a file stream —
    * one oracle, two execution models (the streaming_funnel
    * convention). */
  private def streamingCusumQ(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scus").toString
    val ev = events(s, dir)
      .select(col("user_id").as("key"), col("event_id").as("id"),
        col("ts"), col("value").as("x"))
    @volatile var maxTs = new java.sql.Timestamp(0L)
    awaitAll(
      () => ev.coalesce(1).write.parquet(s"$tmp/in"),
      () => maxTs = maxTsOrEpoch(events(s, dir)))
    locally { // sentinel pushes the final watermark past every real row
      import s.implicits._
      Seq((-1L, -1L, new java.sql.Timestamp(
        maxTs.getTime + 3652L * 86400000L), 0.0))
        .toDF("key", "id", "ts", "x")
        .write.mode("append").parquet(s"$tmp/in")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(s"$tmp/in")
    val sums = graft.streaming.StreamingCusum.cusumStream(
      s, stream, target = 250.0, slack = 25.0, h = 500.0,
      delayThreshold = "3650 days")
    val table = s"stream_cusum_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q = try sums.toDF().writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.table(table).where(col("key") >= 0)
      .select(col("key").as("user_id"), col("n_events"), col("n_alarms"),
        col("first_alarm_ms"), col("max_stat"))
  }

  /** Streaming heartbeat-gap alerts under the gate: every >12 h pause
    * between a user's consecutive events, emitted incrementally as the
    * watermark finalizes each pair — must equal the batch LEAD
    * formulation (the streaming_cusum fold pattern, alert-shaped). */
  private def streamingGapsQ(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sgap").toString
    val ev = events(s, dir)
      .select(col("user_id").as("key"), col("event_id").as("id"), col("ts"))
    @volatile var maxTs = new java.sql.Timestamp(0L)
    awaitAll(
      () => ev.coalesce(1).write.parquet(s"$tmp/in"),
      () => maxTs = maxTsOrEpoch(events(s, dir)))
    locally {
      import s.implicits._
      Seq((-1L, -1L, new java.sql.Timestamp(
        maxTs.getTime + 3652L * 86400000L)))
        .toDF("key", "id", "ts").write.mode("append").parquet(s"$tmp/in")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", 8).parquet(s"$tmp/in")
    val gaps = graft.streaming.StreamingGaps.gapStream(
      s, stream, gapSeconds = 43200L, delayThreshold = "3650 days")
    val table = s"stream_gaps_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q = try gaps.toDF().writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.table(table).where(col("key") >= 0)
      .select(col("key").as("user_id"), col("prev_ms"), col("next_ms"),
        col("gap_s"))
  }

  /** Kaplan–Meier time-to-conversion: first signup → first later
    * purchase, right-censored at 2024-01-31; ln-sum cumulative product
    * over the pinned-decimal running sum. */
  private def survivalKmQ(s: SparkSession, dir: String): DataFrame =
    ops.Survival.kaplanMeier(ops.Survival.durations(events(s, dir),
      "user_id", "ts", "event_type", "signup", "purchase",
      lit("2024-01-31 00:00:00").cast("timestamp")))

  /** Pearson correlation matrix of the four lineitem numerics — one
    * full-scan aggregate, six pair rows. */
  private def featureCorrQ(s: SparkSession, dir: String): DataFrame =
    ops.Stats.corrMatrix(t(s, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  // ------------------------------------------------- round-5 additions

  /** Interval union coverage + max concurrency per user: each event opens
    * a `value`-minute activity window; overlaps merge (gaps-and-islands),
    * depth by sweep-line — both per-key window scans. */
  private def intervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val iv = ev.select(col("user_id"),
      unix_millis(col("ts")).as("s_ms"),
      (unix_millis(col("ts")) + floor(col("value") * 60000).cast("long"))
        .as("e_ms"))
    ops.Intervals.coverage(iv, "user_id", "s_ms", "e_ms")
      .select(col("key").as("user_id"), col("n_intervals"),
        col("n_islands"), col("covered_ms"), col("max_depth"))
  }

  /** Nearest-event join: every purchase matched to the time-closest click
    * (either direction; ties prefer the earlier click). */
  private def nearestJoinQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value"))
    ops.NearestJoin.nearest(purchases, clicks, "user_id", "ts",
        "event_id", "value", "value")
      .select(col("key").as("entity"), col("left_id").as("event_id"),
        unix_millis(col("ts")).as("ts_ms"), col("left_value").as("label"),
        unix_millis(col("near_ts")).as("near_ts_ms"),
        col("near_value"), col("near_dir"))
  }

  /** Closed-form OLS: l_extendedprice ~ l_quantity + l_discount, one
    * aggregate + Cramer solve. */
  private def linregFit(s: SparkSession, dir: String): DataFrame =
    ops.Stats.ols2(t(s, dir, "lineitem"),
      "l_extendedprice", "l_quantity", "l_discount")

  /** Multinomial naive Bayes language model trained and applied on the
    * documents corpus (self-classification diagnostics). */
  private def naiveBayesLang(s: SparkSession, dir: String): DataFrame =
    functions.Bayes.classifySelf(t(s, dir, "documents"),
        "doc_id", "text", "lang")
      .select(col("id").as("doc_id"), col("actual"), col("pred"), col("hit"))

  /** Top-25 triangle-participating parts in the co-order graph (parts
    * appearing on the same order are connected). */
  private def triangleCountQ(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.as("x").join(li.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
    // Broadcast-gate probe without running the self-join twice: the pair
    // count is bounded by Σ c·(c−1)/2 over per-order line counts — ONE
    // linear partial-agg pass over lineitem, where triangleCounts' default
    // probe (edges.count()) would materialize the whole co-part self-join
    // a second time just to count it. Same gate decision (an upper bound
    // under the cap still proves the broadcast is safe; above it the
    // unhinted/AQE path is taken exactly as before).
    val bound = li.groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") * (col("c") - 1)), lit(0L)).as("s"))
      .head().getLong(0) / 2
    functions.Graph.triangleCounts(pairs, "a", "b",
      maxBroadcastEdges = if (bound <= 5000000L) Long.MaxValue else 0L,
      // above the broadcast cap, the same bound sizes the wedge Bloom
      // pre-filter (guide §3.2) — on the bench SF the hint path runs and
      // the bloom never fires
      expectedEdges = bound)
      .select(col("v").cast("long").as("part"), col("n_triangles"))
      .orderBy(col("n_triangles").desc, col("part").asc)
      .limit(25)
  }

  /** Adamic–Adar link prediction over the thresholded co-order part
    * graph (parts co-ordered in ≥ 2 orders): top-50 predicted non-edges
    * by the pinned-DECIMAL AA score. */
  private def linkPredictionQ(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.as("x").join(li.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
    functions.Graph.linkPrediction(e, "a", "b", k = 50, maxDeg = 50)
  }

  /** Cross-source audience overlap from MERGED persisted HLL sketches —
    * per source pair: exact distinct texts each side, exact
    * intersection, the per-source HLL estimates, the union estimate
    * from an elementwise register max (NO corpus rescan), and the
    * inclusion-exclusion intersection estimate. */
  private def hllOverlap(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.Sketches
    val docs = t(s, dir, "documents")
    val sk = docs.groupBy(col("source"))
      .agg(Sketches.hllSketch(col("text")).as("sk"),
        Sketches.hllNdv(col("text")).as("est"),
        countDistinct(col("text")).as("n_exact"))
    val dt = docs.select(col("source"), col("text")).distinct()
    val inter = dt.as("x").join(dt.as("y"), "text")
      .filter(col("x.source") < col("y.source"))
      .select(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("exact_inter"))
    sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        col("a.n_exact").as("exact_a"), col("b.n_exact").as("exact_b"),
        col("a.est").as("est_a"), col("b.est").as("est_b"),
        Sketches.hllUnionEst(col("a.sk"), col("b.sk")).as("union_est"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("exact_a"), col("exact_b"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        col("est_a"), col("est_b"), col("union_est"),
        (col("est_a") + col("est_b") - col("union_est")).as("inter_est"))
  }

  /** Per-user EWMA of event values (α = 1/4) — the sorted-fold smoother. */
  private def ewmaSmooth(s: SparkSession, dir: String): DataFrame =
    ops.Smooth.ewma(events(s, dir), "user_id", "ts", "event_id", "value")
      .select(col("key").as("user_id"), col("n_events"),
        round(col("ewma"), 6).as("ewma"))

  /** Per-user Holt level+trend smoothing of event values (α = β = 1/4)
    * with the one-step forecast — the trend-aware twin of ewma_smooth. */
  private def holtTrend(s: SparkSession, dir: String): DataFrame =
    ops.Smooth.holt(events(s, dir), "user_id", "ts", "event_id", "value")
      .withColumnRenamed("key", "user_id")

  /** Day-of-week seasonality factors per event type (dow 0 = Monday;
    * observed-day means, one rounded division per output cell). */
  private def seasonalDowQ(s: SparkSession, dir: String): DataFrame =
    ops.Behavior.seasonalDow(events(s, dir), "event_type", "ts")
      .withColumnRenamed("event_type", "g")

  /** Hashing-trick featurization of user behavior (event type + value
    * bucket tokens → 16 signed-count dims). */
  private def featureHashQ(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val toks = ev.select(col("user_id"), explode(array(
      col("event_type"),
      concat(lit("vb"), floor(col("value") / 50).cast("long").cast("string"))))
      .as("tok"))
    // long format (one row per dim) — every vector cell oracle-checked
    functions.Hashing.hashFeatures(toks, "user_id", "tok", 16)
      .select(col("id").as("user_id"),
        posexplode(col("fvec")).as(Seq("j", "c")))
  }

  /** Stream-stream time-interval join under the gate: purchases within
    * two hours after a click, replayed through two file-source streams;
    * inner-join pairs emit as matches arrive (watermarks bound state, not
    * emission), so the emitted set must equal the batch interval join —
    * which the oracle computes. */
  private def streamIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sij").toString
    val ev = events(s, dir)
    awaitAll(
      () => ev.filter(col("event_type") === "click")
        .select(col("user_id").as("entity"), col("value"), col("ts"))
        .coalesce(1).write.parquet(s"$tmp/l"),
      () => ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("entity"), col("value"), col("ts"))
        .coalesce(1).write.parquet(s"$tmp/r"))
    val lStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/l", 8)
    val rStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/r", 8)
    val joined = graft.streaming.StreamingJoin.intervalJoin(
      lStream, rStream, delayThreshold = "3650 days", lenSeconds = 7200L)
    val table = s"stream_ij_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    // 8 state partitions, MEASURED: cores-sized state partitions (32) were
    // tried this round on the ~20 s-of-task-time join and regressed the
    // query 3.78 → 9.9 s min — per-partition state-store load/commit cost
    // dominates the added parallelism at this state size. Partition count
    // never affects the emitted set.
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    val q = try joined.writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.table(table).select(col("entity"),
      unix_millis(col("l_ts")).as("l_ts_ms"), col("l_value"),
      unix_millis(col("r_ts")).as("r_ts_ms"), col("r_value"))
  }

  /** Product-quantization codes over the embeddings corpus: 4 subspaces
    * of 16 dims, 16 centroids each, 1 Lloyd round — every codebook and
    * code replayed by the oracle. */
  private def pqCodesQ(s: SparkSession, dir: String): DataFrame =
    functions.Vectors.pqCodes(t(s, dir, "embeddings"),
      "vec_id", "embedding", m = 4, subDim = 16, k = 16, iters = 1)

  /** Next-event prediction eval: the Markov transition matrix trained on
    * the first three weeks, argmax prediction scored on the rest — the
    * model-quality loop over [[ops.Markov]]. */
  private def markovAccuracy(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cut = lit("2024-01-22 00:00:00").cast("timestamp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withNext = ev
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .where(col("next_type").isNotNull)
    val train = withNext.where(col("next_ts") < cut)
    val test = withNext.where(col("next_ts") >= cut)
    val wm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("n").desc, col("next_type").asc)
    val pred = train.groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__rn", row_number().over(wm))
      .where(col("__rn") === 1)
      .select(col("event_type"), col("next_type").as("pred"))
    test.join(pred, "event_type")
      .groupBy(col("event_type"), col("pred"))
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("next_type") === col("pred"), 1L).otherwise(0L))
          .as("n_hit"))
  }

  /** Lifetime aggregate features maintained INCREMENTALLY: three
    * chronological batches folded through partial-aggregate merges; the
    * oracle recomputes from scratch — merge ≡ recompute is the gate. */
  private def incrementalRollup(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    def slice(lo: Option[String], hi: Option[String]) = {
      val conds =
        lo.map(l => col("ts") >= lit(l).cast("timestamp")).toSeq ++
          hi.map(h => col("ts") < lit(h).cast("timestamp"))
      conds.foldLeft(ev)((d, c) => d.where(c))
    }
    var state = ops.Materialize.rollupOf(
      slice(None, Some("2024-01-11 00:00:00")))
    state = ops.Materialize.rollupIncrement(state,
      slice(Some("2024-01-11 00:00:00"), Some("2024-01-21 00:00:00")))
    state = ops.Materialize.rollupIncrement(state,
      slice(Some("2024-01-21 00:00:00"), None))
    state.select(col("entity"), col("n"),
      col("sum_v").cast("double").as("sum_v"),
      col("min_v").cast("double").as("min_v"),
      col("max_v").cast("double").as("max_v"))
  }

  /** Rolling 7-day active users per window-end day — the mergeable-sketch
    * window pattern: each (user, day) fans out to the ≤7 window ends it
    * feeds (bounded fanout, one shuffle), exact distinct beside the
    * deterministic md5-HLL estimate so the sketch's error is visible
    * data. */
  private def rollingActive(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    ev.select(col("user_id"), explode(sequence(lit(0), lit(6))).as("k"),
        col("d"))
      .select(col("user_id"), date_add(col("d"), col("k")).as("w"))
      .groupBy(col("w"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        graft.functions.expressions.Sketches
          .hllNdv(col("user_id").cast("string")).as("n_hll"))
      .select(col("w").cast("string").as("window_end"),
        col("n_exact"), col("n_hll"))
  }

  /** Flesch reading-ease per document from three regexp counters (vowel
    * runs ≈ syllables, [.!?]+ runs ≈ sentences, whitespace tokens) — one
    * scan-stage projection, one fixed double expression. */
  private def fleschReadability(s: SparkSession, dir: String): DataFrame = {
    val words = TF.tokenCount(col("text")).cast("long")
    val sentences = greatest(lit(1L),
      regexp_count(col("text"), lit("[.!?]+")).cast("long"))
    val syllables = greatest(lit(1L),
      regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long"))
    t(s, dir, "documents")
      .where(words > 0)
      .select(col("doc_id"), words.as("n_words"), sentences.as("n_sentences"),
        syllables.as("n_syllables"),
        round(lit(206.835) -
          lit(1.015) * (words.cast("double") / sentences.cast("double")) -
          lit(84.6) * (syllables.cast("double") / words.cast("double")), 6)
          .as("flesch"))
  }

  /** Order-independent reconciliation checksums: per table, row count +
    * bit_xor of 63-bit md5 row keys over integer columns — the
    * source-vs-sink audit any export pipeline runs. */
  private def auditChecksum(s: SparkSession, dir: String): DataFrame = {
    def chk(name: String, df: DataFrame, key: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("n"),
          bit_xor(functions.expressions.Md5Long(key)
            .bitwiseAND(lit(Long.MaxValue))).as("checksum"))
        .select(lit(name).as("table_name"), col("n"), col("checksum"))
    chk("orders", t(s, dir, "orders"),
      concat_ws("|", col("o_orderkey"), col("o_custkey")))
      .unionByName(chk("lineitem", t(s, dir, "lineitem"),
        concat_ws("|", col("l_orderkey"), col("l_partkey"),
          col("l_linenumber"))))
      .unionByName(chk("customer", t(s, dir, "customer"),
        concat_ws("|", col("c_custkey"), col("c_nationkey"))))
  }

  /** Deterministic subsample bootstrap: 50 half-samples gated by the 50
    * low bits of ONE md5 per row, ALL resample sums accumulated by a single
    * [[graft.functions.expressions.BitPlaneSum]] aggregate buffer in ONE
    * scan (no explode, no join, no window; the 102-separate-aggregates
    * formulation was semantically identical but its whole-stage codegen
    * took ~8 s to compile), integer-cents-exact sums, nearest-rank p5/p95
    * via array_sort. A distribution-free CI with zero RNG state at
    * one-scan cost. */
  private def bootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val h = functions.expressions.Md5Long(
      concat_ws("|", col("l_orderkey"), col("l_linenumber")))
      .bitwiseAND(lit(Long.MaxValue))
    // exact integer CENTS keep the accumulator on primitive longs; a
    // 100 TB run would move the cents sums to DECIMAL — same oracle
    val li = t(s, dir, "lineitem").select(h.as("__h"),
      (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qc"))
    val one = li.agg(functions.expressions.BitPlane
      .bitPlaneSum(col("__h"), col("qc"), 50).as("__bp"))
    // zero-count guards: ANSI division faults on an EMPTY table otherwise
    val means = array_sort(zip_with(
      col("__bp.sums"), col("__bp.counts"),
      (sv, cv) => when(cv === 0, lit(null))
        .otherwise(sv.cast("double") / lit(100.0) / cv)))
    one.select(col("__bp.n").as("n"),
      when(col("__bp.n") === 0, lit(null)).otherwise(
        round(col("__bp.tot").cast("double") / lit(100.0) / col("__bp.n"), 6))
        .as("mean_full"),
      round(element_at(means, 3), 6).as("ci_lo"),
      round(element_at(means, 48), 6).as("ci_hi"))
  }

  /** Per-user CUSUM drift monitor over event values (target 250, slack
    * 25, threshold 500): alarms, first alarm time, peak statistic. */
  private def cusumDrift(s: SparkSession, dir: String): DataFrame =
    ops.Smooth.cusum(events(s, dir), "user_id", "ts", "event_id", "value",
        target = 250.0, slack = 25.0, h = 500.0)
      .select(col("key").as("user_id"), col("n_events"), col("n_alarms"),
        col("first_alarm_ms"), col("max_stat"))

  /** l-diversity audit beside k_anonymity: distinct sensitive values
    * (order priority) per quasi-identifier group (segment, order month),
    * groups below l = 3 flagged. */
  private def lDiversityQ(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").join(t(s, dir, "customer"),
      col("o_custkey") === col("c_custkey"))
    o.groupBy(col("c_mktsegment").as("segment"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("o_orderpriority")).as("l_sensitive"))
      .select(col("segment"), col("month").cast("string").as("month"),
        col("n"), col("l_sensitive"),
        when(col("l_sensitive") < 3, 1L).otherwise(0L).as("at_risk"))
  }

  /** Stream enriched by a STATIC dimension (broadcast join inside the
    * micro-batch): the event stream joined to customer market segments;
    * emitted rows must equal the batch join. */
  private def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    events(s, dir).select(col("user_id").as("entity"), col("value"), col("ts"))
      .coalesce(2).write.parquet(s"$tmp/in")
    val dim = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/in", 1)
      .join(broadcast(dim), col("entity") + 1 === col("c_custkey"), "left")
      .select(col("entity"), unix_millis(col("ts")).as("ts_ms"), col("value"),
        col("c_mktsegment").as("segment"))
    val table = s"stream_ssj_${System.nanoTime()}"
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    graft.streaming.StreamRun.await(q)
    s.table(table)
  }

  /** ADC search over the PQ codes: every corpus vector whose id is a
    * multiple of 100 queries the code table via per-subspace lookup
    * tables; every LUT entry and every score replayed by the oracle. */
  private def pqSearchQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // driver-side query fixture (like vectorIndexServe): a handful of
    // corpus vectors, metadata-scale collect
    val qs = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .toSeq.sortBy(_._1)
    functions.Vectors.pqSearch(emb, "vec_id", "embedding",
      m = 8, subDim = 8, k = 16, iters = 3, queries = qs, topK = 10,
      rerank = 50)
  }

  /** Isotonic (PAV) calibration: purchase rate vs value bucket per user
    * cohort, fitted nondecreasing. Oracle = the minimax identity over
    * prefix ranges (no fold replay needed). */
  private def isotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val bins = ev.select((col("user_id") % 4).as("key"),
        floor(col("value") / 25).cast("long").as("x"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("key"), col("x"))
      .agg(sum(col("y")).as("ys"), count(lit(1)).as("n"))
    ops.Isotonic.pavFit(bins, "key", "x", "ys", "n")
  }

  /** Marketing attribution: for every purchase, the first/last click in
    * the preceding 7 days — the bucketless keyed range join feeding a
    * per-purchase rollup. */
  private def attributionTouch(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("entity"), col("ts").as("c_ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("entity"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val iv = purch.withColumn("w_start", col("p_ts") - expr("interval 7 days"))
    val joined = ops.RangeJoin.pointsInIntervalsKeyed(
      clicks, "c_ts", "entity", iv, "w_start", "p_ts")
    val agg = joined.groupBy(col("p_id").as("__pid"))
      .agg(min(col("c_ts")).as("__first"), max(col("c_ts")).as("__last"),
        count(lit(1)).as("__n"))
    purch.join(agg, col("p_id") === col("__pid"), "left")
      .select(col("p_id"), col("entity"), unix_millis(col("p_ts")).as("p_ts_ms"),
        unix_millis(col("__first")).as("first_click_ms"),
        unix_millis(col("__last")).as("last_click_ms"),
        coalesce(col("__n"), lit(0L)).as("n_clicks"))
  }

  /** Leakage-safe temporal split with a per-entity embargo: test is
    * everything from the cut; each entity's train rows inside the 2-day
    * embargo before its OWN first test row are quarantined. */
  private def timeSplitEmbargo(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val cut = lit("2024-01-22 00:00:00").cast("timestamp")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val firstTest = min(when(col("ts") >= cut, col("ts"))).over(w)
    ev.select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
      when(col("ts") >= cut, lit("test"))
        .when(firstTest.isNotNull &&
          col("ts") >= firstTest - expr("interval 2 days"), lit("embargo"))
        .otherwise(lit("train")).as("split"))
  }

  /** LEFT OUTER stream-stream interval join: clicks with no purchase in
    * the following 2 hours must emit their NULL row — but only after the
    * watermark proves no late match can arrive (sentinels push it past
    * the data; one no-data batch flushes). Oracle = the batch left
    * join. */
  private def streamIntervalJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sijo").toString
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("entity"), col("value"), col("ts"))
    @volatile var maxTs = new java.sql.Timestamp(0L)
    awaitAll(
      () => clicks.coalesce(1).write.parquet(s"$tmp/l"),
      () => purch.coalesce(1).write.parquet(s"$tmp/r"),
      () => maxTs = maxTsOrEpoch(ev))
    def sentinel: DataFrame = {
      import s.implicits._
      Seq((-1L, 0.0, new java.sql.Timestamp(
        maxTs.getTime + 3651L * 86400000L))).toDF("entity", "value", "ts")
    }
    awaitAll(
      () => sentinel.write.mode("append").parquet(s"$tmp/l"),
      () => sentinel.write.mode("append").parquet(s"$tmp/r"))
    val lStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/l", 8)
    val rStream = graft.streaming.StreamingLatest.readTripleStream(s, s"$tmp/r", 8)
    val joined = graft.streaming.StreamingJoin.intervalJoin(
      lStream, rStream, delayThreshold = "3650 days", lenSeconds = 7200L,
      joinType = "leftOuter")
    val table = s"stream_ijo_${System.nanoTime()}"
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    // 8 state partitions — cores-sized was measured worse, see
    // stream_interval_join
    s.conf.set("spark.sql.shuffle.partitions", statePartitions(s))
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val q = try joined.writeStream.outputMode("append")
      .format("memory").queryName(table)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    graft.streaming.StreamRun.await(q)
    s.table(table).filter(col("entity") >= 0)
      .select(col("entity"), unix_millis(col("l_ts")).as("l_ts_ms"),
        col("l_value"), unix_millis(col("r_ts")).as("r_ts_ms"),
        col("r_value"))
  }

  /** Jaro-Winkler record linkage over 40-char document-name prefixes,
    * blocked on the first token — finds the planted near-dup families the
    * shingle pipelines find, via the name-variant comparator instead. */
  private def fuzzyLink(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "documents")
      .filter(length(trim(col("text"))) >= 10)
      .select(col("doc_id"), substring(trim(col("text")), 1, 40).as("nm"))
    Dedup.fuzzyLink(names, "nm", "doc_id", minSim = 0.9)
      .select(col("idA").as("id_a"), col("idB").as("id_b"), col("jw"))
  }

  /** Multi-pass linkage: 2-token prefix ∪ sorted-2-token blocking — the
    * recall remedy for the bounded default, both passes capped. */
  private def fuzzyLinkMultiPass(s: SparkSession, dir: String): DataFrame = {
    val names = t(s, dir, "documents")
      .filter(length(trim(col("text"))) >= 10)
      .select(col("doc_id"), substring(trim(col("text")), 1, 40).as("nm"))
    Dedup.fuzzyLinkMultiPass(names, "nm", "doc_id", minSim = 0.9)
      .select(col("idA").as("id_a"), col("idB").as("id_b"), col("jw"))
  }

  /** Exact ROC AUC of event value against the is-purchase label — the
    * Mann-Whitney rank form over the distinct-score histogram. */
  private def binaryAuc(s: SparkSession, dir: String): DataFrame =
    functions.EvalMetrics.binaryAuc(events(s, dir),
      round(col("value"), 2), (col("event_type") === "purchase").cast("long"))

  /** KS statistic of the same score/label pair as binary_auc: max CDF
    * gap in exact integer form, the attaining score as the cut point. */
  private def ksStatistic(s: SparkSession, dir: String): DataFrame =
    functions.EvalMetrics.ksStatistic(events(s, dir),
      round(col("value"), 2), (col("event_type") === "purchase").cast("long"))

  /** χ² token selection on documents: top-15 tokens per language by the
    * presence × class chi-square (minDf 5). */
  private def chi2Tokens(s: SparkSession, dir: String): DataFrame =
    ops.InfoTheory.chi2Tokens(t(s, dir, "documents"), "doc_id", "text",
      "lang", k = 15, minDf = 5L)

  /** Top-50 per-user event-type trigram paths — order-2 sequence mining
    * beside the Markov transition matrix. */
  private def pathTrigrams(s: SparkSession, dir: String): DataFrame =
    ops.Markov.pathTrigrams(events(s, dir), "user_id", "ts", "event_id",
      "event_type", k = 50)

  /** Content-defined-chunking dedup audit per source (8-gram rolling
    * cut, modulus 64 — expected ~64-char chunks): total vs distinct
    * chunk mass, the storage-dedup ratio. */
  private def cdcDedup(s: SparkSession, dir: String): DataFrame =
    functions.Dedup.cdcDedupStats(t(s, dir, "documents"), "doc_id",
      "text", "source", gramK = 8, modulus = 64)

  /** UCB1 bandit readout over event types (reward = value): mean plus
    * the sqrt(2 ln N / n) exploration bonus, fully pinned. */
  private def banditUcb(s: SparkSession, dir: String): DataFrame =
    functions.Experiment.ucb1(events(s, dir), "event_type", col("value"))

  /** Incremental NDV maintenance: per-source HLL sketches built on two
    * disjoint batches (doc_id % 5 splits), MERGED by register max — the
    * estimate equals the full-rescan estimate exactly, which is the
    * sketch-table maintenance contract at 100 TB. */
  private def incrementalHll(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.Sketches
    val docs = t(s, dir, "documents")
    val sk = docs
      .groupBy(col("source"), (col("doc_id") % 5 === 0).cast("int").as("__b"))
      .agg(Sketches.hllSketch(col("text")).as("sk"))
    val empty = lit(new Array[Byte](1024))
    val merged = sk.groupBy("source")
      .agg(max(when(col("__b") === 0, col("sk"))).as("sk0"),
        max(when(col("__b") === 1, col("sk"))).as("sk1"))
      .select(col("source"), Sketches.hllUnionEst(
        coalesce(col("sk0"), empty), coalesce(col("sk1"), empty))
        .as("est_incremental"))
    val full = docs.groupBy("source")
      .agg(Sketches.hllNdv(col("text")).as("est_full"),
        countDistinct(col("text")).as("n_exact"))
    merged.join(full, "source")
  }

  /** Zipf-slope audit of the top-300 vocabulary — log-log OLS of
    * frequency on rank; natural text sits near −1. */
  private def zipfSlope(s: SparkSession, dir: String): DataFrame =
    ops.Stats.zipfSlope(t(s, dir, "documents"), "text", topK = 300)

  /** CUBE over priority × status through the T1 SQL surface — all four
    * grouping-set combinations plus GROUPING flags in one pass. */
  private val qCubeSql =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COALESCE(o_orderstatus, 'ALL') AS status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM {{orders}}
      |GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin

  private def qCube(s: SparkSession, dir: String): DataFrame =
    SqlTransform.runWith(s, qCubeSql,
      Map(ResourceId("orders") -> t(s, dir, "orders")))

  /** 7-day-half-life decayed engagement per user (weights and weighted
    * values pinned round(·,9)→DECIMAL before the exact sums). */
  private def decayFeaturesQ(s: SparkSession, dir: String): DataFrame =
    ops.Behavior.decayFeatures(events(s, dir), "user_id", "ts",
      col("value"), halfLifeDays = 7)

  /** Per-event-type change point of the daily volume series — the split
    * day maximizing the two-sample mean gap. */
  private def changePointQ(s: SparkSession, dir: String): DataFrame =
    ops.Smooth.changePoint(events(s, dir), "event_type", "ts")
      .withColumnRenamed("key", "g")
      .withColumn("split_day", col("split_day").cast("string"))

  /** Platt calibration of the binary_auc score/label pair (5 GD rounds,
    * quantized gradients — the model replays bit-for-bit). */
  private def plattScaleQ(s: SparkSession, dir: String): DataFrame =
    functions.Classifier.plattScale(events(s, dir),
      round(col("value"), 2) / 1000,
      (col("event_type") === "purchase").cast("long"))

  /** Quantity-weighted median unit revenue per return flag — the lower
    * weighted median under the exact decimal half-weight rule. */
  private def weightedMedianQ(s: SparkSession, dir: String): DataFrame =
    ops.Profile.weightedMedian(t(s, dir, "lineitem"), "l_returnflag",
      col("l_extendedprice"), col("l_quantity"), "l_orderkey")

  /** Bloom-prefiltered join: lineitems of the top-price order sliver —
    * the scan-stage key filter keeps non-matching fact rows out of the
    * shuffle; the result is row-identical to the plain join. */
  private def bloomJoin(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val small = t(s, dir, "orders").where(col("o_totalprice") > 490000)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    ops.Skew.bloomPrefilteredJoin(big, small, "l_orderkey")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }

  /** GDPR delete propagation: erase a deterministic user cohort
    * (user_id % 97 == 13) from the event log AND its downstream
    * latest-features materialization, emitting the per-table audit the
    * compliance run files. The deletes are key-predicate anti-joins — on a
    * partitioned lake only partitions containing hits are rewritten
    * (the version-dir writers' partition pruning); nothing here scans more
    * than once. */
  private def forgetUser(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val gone = col("user_id") % 97 === 13
    val mv = Materialize.latestTriple(
      ev.select(col("user_id").as("entity"), col("value"), col("ts")))
    def audit(name: String, df: DataFrame, hit: org.apache.spark.sql.Column) =
      df.agg(count(lit(1)).as("rows_before"),
          sum(hit.cast("long")).as("rows_deleted"))
        .select(lit(name).as("table_name"), col("rows_before"),
          col("rows_deleted"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"))
    audit("events", ev, gone)
      .unionByName(audit("features_latest", mv, col("entity") % 97 === 13))
  }

  /** Vocabulary-coverage audit: per-document OOV rate against the corpus
    * top-500 vocab. */
  private def oovRate(s: SparkSession, dir: String): DataFrame =
    functions.UnigramLM.oovRate(t(s, dir, "documents"), "doc_id", "text", 500)

  /** Planner-style join-cardinality estimate: |orders ⋈ lineitem| on
    * orderkey from two count-min sketches vs the exact histogram product —
    * the size-before-you-run check a 100 TB join plan starts with. */
  private def joinSizeEst(s: SparkSession, dir: String): DataFrame =
    functions.CountMin.joinSizeEstimate(
      t(s, dir, "orders"), "o_orderkey",
      t(s, dir, "lineitem"), "l_orderkey", depth = 4, width = 1024)

  /** Join-key skew report for events.user_id: row/key counts, hottest-key
    * share, nearest-rank p99 frequency, hot-key count (>10× mean), and the
    * integer salt factor a salted join of this key would need — the
    * pre-flight diagnostic behind skew_salted_join. All exact integer
    * arithmetic; the one ranking window runs over the KEY table (bounded
    * by key cardinality, not row count). */
  private def skewReport(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("f"))
    val base = freq.agg(sum(col("f")).as("n_rows"),
      count(lit(1)).as("n_keys"), max(col("f")).as("max_freq"))
    val ranked = freq.withColumn("rk",
      row_number().over(Window.orderBy(col("f").asc, col("user_id").asc)))
    val withTotals = freq.crossJoin(broadcast(base))
    val hot = withTotals
      .agg(sum(when(col("f") * col("n_keys") > col("n_rows") * 10, 1L)
        .otherwise(0L)).as("n_hot_keys"))
    val p99 = ranked.crossJoin(broadcast(base))
      .where(col("rk") === ceil(col("n_keys") * 0.99).cast("long"))
      .select(col("f").as("p99_freq"))
    base.crossJoin(p99).crossJoin(hot)
      .select(col("n_rows"), col("n_keys"), col("max_freq"),
        round(col("max_freq").cast("double") / col("n_rows").cast("double"), 6)
          .as("top1_share"),
        col("p99_freq"), col("n_hot_keys"),
        ((col("max_freq") * col("n_keys") + col("n_rows") - 1) / col("n_rows"))
          .cast("long").as("salt_factor"))
  }

  /** Per-document trigram novelty: share of a doc's distinct word 3-grams
    * found nowhere else in the corpus — the memorization/boilerplate
    * audit. */
  private def gramNovelty(s: SparkSession, dir: String): DataFrame =
    functions.Decontam.gramNovelty(t(s, dir, "documents"), "doc_id", "text",
      n = 3)

  /** Equal-width 20-bin histogram of order totals — the catalog's numeric
    * distribution profile beside numeric_profile's percentiles. */
  private def valueHistogram(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_totalprice").as("v"))
    val mm = o.agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    o.crossJoin(broadcast(mm))
      .select(least(floor((col("v") - col("lo")) /
        ((col("hi") - col("lo")) / 20.0)), lit(19.0)).cast("long").as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        round(col("lo") + col("bin") * ((col("hi") - col("lo")) / 20.0), 6)
          .as("bin_lo"),
        round(col("lo") + (col("bin") + 1) * ((col("hi") - col("lo")) / 20.0), 6)
          .as("bin_hi"),
        col("n"))
  }

  /** Contrastive hard-negative mining: per sampled query vector, the
    * top-5 corpus vectors in the cosine band [0.2, 0.9) — informative
    * negatives below the near-duplicate band. */
  private def hardNegativesQ(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    functions.Vectors.hardNegatives(emb, "vec_id", "embedding",
      emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
      lo = 0.2, hi = 0.9, k = 5)
  }

  /** Corpus-shift audit: Jensen-Shannon divergence of token
    * distributions between every source pair over the top-200 vocab. */
  private def vocabJsDiv(s: SparkSession, dir: String): DataFrame =
    ops.Drift.vocabJsDivergence(t(s, dir, "documents"), "source", "text",
      topK = 200)

  /** One-row corpus data card: the overview a dataset release ships —
    * doc/source/lang counts, token/char totals, exact-dup rate, English
    * share. One scan, one partial-aggregated rollup. */
  private def corpusCard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"), col("lang"),
        TF.tokenCount(col("text")).cast("long").as("n_toks"),
        length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("digest"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_toks")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (count(lit(1)) - countDistinct(col("digest"))).as("__dups"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"))
      .select(col("n_docs"), col("n_sources"), col("n_langs"),
        col("total_tokens"), col("total_chars"),
        when(col("n_docs") === 0, 0.0).otherwise(
          round(col("__dups").cast("double") / col("n_docs"), 6)).as("dup_rate"),
        when(col("n_docs") === 0, 0.0).otherwise(
          round(col("__en").cast("double") / col("n_docs"), 6)).as("en_share"))

  /** Missing-value imputation audit: nulls planted deterministically
    * (custkey % 7 == 3), filled with the per-segment mean of the
    * surviving values (DECIMAL-exact SUM/COUNT, fill rounded to cents so
    * post-imputation totals stay exact). Group stats broadcast back over
    * the scan — the fact side never shuffles (the z-score shape). */
  private def imputeMissing(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("segment"),
        when(col("c_custkey") % 7 === 3, lit(null))
          .otherwise(col("c_acctbal")).cast("decimal(18,2)").as("bal"))
    // fill + post-fill total both in DOUBLE space with one fixed
    // expression shape (sum-of-cents doubles are exact; identical IEEE
    // sequence in the oracle — the established double-round bridge)
    val fill = round(col("__sum").cast("double") / col("__cnt"), 2)
    c.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bal").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(col("bal")).as("__sum"), count(col("bal")).as("__cnt"))
      .select(col("segment"), col("n"), col("n_missing"),
        fill.as("fill_value"),
        round(col("__sum").cast("double") +
          col("n_missing").cast("double") * fill, 2).as("total_after"))
  }

  /** One-hot encoding of the customer market segment — fixed, sorted
    * column set, pure scan projection (zero shuffle; the categorical
    * counterpart of feature_hash's fixed-dim trick). */
  private def oneHotQ(s: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
      "MACHINERY")
    val cols = segs.map(g =>
      when(col("c_mktsegment") === g, 1L).otherwise(0L)
        .as(s"seg_${g.toLowerCase}"))
    t(s, dir, "customer").select((col("c_custkey") +: cols): _*)
  }

  /** Benford first-digit audit of order totals — the fraud/data-quality
    * screen: observed leading-digit counts vs Benford expectation
    * n·log10(1+1/d), per-digit chi-square contribution (fixed-shape
    * doubles, one scan + a 9-row rollup). */
  private def benfordAudit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "orders")
      .where(col("o_totalprice") > 0)
      .select(substring(col("o_totalprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .where(col("digit").between(1, 9))
    val counts = d.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = broadcast(counts.agg(sum(col("n_obs")).as("__n")))
    counts.crossJoin(tot)
      .select(col("digit").cast("long").as("digit"), col("n_obs"),
        round(col("__n").cast("double") *
          log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("n_expected"),
        round(pow(col("n_obs").cast("double") -
            col("__n").cast("double") * log10(lit(1.0) + lit(1.0) / col("digit")), 2) /
          (col("__n").cast("double") * log10(lit(1.0) + lit(1.0) / col("digit"))), 6)
          .as("chi2_term"))
  }

  /** Time-series gap fill: daily event counts per sampled user over the
    * corpus date span, missing days zero-filled — the resample step before
    * any per-entity time-series model. The day spine is a bounded
    * `sequence()` explode per user (span × sample, never corpus²). */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val span = broadcast(ev.agg(min(to_date(col("ts"))).as("__lo"),
      max(to_date(col("ts"))).as("__hi")))
    val users = ev.select(col("user_id")).distinct()
      .where(col("user_id") % 37 === 0)
    val daily = ev.where(col("user_id") % 37 === 0)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    users.crossJoin(span)
      .select(col("user_id"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
      .join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day").cast("string").as("day"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** FLAGSHIP COMPOSITION — the reference's core user journey in one
    * oracle-gated chain: a templated SQL transformation (T1/T2) feeds a
    * point-in-time training set (P2), which is hash-split (X2) and rolled
    * up per split. Every stage is an operator already individually gated;
    * this query gates their COMPOSITION (column naming, null flow, split
    * keys) end to end. */
  private def e2eTrainingSet(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = graft.transform.SqlTransform.run(s,
      """SELECT user_id, ts, value * 2 AS fval
        |FROM {{events_norm}} WHERE event_type = 'click'""".stripMargin,
      _ => ev)
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("lts"), col("value").as("lval"))
    val ts = ops.AsOfJoin.trainingSet(labels, Map("entity" -> "user_id"),
        "lval", Some("lts"),
        Seq(ops.FeatureSide(clicks, "user_id", "fval", Some("ts"), "f_click")))
      .withColumn("ts_ms", unix_millis(col("lts")))
    val split = ops.Split.withSplit(ts, Seq("user_id", "ts_ms"),
      testSize = 0.25, seed = 42)
    split.groupBy(col("is_test"))
      .agg(count(lit(1)).as("n"),
        sum(col("label").cast("decimal(18,2)")).as("__sl"),
        count(col("f_click")).as("n_feat"),
        sum(col("f_click").cast("decimal(18,2)")).as("__sf"))
      .select(col("is_test").cast("long").as("is_test"), col("n"),
        round(col("__sl").cast("double") / col("n"), 6).as("mean_label"),
        col("n_feat"),
        when(col("n_feat") === 0, lit(null)).otherwise(
          round(col("__sf").cast("double") / col("n_feat"), 6))
          .as("mean_f_click"))
  }

  /** Conversion-lag profile: per user cohort, minutes from each purchase
    * back to its LAST click in the preceding 7 days (the attribution_touch
    * interval join), with nearest-rank median and p90 over the converted
    * set — the time-to-convert report marketing runs beside the funnel.
    * The rank window is cohort-partitioned (bounded per cohort). */
  private def conversionLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("entity"), col("ts").as("c_ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("entity"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
    val iv = purch.withColumn("w_start", col("p_ts") - expr("interval 7 days"))
    val lastClick = ops.RangeJoin.pointsInIntervalsKeyed(
        clicks, "c_ts", "entity", iv, "w_start", "p_ts")
      .groupBy(col("p_id").as("__pid"))
      .agg(max(col("c_ts")).as("__last"))
    val lagged = purch.join(lastClick, col("p_id") === col("__pid"), "left")
      .select((col("entity") % 4).as("cohort"), col("p_id"),
        floor((unix_millis(col("p_ts")) - unix_millis(col("__last"))) /
          lit(60000.0)).cast("long").as("lag_min"))
    val conv = lagged.where(col("lag_min").isNotNull)
    val w = Window.partitionBy(col("cohort"))
      .orderBy(col("lag_min").asc, col("p_id").asc)
    val ranked = conv
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("cohort"))))
    val med = ranked.where(col("__rk") === ceil(col("__n") * 0.5).cast("long"))
      .select(col("cohort"), col("lag_min").as("median_lag_min"))
    val p90 = ranked.where(col("__rk") === ceil(col("__n") * 0.9).cast("long"))
      .select(col("cohort"), col("lag_min").as("p90_lag_min"))
    lagged.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_purchases"),
        count(col("lag_min")).as("n_converted"))
      .join(med, Seq("cohort"), "left")
      .join(p90, Seq("cohort"), "left")
  }

  /** Two-arm uplift readout with Welch's t statistic: order totals under
    * the deterministic exp1 hash assignment — means/variances from
    * DECIMAL-exact Σy and Σy², one fixed-shape double expression each
    * (the outlier_zscore discipline), so the t statistic replays
    * bit-for-bit. */
  private def abUplift(s: SparkSession, dir: String): DataFrame = {
    val y = col("o_totalprice").cast("decimal(18,2)")
    val g = t(s, dir, "orders")
      .select(functions.Experiment.armCol(col("o_custkey"), "exp1", 2)
        .as("arm"), y.as("__y"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__s"),
        sum(col("__y") * col("__y")).as("__q"))
    def side(a: Int, suffix: String) = g.where(col("arm") === a)
      .select(col("n").as(s"n_$suffix"),
        col("__s").cast("double").as(s"__s$suffix"),
        col("__q").cast("double").as(s"__q$suffix"))
    def mean(sfx: String) = col(s"__s$sfx") / col(s"n_$sfx")
    def variance(sfx: String) =
      (col(s"__q$sfx") - col(s"__s$sfx") * col(s"__s$sfx") / col(s"n_$sfx")) /
        (col(s"n_$sfx") - 1)
    side(0, "0").crossJoin(side(1, "1"))
      .select(col("n_0"), col("n_1"),
        round(mean("0"), 6).as("mean_0"),
        round(mean("1"), 6).as("mean_1"),
        round(mean("1") - mean("0"), 6).as("uplift"),
        round((mean("1") - mean("0")) /
          sqrt(variance("1") / col("n_1") + variance("0") / col("n_0")), 6)
          .as("t_stat"))
  }

  /** Reliability diagram: the pseudo-score value/600 binned into 10
    * equal-width buckets against the is-purchase rate — the calibration
    * table isotonic_calibration's fit would consume. */
  private def reliabilityBins(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(least(floor(col("value") / 60.0), lit(9.0)).cast("long")
        .as("bin"),
        (col("value") / 600.0).as("score"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        round(sum(round(col("score"), 9).cast("decimal(18,9)"))
          .cast("double") / count(lit(1)), 6).as("mean_score"),
        round(sum(col("y")).cast("double") / count(lit(1)), 6)
          .as("frac_pos"))

  /** NDCG@10 + MRR for three BM25 term queries against contains-all
    * relevance. */
  private def retrievalNdcg(s: SparkSession, dir: String): DataFrame =
    functions.Retrieval.rankingMetrics(t(s, dir, "documents"),
      "doc_id", "text",
      Seq(Seq("join", "vector"), Seq("stream"), Seq("shuffle", "partition")),
      k = 10)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"        -> (q1 _),
    "q3_chained_sql"    -> (q3 _),
    "q5_local_supplier" -> (q5 _),
    "q_rollup"          -> (qRollup _),
    "q_window_running"  -> (qWindowRunning _),
    "q_clicks_no_purchase" -> (qClicksNoPurchase _),
    "q_exists_semi"     -> (qExistsSemi _),
    "q_lateral_topk"    -> (qLateralTopK _),
    "q_pivot"           -> (qPivot _),
    "q_except_intersect" -> (qExceptIntersect _),
    "q_top_per_segment" -> (qTopPerSegment _),
    "feat_latest_ts"    -> (featLatestTs _),
    "feat_latest_no_ts" -> (featLatestNoTs _),
    "chunked_export"    -> (chunkedExport _),
    "pit_purchases"     -> ((s: SparkSession, d: String) => pitPurchases(s, d)),
    "pit_broadcast"     -> (pitBroadcast _),
    "pit_max_age"       -> (pitMaxAge _),
    "pit_no_label_ts"   -> (pitNoLabelTs _),
    "pit_lag"           -> (pitLag _),
    "pit_multi_entity"  -> (pitMultiEntity _),
    "merge_upsert"      -> (mergeUpsert _),
    "batch_features"    -> (batchFeatures _),
    "train_test_split"  -> (trainTestSplit _),
    "split_leakage_safe" -> (splitLeakageSafe _),
    "dedup_exact"       -> (dedupExact _),
    "doc_fingerprint"   -> (docFingerprint _),
    "simhash_fingerprint" -> (simhashFingerprint _),
    "text_stats"        -> (textStats _),
    "lang_id"           -> (langIdQ _),
    "corpus_clean"      -> (corpusClean _),
    "filter_funnel"     -> (filterFunnelQ _),
    "ann_topk"          -> (annTopK _),
    "minhash_near_dups" -> (minhashNearDups _),
    "dedup_pr_eval"     -> (dedupPrEval _),
    "simhash_near_dups" -> (simhashNearDups _),
    "simhash_near_dups_bounded" -> (simhashNearDupsBounded _),
    "cosine_near_dups"  -> (cosineNearDups _),
    "source_preview"    -> (sourcePreview _),
    "df_transform"      -> (dfTransform _),
    "incremental_refresh" -> (incrementalRefresh _),
    "versioned_write_roundtrip" -> (versionedWriteRoundtrip _),
    "csv_roundtrip"     -> (csvRoundtrip _),
    "orc_roundtrip"     -> (orcRoundtrip _),
    "online_serving"    -> (onlineServing _),
    "grpc_serve_roundtrip" -> (grpcServeRoundtrip _),
    "grpc_metadata_roundtrip" -> (grpcMetadataRoundtrip _),
    "staged_deletion"   -> (stagedDeletion _),
    "scheduler_lifecycle" -> (schedulerLifecycle _),
    "sched_recovery"    -> (schedRecovery _),
    "wire_lifecycle"    -> (wireLifecycle _),
    "corpus_lifecycle"  -> (corpusLifecycle _),
    "flight_roundtrip"  -> (flightRoundtrip _),
    "training_stream"   -> (trainingStream _),
    "split_serve"       -> (splitServe _),
    "merge_upsert_wide" -> (mergeUpsertWide _),
    "catalog_persist"   -> (catalogPersist _),
    "lineage_export"    -> (lineageExport _),
    "ann_topk_ivf"      -> (annTopKIVFQ _),
    "knn_graph"         -> (knnGraphQ _),
    "knn_graph_incr"    -> (knnGraphIncrQ _),
    "knn_graph_pq"      -> (knnGraphPqQ _),
    "knn_graph_pq_int8" -> (knnGraphPqInt8Q _),
    "media_pipeline"    -> (mediaPipeline _),
    "skew_salted_join"  -> (skewSaltedJoin _),
    "streaming_latest"  -> (streamingLatest _),
    "stream_online_serve" -> (streamOnlineServe _),
    "stream_dedup"      -> (streamDedup _),
    "stream_dedup_ttl"  -> (streamDedupTtl _),
    "stream_vector_serve" -> (streamVectorServe _),
    "stream_decontam"   -> (streamDecontam _),
    "task_runs"         -> (taskRuns _),
    "windowed_counts"   -> (windowedCounts _),
    "stream_asof"       -> (streamAsOf _),
    "q_custom_fn"       -> (qCustomFn _),
    "winnow_near_dups"  -> (winnowNearDups _),
    "bucketed_join"     -> (bucketedJoin _),
    "compact_roundtrip" -> (compactRoundtrip _),
    "hash_partitioned_write" -> (hashPartitionedWrite _),
    "ngram_jaccard_pairs" -> (ngramJaccardPairs _),
    "vector_index_serve" -> (vectorIndexServe _),
    "orchestrated_refresh" -> (orchestratedRefresh _),
    "catalog_lineage"   -> (catalogLineage _),
    "catalog_search"    -> (catalogSearch _),
    "repetition_stats"  -> (repetitionStats _),
    "decontaminate"     -> (decontaminate _),
    "bloom_decontam"    -> (bloomDecontam _),
    "dup_spans"         -> (dupSpansQ _),
    "scrub_dup_spans"   -> (scrubDupSpansQ _),
    "token_budget_select" -> (tokenBudgetSelectQ _),
    "jsonl_export"      -> (jsonlExport _),
    "tfidf_keywords"    -> (tfidfKeywordsQ _),
    "pit_window_agg"    -> (pitWindowAggQ _),
    "label_window"      -> (labelWindowQ _),
    "validate_gate"     -> (validateGate _),
    "pit_window_ladder" -> (pitWindowLadderQ _),
    "pit_window_agg_prefix" -> (pitWindowAggPrefixQ _),
    "drift_psi"         -> (driftPsiQ _),
    "drift_categorical" -> (driftCatQ _),
    "pmi_collocations"  -> (pmiCollocationsQ _),
    "negative_sample"   -> (negativeSampleQ _),
    "mix_execute"       -> (mixExecuteQ _),
    "kafka_write_roundtrip" -> (kafkaWriteRoundtrip _),
    "forget_entity"     -> (forgetEntity _),
    "date_pruned_scan"  -> (datePrunedScan _),
    "pii_scrub"         -> (piiScrub _),
    "stratified_sample" -> (stratifiedSampleQ _),
    "dedup_clusters"    -> (dedupClusters _),
    "dedup_clusters_incr" -> (dedupClustersIncremental _),
    "dedup_clusters_star" -> (dedupClustersStar _),
    "embedding_quantize" -> (embeddingQuantize _),
    "incremental_dedup" -> (incrementalDedup _),
    "seq_pack"          -> (seqPack _),
    "seq_pack_greedy"   -> (seqPackGreedy _),
    "unigram_lm_score"  -> (unigramLmScore _),
    "vocab_topk"        -> (vocabTopK _),
    "bpe_train"         -> (bpeTrainQ _),
    "bpe_train_scaled"  -> (bpeTrainScaledQ _),
    "bpe_train_exact"   -> (bpeTrainExactQ _),
    "domain_stats"      -> (domainStats _),
    "column_profile"    -> (columnProfile _),
    "shuffle_export"    -> (shuffleExport _),
    "streaming_dedup"   -> (streamingDedup _),
    "mix_plan"          -> (mixPlan _),
    "curriculum_bins"   -> (curriculumBinsQ _),
    "cross_source_dups" -> (crossSourceDupsQ _),
    "numeric_profile"   -> (numericProfileQ _),
    "sketch_quantiles"  -> (sketchQuantilesQ _),
    "corpus_curate"     -> (corpusCurate _),
    "bigram_lm_score"   -> (bigramLmScore _),
    "hll_profile"       -> (hllProfile _),
    "session_stats"     -> (sessionStats _),
    "range_join_blast"  -> (rangeJoinBlast _),
    "bm25_topk"         -> (bm25TopKQ _),
    "dsir_weights"      -> (dsirWeightsQ _),
    "embedding_project" -> (embeddingProject _),
    "cms_heavy_hitters" -> (cmsHeavyHitters _),
    "image_near_dups"   -> (imageNearDups _),
    "incremental_image_dedup" -> (incrementalImageDedup _),
    "table_format_roundtrip" -> (tableFormatRoundtrip _),
    "incremental_simhash_bounded" -> (incrementalSimhashBounded _),
    "kmeans_clusters"   -> (kmeansClusters _),
    "diversity_sample"  -> (diversitySampleQ _),
    "semantic_dedup"    -> (semanticDedupQ _),
    "quality_classifier" -> (qualityClassifierQ _),
    "zorder_layout"     -> (zorderLayout _),
    "version_diff"      -> (versionDiffQ _),
    "edit_near_dups"    -> (editNearDupsQ _),
    "bpe_encode"        -> (bpeEncodeQ _),
    "doc_chunks"        -> (docChunks _),
    "streaming_sessions" -> (streamingSessions _),
    "event_funnel"      -> (eventFunnelQ _),
    "retention_cohorts" -> (retentionQ _),
    "scd2_build"        -> (scd2Q _),
    "item_cooccur"      -> (itemCooccurQ _),
    "target_encode"     -> (targetEncodeQ _),
    "column_entropy"    -> (columnEntropyQ _),
    "mutual_info"       -> (mutualInfoQ _),
    "pagerank"          -> (pagerankQ _),
    "kfold_split"       -> (kfoldSplitQ _),
    "weighted_sample"   -> (weightedSampleQ _),
    "augment_dropout"   -> (augmentDropoutQ _),
    "scd2_lookup"       -> (scd2LookupQ _),
    "transition_matrix" -> (transitionMatrixQ _),
    "experiment_readout" -> (experimentReadoutQ _),
    "outlier_zscore"    -> (outlierZscoreQ _),
    "tfidf_neighbors"   -> (tfidfNeighborsQ _),
    "percentile_rank"   -> (percentileRankQ _),
    "posting_index"     -> (postingIndexQ _),
    "behavior_profile"  -> (behaviorProfileQ _),
    "activity_trend"    -> (activityTrendQ _),
    "quantile_normalize" -> (quantileNormalizeQ _),
    "k_anonymity"       -> (kAnonymityQ _),
    "dp_counts"         -> (dpCountsQ _),
    "survival_km"       -> (survivalKmQ _),
    "feature_corr"      -> (featureCorrQ _),
    "interval_coverage" -> (intervalCoverage _),
    "nearest_join"      -> (nearestJoinQ _),
    "linreg_fit"        -> (linregFit _),
    "naive_bayes_lang"  -> (naiveBayesLang _),
    "triangle_count"    -> (triangleCountQ _),
    "ewma_smooth"       -> (ewmaSmooth _),
    "feature_hash"      -> (featureHashQ _),
    "stream_interval_join" -> (streamIntervalJoin _),
    "stream_interval_join_outer" -> (streamIntervalJoinOuter _),
    "retrieval_ndcg"    -> (retrievalNdcg _),
    "pq_codes"          -> (pqCodesQ _),
    "pq_search"         -> (pqSearchQ _),
    "isotonic_calibration" -> (isotonicCalibration _),
    "attribution_touch" -> (attributionTouch _),
    "time_split_embargo" -> (timeSplitEmbargo _),
    "cusum_drift"       -> (cusumDrift _),
    "rolling_active"    -> (rollingActive _),
    "flesch_readability" -> (fleschReadability _),
    "markov_accuracy"   -> (markovAccuracy _),
    "incremental_rollup" -> (incrementalRollup _),
    "audit_checksum"    -> (auditChecksum _),
    "bootstrap_ci"      -> (bootstrapCi _),
    "l_diversity"       -> (lDiversityQ _),
    "stream_static_join" -> (streamStaticJoin _),
    "streaming_funnel"  -> (streamingFunnelQ _),
    "streaming_dedup_wm" -> (streamingDedupWm _),
    "json_props_rollup" -> (jsonPropsRollup _),
    "fuzzy_link"        -> (fuzzyLink _),
    "fuzzy_link_multipass" -> (fuzzyLinkMultiPass _),
    "binary_auc"        -> (binaryAuc _),
    "forget_user"       -> (forgetUser _),
    "oov_rate"          -> (oovRate _),
    "join_size_est"     -> (joinSizeEst _),
    "streaming_cusum"   -> (streamingCusumQ _),
    "skew_report"       -> (skewReport _),
    "gram_novelty"      -> (gramNovelty _),
    "value_histogram"   -> (valueHistogram _),
    "hard_negatives"    -> (hardNegativesQ _),
    "vocab_js_div"      -> (vocabJsDiv _),
    "corpus_card"       -> (corpusCard _),
    "impute_missing"    -> (imputeMissing _),
    "one_hot"           -> (oneHotQ _),
    "benford_audit"     -> (benfordAudit _),
    "gap_fill"          -> (gapFill _),
    "e2e_training_set"  -> (e2eTrainingSet _),
    "conversion_lag"    -> (conversionLag _),
    "streaming_gaps"    -> (streamingGapsQ _),
    "ab_uplift"         -> (abUplift _),
    "reliability_bins"  -> (reliabilityBins _),
    "mad_outliers"      -> (madOutliersQ _),
    "winsorize_clip"    -> (winsorizeClip _),
    "rfm_segments"      -> (rfmSegments _),
    "link_prediction"   -> (linkPredictionQ _),
    "hll_overlap"       -> (hllOverlap _),
    "holt_trend"        -> (holtTrend _),
    "seasonal_dow"      -> (seasonalDowQ _),
    "ks_statistic"      -> (ksStatistic _),
    "chi2_tokens"       -> (chi2Tokens _),
    "path_trigrams"     -> (pathTrigrams _),
    "cdc_dedup"         -> (cdcDedup _),
    "bandit_ucb"        -> (banditUcb _),
    "incremental_hll"   -> (incrementalHll _),
    "zipf_slope"        -> (zipfSlope _),
    "q_cube"            -> (qCube _),
    "decay_features"    -> (decayFeaturesQ _),
    "change_point"      -> (changePointQ _),
    "platt_scale"       -> (plattScaleQ _),
    "weighted_median"   -> (weightedMedianQ _),
    "bloom_join"        -> (bloomJoin _),
    "golden_record"     -> (goldenRecordQ _),
    "session_export"    -> (sessionExportQ _),
    "conformal_interval" -> (conformalInterval _),
    "dag_runs"          -> (dagRuns _),
    "bpe_efficiency"    -> (bpeEfficiency _),
    "heldout_perplexity" -> (heldoutPerplexity _),
    "pad_waste"         -> (padWasteQ _),
    "fk_audit"          -> (fkAuditQ _),
    "feature_freshness" -> (featureFreshness _),
    "rank_stability"    -> (rankStabilityQ _),
    "embedding_audit"   -> (embeddingAudit _),
    "adaptive_join"     -> (adaptiveJoinQ _),
    "pit_cold_start"    -> (pitColdStart _),
    "containment_pairs" -> (containmentPairs _),
    "stupid_backoff"    -> (stupidBackoffQ _),
    "incremental_kmeans" -> (incrementalKmeans _),
  )

  def oracleSql: Map[String, String] = OracleSql.all
}
