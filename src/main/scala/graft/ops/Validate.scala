package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation — the expectation-suite gate a
  * feature platform runs before publishing a materialization (the
  * reference has no validation surface; its closest hook is resource
  * status checks. This is the Great-Expectations-family operator a
  * training-data pipeline fronts every ingest with).
  *
  * Report: one row per rule — (rule, target, n_violations, n_rows, pass).
  *
  * Scale shape: every SCALAR rule (not-null, range, regex, custom
  * predicate) compiles to one `sum(when(violated, 1))` aggregate, and all
  * of them fold into a SINGLE full-scan aggregation — adding a scalar
  * rule costs one expression, not one pass. `Unique` adds one groupBy on
  * its key columns (count minus distinct-on-key via partial-agg);
  * `RefIntegrity` adds one left-anti join (broadcast when the dimension
  * is small — Catalyst's choice). The per-rule outputs are 1-row frames
  * unioned at metadata scale. */
object Validate {

  sealed trait Rule { def name: String; def target: String }
  /** value IS NULL is a violation. */
  final case class NotNull(col: String) extends Rule {
    def name = "not_null"; def target = col
  }
  /** value outside [lo, hi] (inclusive bounds) or NULL is a violation. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = "in_range"; def target = col
  }
  /** non-NULL value not matching the anchored regex is a violation
    * (NULLs are NotNull's business, not Matches'). */
  final case class Matches(col: String, regex: String) extends Rule {
    def name = "matches"; def target = col
  }
  /** every row beyond the first per key is a violation. */
  final case class Unique(cols: Seq[String]) extends Rule {
    def name = "unique"; def target = cols.mkString(",")
  }
  /** rows whose col has no match in dim(dimCol) are violations (NULL fk
    * counts as dangling — no implicit optionality). */
  final case class RefIntegrity(col: String, dim: DataFrame, dimCol: String)
      extends Rule {
    def name = "ref_integrity"; def target = col
  }

  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")

    def violation(r: Rule): Option[Column] = r match {
      case NotNull(c) => Some(when(col(c).isNull, 1L).otherwise(0L))
      case InRange(c, lo, hi) => Some(
        when(col(c).isNull || col(c) < lo || col(c) > hi, 1L).otherwise(0L))
      case Matches(c, re) => Some(
        when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L))
      case _ => None
    }
    val scalarRules = rules.filter(violation(_).isDefined)
    // ONE aggregate row for every scalar rule, exploded into report rows —
    // a per-rule union of projections would re-run the aggregation (and
    // re-scan the table) once per branch
    val scalar: Option[DataFrame] =
      if (scalarRules.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +:
          scalarRules.zipWithIndex.map { case (r, i) =>
            sum(violation(r).get).as(s"__v$i") }
        val row = df.agg(aggs.head, aggs.tail: _*)
        Some(row.select(explode(array(scalarRules.zipWithIndex.map {
          case (r, i) => struct(lit(r.name).as("rule"),
            lit(r.target).as("target"),
            coalesce(col(s"__v$i"), lit(0L)).as("n_violations"),
            col("__n").as("n_rows"))
        }: _*)).as("__r")).select(col("__r.*")))
      }

    // ONE shared total-rows frame for every FK rule (lazy; without it each
    // RefIntegrity paid its own full count scan for n_rows)
    lazy val nRowsDf = df.agg(count(lit(1)).as("n_rows"))
    val others = rules.collect {
      case Unique(cols0) =>
        val keyed = df.groupBy(cols0.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n_violations"),
            coalesce(sum(col("__c")), lit(0L)).as("n_rows"))
        keyed.select(lit("unique").as("rule"),
          lit(cols0.mkString(",")).as("target"),
          col("n_violations"), col("n_rows"))
      case RefIntegrity(c, dim, dimCol) =>
        val dangling = df.select(col(c).as("__fk"))
          .join(dim.select(col(dimCol).as("__fk")).distinct(),
            Seq("__fk"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        dangling.crossJoin(nRowsDf)
          .select(lit("ref_integrity").as("rule"), lit(c).as("target"),
            col("n_violations"), col("n_rows"))
    }

    (scalar.toSeq ++ others).reduce(_.union(_))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** One FK edge for [[fkAudit]]: `child.childCol → parent.parentCol`. */
  final case class FkEdge(name: String, child: DataFrame, childCol: String,
                          parent: DataFrame, parentCol: String)

  /** Referential-integrity audit across a schema's FK edges — per edge,
    * child rows, distinct keys, NULL FKs, and dangling keys (non-NULL
    * keys with no parent): the star-schema health table one
    * [[RefIntegrity]] rule can't give in one pass. Each edge costs one
    * child aggregate plus one distinct-key anti-join against the parent
    * — the dangling count shuffles KEYS, never child rows. */
  def fkAudit(edges: Seq[FkEdge]): DataFrame = {
    require(edges.nonEmpty, "at least one edge")
    edges.map { e =>
      val keys = e.child.select(col(e.childCol).as("__k"))
      val counts = keys.agg(count(lit(1)).as("n_child"),
        count(col("__k")).as("__nonnull"),
        count_distinct(col("__k")).as("n_keys"))
      val dangling = keys.where(col("__k").isNotNull).distinct()
        .join(e.parent.select(col(e.parentCol).as("__k")),
          Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_dangling_keys"))
      counts.crossJoin(dangling)
        .select(lit(e.name).as("edge"), col("n_child"),
          col("n_keys"), (col("n_child") - col("__nonnull")).as("n_null_fk"),
          col("n_dangling_keys"))
    }.reduce(_.unionByName(_))
  }
}
