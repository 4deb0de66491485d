package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the validation gate a
  * production ingest runs before publishing a table (the Spark-native
  * precedent is AWS Deequ; the reference's null/empty guards (F2) and
  * RI semi-filters (F7) are single instances of the same idea). Each
  * rule yields a (rule, violations) row; a clean table is all zeros.
  *
  * Scale shape: ALL row-local rules (not-null, range, set, regex)
  * compile into ONE aggregation over ONE scan — adding a rule adds a
  * conditional-sum expression, not a pass. `Unique` adds one
  * key-grouped aggregation (map-side combine; violations = surplus
  * rows beyond the first per key). `ForeignKey` adds one left-anti
  * join per referenced table (broadcast when the reference side is
  * small, which dimension tables are). Results union as 1-row frames —
  * no driver-side actions anywhere, the audit is itself one lazy plan.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** Row-local rule: `violated` must be a boolean Column over one row. */
  sealed trait RowRule extends Rule { def violated: Column }

  case class NotNull(c: String) extends RowRule {
    val name = s"not_null($c)"
    def violated: Column = col(c).isNull
  }
  /** Violation when null or outside [lo, hi] (closed interval). */
  case class InRange(c: String, lo: Column, hi: Column) extends RowRule {
    val name = s"in_range($c)"
    def violated: Column = col(c).isNull || col(c) < lo || col(c) > hi
  }
  case class InSet(c: String, values: Seq[String]) extends RowRule {
    val name = s"in_set($c)"
    def violated: Column = col(c).isNull || !col(c).isin(values: _*)
  }
  case class MatchesRegex(c: String, pattern: String) extends RowRule {
    val name = s"matches($c)"
    def violated: Column = col(c).isNull || !col(c).rlike(pattern)
  }
  case class Unique(cols: Seq[String]) extends Rule {
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Non-null values of `c` must appear in `ref`'s `refCol`. */
  case class ForeignKey(c: String, ref: DataFrame, refCol: String,
      refName: String) extends Rule {
    val name = s"fk($c->$refName)"
  }

  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "audit: need at least one rule")
    val rowRules = rules.collect { case r: RowRule => r }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = rowRules.map(r =>
        sum(when(r.violated, 1L).otherwise(0L)).as(r.name))
      parts += df.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(rowRules.map(r => struct(
          lit(r.name).as("rule"),
          coalesce(col(s"`${r.name}`"), lit(0L)).as("violations"))): _*))
          .as("kv"))
        .select(col("kv.rule"), col("kv.violations"))
    }
    rules.foreach {
      case Unique(cols) =>
        parts += df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
          .select(lit(Unique(cols).name).as("rule"), col("violations"))
      case fk @ ForeignKey(c, ref, refCol, _) =>
        parts += df.filter(col(c).isNotNull)
          .join(ref.select(col(refCol).as(c)), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(fk.name).as("rule"), col("violations"))
      case _: RowRule => // folded into the single-scan aggregation
    }
    parts.reduce(_ unionByName _)
  }

  /** Functional-dependency audit (profiling's key-discovery primitive):
    * does `lhs → rhs` hold? Returns the violating lhs groups — those
    * seeing more than one distinct rhs value — with their distinct-rhs
    * and row counts. An empty result certifies the dependency (e.g.
    * "doc_id determines lang", "custkey determines nation") before a
    * downstream join or dedup assumes it.
    *
    * One aggregation keyed by (lhs, rhs) then one by lhs — both
    * partial-aggregating map-side; nothing driver-side. At 100 TB the
    * first agg's key space is the distinct (lhs, rhs) pairs, which an
    * FD that HOLDS keeps at |lhs| — the audit is cheapest exactly when
    * it passes.
    */
  def fdViolations(df: DataFrame, lhs: Seq[String],
      rhs: String): DataFrame = {
    require(lhs.nonEmpty, "fdViolations: lhs must be non-empty")
    df.groupBy((lhs.map(col) :+ col(rhs)): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(lhs.map(col): _*)
      .agg(count(lit(1)).as("n_rhs"), sum("__c").as("n_rows"))
      .filter(col("n_rhs") > 1)
  }

  /** Per-column data profile — the summarize/describe table a
    * catalog keeps per dataset: one row per requested column with
    * null count, EXACT distinct count, and native-order min/max
    * (rendered as strings for the uniform schema). ONE logical pass:
    * all columns' aggregates evaluate in a single Aggregate (Spark
    * expands once per distinct-count column — the standard
    * multi-distinct plan — but the source is scanned once), then a
    * `stack` unpivot reshapes k×4 aggregates into k rows. Profiling
    * output is O(columns), independent of corpus size.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val aggs = count(lit(1)).as("__nrows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c"),
      min(col(c)).cast("string").as(s"__mn_$c"),
      max(col(c)).cast("string").as(s"__mx_$c")))
    val stacked = cols.map(c =>
      s"'$c', __nrows - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stacked) " +
        "as (col_name, n_nulls, n_distinct, vmin, vmax)"))
  }

  /** k-anonymity / l-diversity audit (Sweeney '02; Machanavajjhala '07)
    * — the privacy gate a dataset release runs before shipping: group
    * rows by the quasi-identifier columns and flag every equivalence
    * class that is too small (fewer than `k` members — re-identifiable
    * by linking the QI tuple to an external table) or too uniform
    * (fewer than `l` distinct sensitive values — the homogeneity
    * attack: membership alone reveals the sensitive attribute).
    * Returns only the VIOLATING classes with their size, sensitive
    * diversity, and which rule(s) failed.
    *
    * One aggregation keyed by the QI tuple with an exact distinct on
    * the sensitive column — partial-aggregating map-side; output is
    * O(violating classes), and at 100 TB the QI key space is the
    * class count, not the row count. No driver state.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityAudit: need quasi-identifiers")
    require(k >= 1 && l >= 1, "kAnonymityAudit: k and l must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_violation", (col("class_size") < k).cast("int"))
      .withColumn("l_violation", (col("n_sensitive") < l).cast("int"))
      .filter(col("k_violation") === 1 || col("l_violation") === 1)
  }
}
