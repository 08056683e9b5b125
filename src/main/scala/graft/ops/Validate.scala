package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data validation — the reference's per-job marshmallow
  * schema option (bert/binding.py:38,95-96) promoted to a working feature
  * (the reference only ever enforced it in the dead webservice path,
  * SURVEY §1.2).
  *
  * A constraint is named and yields a violation count; `report` evaluates
  * ALL constraints in ONE aggregate pass over the frame (conditional
  * sums — not one job per rule), plus optional anti-join rules
  * (referential integrity) which each cost one key-shuffle.
  * `enforce` splits a frame into (valid, violating) without recomputing
  * the source twice at the caller's site.
  */
object Validate {

  final case class Rule(name: String, violatedWhen: Column)

  def notNull(cols: String*): Seq[Rule] =
    cols.map(c => Rule(s"not_null($c)", col(c).isNull))

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range($c)", col(c).isNotNull && !col(c).between(lo, hi))

  def matches(c: String, regex: String): Rule =
    Rule(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

  /** One row per rule: (rule, violations, rows_checked). Single-pass. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = rules.map(r =>
      sum(when(r.violatedWhen, 1L).otherwise(0L)).as(r.name)) :+
      count(lit(1)).as("__rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // long format: stack the per-rule columns
    val stacked = rules.map(r =>
      s"'${r.name.replace("'", "")}', `${r.name}`").mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stacked) AS (rule, violations)", "__rows AS rows_checked")
  }

  /** Referential integrity: rows of `df` whose `key` has no match in
    * `parent.parentKey` (anti-join; shuffles only keys). */
  def orphans(df: DataFrame, key: String, parent: DataFrame, parentKey: String): DataFrame =
    df.join(parent.select(col(parentKey)).distinct(),
      col(key) === col(parentKey), "left_anti")

  /** Split into (valid, violating-any-rule). */
  def enforce(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val bad = rules.map(_.violatedWhen).reduce(_ || _)
    (df.filter(!bad), df.filter(bad))
  }
}
