package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Embedding vetting — the screen every similarity/ANN kernel REQUIRES
    * upstream at corpus scale. The exact-decimal kernels
    * ([[graft.functions.DecimalDot]] — and the DuckDB-oracle decimal
    * spelling they are contracted to) are UNEVALUABLE on non-finite
    * components (`BigDecimal.valueOf(NaN)` throws; DuckDB errors casting
    * nan/inf to DECIMAL), and a zero-norm vector turns every cosine into a
    * division by zero — whose result the engines do not even agree on
    * (Spark IEEE ±Inf/NaN vs DuckDB NULL, the scaladoc'd
    * q_hostile_semantics exclusion). So: reject first, score second.
    *
    * Verdicts, first match wins:
    * `null_embedding | dim_mismatch | null_component | non_finite |
    * zero_norm | ok`.
    *
    * Two deliberate spellings, pinned cross-engine by
    * q_hostile_embedding:
    *  - NaN detection is `isnan(x)`, NOT `x <> x`: DuckDB's total order
    *    makes NaN = NaN TRUE, so the self-inequality idiom silently never
    *    fires there while firing in Spark — the worst kind of divergence.
    *  - zero_norm is judged in the SAME DECIMAL(28,14) arithmetic the
    *    kernels use: a vector of 1e-30 components has nonzero IEEE norm
    *    but quantizes to EXACTLY zero at scale 14 in both engines, and
    *    would divide by zero inside the exact cosine if let through.
    *
    * One narrow per-row pass, no shuffle; CASE branches evaluate lazily in
    * both engines, so the decimal norm is never computed on a vector that
    * would crash it.
    */
  def embeddingVerdict(s: SparkSession, embCol: String, dim: Int): Column = {
    graft.functions.GraftFunctions.register(s)
    val e = col(embCol)
    val inf = expr("CAST('Infinity' AS DOUBLE)")
    when(e.isNull, "null_embedding")
      .when(size(e) =!= dim, "dim_mismatch")
      .when(exists(e, x => x.isNull), "null_component")
      .when(exists(e, x => isnan(x) || abs(x) === inf), "non_finite")
      // Column-based call (not string-interpolated expr text): a column
      // name needing quoting (dots/spaces/hyphens) resolves identically
      // to every other branch here instead of re-parsing as SQL.
      .when(call_function("decimal_dot", e, e) === 0.0, "zero_norm")
      .otherwise("ok")
  }

  /** Persist-once screening — [[graft.ops.Ann]]'s scaladoc'd trade made a
    * code path: `screenDim` on ivfTopK/bruteTopK re-evaluates the verdict
    * (an exact-decimal self dot product per row) on EVERY consumer scan,
    * which is right for a one-shot query but wasteful for a pipeline
    * running MANY ANN queries over one untrusted corpus. This filters to
    * verdict-'ok' rows ONCE, writes the survivors as a parquet table
    * (DedupState-style: the screen's cost is paid at ingest, downstream
    * scans are plain columnar reads with pushdown intact), and returns the
    * read-back frame — run the downstream operators UNSCREENED over it.
    * Gated by q_ann_screened_table: same hostile ∪ real corpus as
    * q_ann_screened, identical oracle, screened through this table instead
    * of per-scan filters.
    */
  def screenToTable(s: SparkSession, corpus: DataFrame, embCol: String, dim: Int,
                    path: String): DataFrame = {
    corpus.filter(embeddingVerdict(s, embCol, dim) === "ok")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
    s.read.parquet(path)
  }
}
