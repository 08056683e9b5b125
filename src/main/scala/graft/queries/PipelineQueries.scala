package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.Pipeline
import graft.io.Seeds

/** The Pipeline API exercised end-to-end as registry queries. */
object PipelineQueries {

  /** The reference's docs tutorial chain (docs/index.rst "Stream
    * Processing"): seed 100 items → compute idx² → keep even results → one
    * summary row. Same chain, declared as Pipeline stages; Catalyst fuses
    * all three stages into a single whole-stage-codegen'd plan over the
    * range source — the queue materialization between reference jobs simply
    * disappears.
    */
  def qPipelineChain(s: SparkSession, dir: String): DataFrame = {
    Pipeline(Seeds.fromRange(s, 100))
      .stage("calc")(df => df.withColumn("calculated_result", col("idx") * col("idx")))
      .stage("filter_even")(df => df.filter(col("calculated_result") % 2 === 0))
      .stage("summarize")(df => df.agg(
        count(lit(1)).as("n"),
        sum(col("calculated_result")).as("total"),
        min(col("idx")).as("min_idx"),
        max(col("idx")).as("max_idx")))
      .plan
  }

  val qPipelineChainSql: String =
    """SELECT COUNT(*) AS n, CAST(SUM(calculated_result) AS BIGINT) AS total,
      |  MIN(idx) AS min_idx, MAX(idx) AS max_idx
      |FROM (SELECT idx, idx * idx AS calculated_result
      |      FROM (SELECT unnest(range(0, 100)) AS idx) seeds) calc
      |WHERE calculated_result % 2 = 0""".stripMargin

  /** A pipeline over real tables: stage 1 filters lineitem, stage 2 joins
    * orders, stage 3 aggregates — the reference's typical
    * sync→transform→report chain shape, over testdata with an oracle.
    */
  def qPipelineRelational(s: SparkSession, dir: String): DataFrame = {
    Pipeline(Tables.lineitem(s, dir))
      .stage("recent")(df => df.filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")))
      .stage("join_orders")(df =>
        df.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey")))
      .stage("by_status")(df => df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_lines"),
          Exact.dsum(col("l_extendedprice")).as("sum_price")))
      .plan
  }

  val qPipelineRelationalSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY o_orderstatus""".stripMargin

  /** The LLM-corpus curation chain as Pipeline stages — the realistic
    * composition every training-data pipeline runs nightly, end-to-end as
    * ONE gated query: quality gate (length + token floor) → language gate
    * (target mixture) → exact dedup on the normalized text (keep the
    * lowest doc_id per canonical form — window per hash, never a global
    * sort) → deterministic 75% hash sample (content-addressed: a doc's
    * fate never changes when the corpus grows) → per-language rollup.
    * Every stage is a narrow filter or a partitioned window over one hash
    * shuffle; Catalyst fuses the filters into the scan.
    */
  def qCurationPipeline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val norm = sha2(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "), 256)
    Pipeline(Tables.documents(s, dir))
      .stage("quality_gate")(df => df
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("n_chars") >= 50 && col("n_tokens") >= 10))
      .stage("lang_gate")(df => df.filter(col("lang").isin("en", "de", "fr", "es")))
      .stage("exact_dedup")(df => df
        .withColumn("norm_hash", norm)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("norm_hash")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1))
      .stage("hash_sample")(df => df
        .filter(expr(Exact.md5IntExpr("CAST(doc_id AS STRING)", 1, 2)) < 192))
      .stage("rollup")(df => df.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("total_chars"),
        sum(col("n_tokens")).cast("bigint").as("total_tokens")))
      .plan
  }

  val qCurationPipelineSql: String =
    s"""WITH q AS (SELECT doc_id, lang, n_chars, text,
       |        len(string_split(text, ' ')) AS n_tokens
       |      FROM documents
       |      WHERE n_chars >= 50 AND len(string_split(text, ' ')) >= 10
       |        AND lang IN ('en', 'de', 'fr', 'es')),
       |d AS (SELECT *, ROW_NUMBER() OVER (
       |        PARTITION BY sha256(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
       |        ORDER BY doc_id) AS rn
       |      FROM q),
       |sam AS (SELECT * FROM d WHERE rn = 1
       |        AND ${Exact.md5IntSql("CAST(doc_id AS VARCHAR)", 1, 2)} < 192)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
       |FROM sam GROUP BY lang""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_pipeline_chain" -> ((qPipelineChain _, Some(qPipelineChainSql))),
    "q_pipeline_relational" -> ((qPipelineRelational _, Some(qPipelineRelationalSql))),
    "q_curation_pipeline" -> ((qCurationPipeline _, Some(qCurationPipelineSql)))
  )
}
