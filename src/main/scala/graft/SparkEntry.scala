package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by per-area modules under graft.queries; each
  * module returns name -> (query fn, optional DuckDB oracle SQL). Names must
  * be unique across modules (asserted here so a collision fails fast at
  * class-init instead of silently dropping a query from the gate).
  */
object SparkEntry {

  private val modules: Seq[Map[String, ((SparkSession, String) => DataFrame, Option[String])]] =
    Seq(
      RelationalQueries.all,
      JoinQueries.all,
      WindowQueries.all,
      SortSetQueries.all,
      FunctionQueries.all,
      DedupQueries.all,
      TextQueries.all,
      SimilarityQueries.all,
      PipelineQueries.all,
      AdvancedQueries.all,
      StreamingQueries.all,
      NorthStarQueries.all,
      AnalyticsQueries.all,
      LearnQueries.all,
      EvalQueries.all,
      HostileCorpusQueries.all
    )

  private val merged: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = {
    val total = modules.map(_.size).sum
    val m = modules.reduceOption(_ ++ _).getOrElse(Map.empty)
    require(m.size == total, "duplicate query name across query modules")
    m
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    merged.collect { case (k, (_, Some(sql))) => k -> sql }
}
