package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Custom-class encoder registry round-trip over real rows — the
    * reference's BertETLEncodingMap / ETLReference wire format
    * (bert/encoders/datatypes.py:11-81, bert/etl/__init__.py:239-260) as a
    * columnar struct: per document, a DatasetRef-shaped record
    * {message: source, _class_path_ref, signature} is ENCODED with
    * codegen'd built-ins (struct/lit/sha2, signature = sha256 of the
    * sorted key mesh exactly as datatypes.py:48-59 computes it), then
    * VALIDATED column-side (tag ∈ registry, signature recomputed from the
    * struct's own field names) and decoded back. The oracle recomputes the
    * signature constant with DuckDB's independent sha256 and asserts every
    * record validates — engine-vs-engine on the actual wire hash.
    */
  def qClassRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.types.ClassRegistry
    val reg = ClassRegistry.default()
    val enc = Tables.documents(s, dir).select(
      col("doc_id"),
      ClassRegistry.encodeClassColumn(
        ClassRegistry.DatasetRefCodec.classPath,
        "message" -> col("source")).as("rec"))
    val fieldNames = Seq("message", ClassRegistry.RefKey, ClassRegistry.SigKey)
    enc
      .withColumn("valid", ClassRegistry.validClassColumn(col("rec"), reg, fieldNames))
      .groupBy(col("rec").getField("message").as("message"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("rec").getField(ClassRegistry.SigKey)).as("sig"),
        min(col("valid")).as("all_valid"))
  }

  val qClassRoundtripSql: String =
    """SELECT source AS message, COUNT(*) AS n_docs,
      |  sha256('_class_path_refmessage') AS sig,
      |  TRUE AS all_valid
      |FROM documents GROUP BY source""".stripMargin

  /** S5 HTTP ingestion adapter end-to-end: deterministic raw HTTP request
    * texts are BUILT from documents rows (one multipart POST per doc, with
    * planted method/path errors on doc_id % 13 / % 17 so the 405/400
    * triage paths run), parsed by [[graft.io.EventAdapters.httpWorkItems]]
    * into the reference's work-item shape, and rolled up by (status,
    * extracted form field). The oracle recomputes the triage + extraction
    * directly from documents — gating request-line validation, multipart
    * boundary split, and Content-Disposition name extraction.
    */
  def qHttpSeed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.io.EventAdapters
    val part = (name: String, value: Column) => concat(
      lit("\r\n--gb\r\nContent-Disposition: form-data; name=\"" + name + "\"\r\n\r\n"),
      value)
    val postHead =
      "POST /prod/ingest HTTP/1.1\r\nContent-Type: multipart/form-data; boundary=gb\r\n\r\n"
    val wrongHead =
      "POST /prod/other HTTP/1.1\r\nContent-Type: multipart/form-data; boundary=gb\r\n\r\n"
    val raw = Tables.documents(s, dir).select(
      when(col("doc_id") % 13 === 0, lit("GET /prod/ingest HTTP/1.1\r\n\r\n"))
        .when(col("doc_id") % 17 === 0, lit(wrongHead))
        .otherwise(concat(lit(postHead),
          part("source", col("source")), part("lang", col("lang")),
          lit("\r\n--gb--\r\n"))).as("req"))
      .as[String]
    EventAdapters.httpWorkItems(s, raw, "POST", "prod", "/ingest")
      .groupBy(col("status"),
        coalesce(element_at(col("postContents"), "source"), lit("-")).as("source"))
      .agg(count(lit(1)).as("n"))
  }

  val qHttpSeedSql: String =
    """SELECT CASE WHEN doc_id % 13 = 0 THEN 405
      |            WHEN doc_id % 17 = 0 THEN 400
      |            ELSE 200 END AS status,
      |  CASE WHEN doc_id % 13 = 0 OR doc_id % 17 = 0 THEN '-' ELSE source END AS source,
      |  COUNT(*) AS n
      |FROM documents GROUP BY 1, 2""".stripMargin

  /** S6 Cognito trigger adapter end-to-end: POST_AUTHENTICATION events are
    * BUILT from customer rows with the engine-side to_json builder (the
    * trigger_content shape, datatypes.py:27-52), parsed back with
    * from_json + flatten ([[graft.io.EventAdapters.cognitoSeed]] — pure
    * Catalyst, no UDF), and aggregated. The oracle recomputes the same
    * rollup straight from customer, gating the JSON schema, the quoted
    * `cognito:*` attribute keys, and the flattening.
    */
  def qCognitoSeed(s: SparkSession, dir: String): DataFrame = {
    import graft.io.EventAdapters
    val email = concat(
      lower(regexp_replace(col("c_name"), "[^a-zA-Z0-9]", "")), lit("@example.com"))
    // the synthetic customer table carries no phone column; derive one
    // deterministically so the attribute still round-trips through the map
    val phone = concat(lit("+1240"), col("c_custkey").cast("string"))
    val events = Tables.customer(s, dir).select(
      EventAdapters.cognitoEventJson(
        lit("us-east-1"), lit("pool-1"), lit("client-1"),
        col("c_name"), email, col("c_name"), phone).as("event"))
    EventAdapters.cognitoSeed(events, "event")
      .groupBy(col("user_status"), col("email_verified"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_name")).as("n_users"),
        min(col("email")).as("min_email"),
        max(col("phone_number")).as("max_phone"))
  }

  val qCognitoSeedSql: String =
    """SELECT 'CONFIRMED' AS user_status, 'true' AS email_verified,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT c_name) AS n_users,
      |  MIN(lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '', 'g')) || '@example.com') AS min_email,
      |  MAX('+1240' || CAST(c_custkey AS VARCHAR)) AS max_phone
      |FROM customer GROUP BY 1, 2""".stripMargin

  /** S7/JDBC witnessed by the driver's gate (r7 verdict item #8): nation
    * is written INTO an embedded Derby database through the JDBC sink
    * path, read BACK through [[graft.io.Sources.jdbc]] as a partitioned
    * parallel scan (4 key-range partitions — the shape a fact-sized
    * Postgres read needs), and summarized with exact integer aggregates.
    * The oracle computes the same aggregates straight from the nation
    * parquet, so a row dropped/duplicated or a value mangled anywhere in
    * the JDBC write→store→partitioned-read cycle breaks the hash gate.
    * Derby is in-JVM (ships with Spark) — no external service; overwrite
    * mode makes reruns idempotent.
    */
  def qJdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:graftq;create=true"
    Tables.nation(s, dir).write.format("jdbc")
      .option("url", url).option("dbtable", "nation_rt")
      .mode("overwrite").save()
    graft.io.Sources.jdbc(s, url, "nation_rt",
        partition = Some(("n_nationkey", 0L, 24L, 4)))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("n_nationkey")).as("n_nations"),
        sum(col("n_nationkey")).cast("bigint").as("sum_key"),
        count_distinct(col("n_regionkey")).as("n_regions"),
        sum(length(col("n_name"))).cast("bigint").as("name_chars"))
  }

  val qJdbcRoundtripSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(DISTINCT n_nationkey) AS n_nations,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  COUNT(DISTINCT n_regionkey) AS n_regions,
      |  CAST(SUM(LENGTH(n_name)) AS BIGINT) AS name_chars
      |FROM nation""".stripMargin

  /** S7 predicate pushdown through the JDBC source (r8 verdict item #7):
    * q_jdbc_roundtrip proves the write→read cycle moves every row; this
    * proves a FILTERED read doesn't fetch-all — the `n_regionkey = 1`
    * predicate lands in the Derby-side SELECT (JDBCRelation compiles
    * pushed filters into each partition's WHERE clause), so at scale the
    * database ships only the surviving fraction instead of the whole
    * table. The values are gated here (oracle = the same filtered
    * aggregate on the nation parquet twin); the PLAN is gated in JdbcSpec,
    * which asserts a non-empty PushedFilters list on this exact shape.
    */
  def qJdbcPushdown(s: SparkSession, dir: String): DataFrame = {
    val url = "jdbc:derby:memory:graftpd;create=true"
    Tables.nation(s, dir).write.format("jdbc")
      .option("url", url).option("dbtable", "nation_pd")
      .mode("overwrite").save()
    graft.io.Sources.jdbc(s, url, "nation_pd",
        partition = Some(("n_nationkey", 0L, 24L, 4)))
      .filter(col("n_regionkey") === 1)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_nationkey")).cast("bigint").as("sum_key"),
        min(col("n_name")).as("min_name"),
        max(col("n_name")).as("max_name"))
  }

  val qJdbcPushdownSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS sum_key,
      |  MIN(n_name) AS min_name, MAX(n_name) AS max_name
      |FROM nation WHERE n_regionkey = 1""".stripMargin

  /** R1/S8 widened to XML — Spark 4's built-in XML data source (the
    * upstreamed spark-xml), exercised as a full write→read round trip
    * with a NESTED element (the thing XML does that CSV cannot): supplier
    * rows are emitted as `<supplier>` elements whose account details nest
    * as a child element, read back with an explicit schema (struct
    * column), and summarized with exact aggregates — the balance sum
    * rides the DECIMAL(12,4) cast through the text round trip, so a
    * serialization/parse defect anywhere (attribute vs element, struct
    * flattening, decimal formatting) breaks the hash gate. Oracle: the
    * same aggregates straight off the supplier parquet twin (the
    * q_jdbc_roundtrip discipline). Scale: XML read/write is a plain
    * partitioned file scan — one task per split, no driver funnel
    * (coalesce(1) here is only so the tiny test emit is one file).
    */
  def qXmlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    // fixed per-JVM path + overwrite mode: reruns (Bench best-of-N, every
    // Verify round) replace the emit instead of leaking a fresh tempdir
    // with a full supplier copy per invocation
    val tmp = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_xml_roundtrip", "suppliers").toString
    graft.io.Sources.writeXml(
      Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"),
          struct(col("s_nationkey").as("nation"),
            col("s_acctbal").cast(Exact.D).as("balance")).as("account"))
        .coalesce(1),
      tmp, rowTag = "supplier")
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("account", StructType(Seq(
        StructField("nation", LongType),
        StructField("balance", Exact.D))))))
    graft.io.Sources.xml(s, tmp, rowTag = "supplier", schema = Some(schema))
      .agg(
        count(lit(1)).as("n_rows"),
        count_distinct(col("account.nation")).as("n_nations"),
        sum(col("s_suppkey")).cast("bigint").as("sum_key"),
        sum(length(col("s_name"))).cast("bigint").as("name_chars"),
        sum(col("account.balance")).cast("double").as("total_balance"))
  }

  val qXmlRoundtripSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  COUNT(DISTINCT s_nationkey) AS n_nations,
      |  CAST(SUM(s_suppkey) AS BIGINT) AS sum_key,
      |  CAST(SUM(LENGTH(s_name)) AS BIGINT) AS name_chars,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS total_balance
      |FROM supplier""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_xml_roundtrip" -> ((qXmlRoundtrip _, Some(qXmlRoundtripSql))),
    "q_jdbc_roundtrip" -> ((qJdbcRoundtrip _, Some(qJdbcRoundtripSql))),
    "q_jdbc_pushdown" -> ((qJdbcPushdown _, Some(qJdbcPushdownSql))),
    "q_pipeline_chain" -> ((qPipelineChain _, Some(qPipelineChainSql))),
    "q_pipeline_relational" -> ((qPipelineRelational _, Some(qPipelineRelationalSql))),
    "q_curation_pipeline" -> ((qCurationPipeline _, Some(qCurationPipelineSql))),
    "q_class_roundtrip" -> ((qClassRoundtrip _, Some(qClassRoundtripSql))),
    "q_http_seed" -> ((qHttpSeed _, Some(qHttpSeedSql))),
    "q_cognito_seed" -> ((qCognitoSeed _, Some(qCognitoSeedSql)))
  )
}
