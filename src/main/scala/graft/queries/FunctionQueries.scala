package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Exact._

/** Scalar / JSON / array / higher-order function surface
  * (SURVEY.md §2.9 R12–R13). All functions are codegen'd built-ins — no
  * UDFs anywhere, so every query stays inside WholeStageCodegen.
  */
object FunctionQueries {

  /** String + date + math built-ins over customer/orders. Each expression is
    * chosen to have identical semantics in DuckDB (verified): upper/substr/
    * concat/length, year/month/dayofweek via date_part, sqrt/pow rounded r6.
    */
  def qScalarFns(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 3, 10)).as("prio_word"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority").substr(1, 1)).as("status_code"),
        length(col("o_orderpriority")).as("prio_len"),
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"),
        dayofmonth(col("o_orderdate")).as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        r6(sqrt(col("o_totalprice"))).as("sqrt_price"),
        r6(log(col("o_totalprice") + 1)).as("log_price"),
        round(col("o_totalprice"), 1).as("rounded_price"),
        abs(col("o_totalprice") - 1000).as("abs_diff"),
        (col("o_orderkey") % 7).as("key_mod7"),
        greatest(col("o_totalprice"), lit(500.0)).as("floor500"))
  }

  val qScalarFnsSql: String =
    """SELECT o_orderkey,
      |  UPPER(SUBSTRING(o_orderpriority, 3, 10)) AS prio_word,
      |  CONCAT_WS('-', o_orderstatus, SUBSTRING(o_orderpriority, 1, 1)) AS status_code,
      |  LENGTH(o_orderpriority) AS prio_len,
      |  CAST(date_part('year', o_orderdate) AS INT) AS o_year,
      |  CAST(date_part('month', o_orderdate) AS INT) AS o_month,
      |  CAST(date_part('day', o_orderdate) AS INT) AS o_day,
      |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      |  ROUND(SQRT(o_totalprice), 6) AS sqrt_price,
      |  ROUND(LN(o_totalprice + 1), 6) AS log_price,
      |  ROUND(o_totalprice, 1) AS rounded_price,
      |  ABS(o_totalprice - 1000) AS abs_diff,
      |  o_orderkey % 7 AS key_mod7,
      |  GREATEST(o_totalprice, 500.0) AS floor500
      |FROM orders WHERE o_orderkey < 500""".stripMargin

  /** JSON functions over events.props ('{"k": <int>}'): extraction via
    * get_json_object and typed from_json, aggregated. The reference's codec
    * layer (bert/encoders/base.py:58-153) is JSON-shaped; this is the query
    * face of the same machinery.
    */
  def qJsonFns(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy(col("event_type"), (col("k") % 10).as("k_mod10"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
  }

  val qJsonFnsSql: String =
    """SELECT event_type, CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod10,
      |  COUNT(*) AS n, CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Calendar truncation/extraction — the reporting-grain functions
    * (monthly rollups, quarter/week-of-year fields) not covered by
    * q_date_arith's day arithmetic. trunc-to-month emits DATE on both
    * engines; extracts are exact integers.
    */
  def qDateTrunc(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(trunc(col("o_orderdate").cast("date"), "month").as("order_month"),
        quarter(col("o_orderdate")).as("q"),
        year(col("o_orderdate")).as("y"),
        col("o_totalprice"), col("o_custkey"))
      .groupBy(col("order_month"), col("q"), col("y"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"),
        countDistinct(col("o_custkey")).as("n_customers"))
  }

  val qDateTruncSql: String =
    """SELECT date_trunc('month', o_orderdate) AS order_month,
      |  EXTRACT(quarter FROM o_orderdate) AS q,
      |  EXTRACT(year FROM o_orderdate) AS y,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT o_custkey) AS n_customers
      |FROM orders GROUP BY 1, 2, 3""".stripMargin

  /** Map-typed column surface through the gate: parse the JSON props into
    * a MAP, then exercise element_at / map_keys / map_values / map_concat —
    * the dynamic-payload path (§1.2's MapType fallback for schemaless
    * dicts). The oracle reads the same values through DuckDB's JSON ops.
    */
  def qMapFns(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .filter(col("event_id") < 300)
      .withColumn("m", from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")))
      .withColumn("m2", map_concat(col("m"),
        map_from_arrays(array(lit("etype_len")), array(length(col("event_type")).cast("bigint")))))
      .select(col("event_id"),
        element_at(col("m"), "k").as("k_value"),
        size(map_keys(col("m"))).as("n_keys"),
        element_at(col("m2"), "etype_len").as("etype_len"),
        expr("aggregate(map_values(m2), CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("value_sum"))
  }

  val qMapFnsSql: String =
    """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_value,
      |  len(json_keys(props)) AS n_keys,
      |  CAST(length(event_type) AS BIGINT) AS etype_len,
      |  CAST(props->>'$.k' AS BIGINT) + length(event_type) AS value_sum
      |FROM events WHERE event_id < 300""".stripMargin

  /** Array functions: tokenize documents (split) then explode → top-20 token
    * frequencies with deterministic tie-break. Scale: explode is a narrow
    * generate (no shuffle); the aggregate shuffles #distinct-tokens rows
    * after partial aggregation; top-k is TakeOrderedAndProject.
    */
  def qArrayExplode(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(20)
  }

  val qArrayExplodeSql: String =
    """SELECT token, COUNT(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |WHERE token <> ''
      |GROUP BY token ORDER BY freq DESC, token LIMIT 20""".stripMargin

  /** Higher-order functions on embeddings: per-vector L2 norm² and sum via
    * aggregate(transform(...)) with exact decimal accumulation. float→double
    * is exact and double*double of float-width values is exact, so the
    * decimal cast of each product is identical on both engines.
    * Scale: pure per-row computation — narrow, codegen'd, no shuffle.
    */
  def qHigherOrder(s: SparkSession, dir: String): DataFrame = {
    val DD = DecimalType(28, 14)
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        // decimal accumulation makes the fold order-independent; the final
        // r6 absorbs the engines' differing double→decimal rounding modes.
        r6(expr("CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,14)), (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,14)) AS DECIMAL(28,14))) AS DOUBLE)")).as("norm_sq"),
        r6(expr("CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,14)), (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14)) AS DECIMAL(28,14))) AS DOUBLE)")).as("sum_elems"),
        expr("size(filter(embedding, x -> x > 0))").as("n_positive"))
  }

  val qHigherOrderSql: String =
    """SELECT vec_id, label, len(embedding) AS dim,
      |  ROUND(CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(28,14)))) AS DOUBLE), 6) AS norm_sq,
      |  ROUND(CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14)))) AS DOUBLE), 6) AS sum_elems,
      |  len(list_filter(embedding, x -> x > 0)) AS n_positive
      |FROM embeddings WHERE vec_id < 100""".stripMargin

  /** CASE/null-handling/conditional surface: coalesce, nullif, null-safe
    * predicates over left-joined data (customers with/without F orders).
    */
  def qConditionalFns(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
      .groupBy(col("o_custkey")).agg(dsum(col("o_totalprice")).as("p_total"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .select(
        col("c_custkey"),
        coalesce(col("p_total"), lit(0.0)).as("p_total_or_zero"),
        when(col("p_total").isNull, "none")
          .when(col("p_total") > 100000, "big").otherwise("small").as("bucket"),
        col("p_total").isNotNull.as("has_p"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_or_null"))
  }

  val qConditionalFnsSql: String =
    """WITH o AS (SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS p_total
      |           FROM orders WHERE o_orderstatus = 'P' GROUP BY o_custkey)
      |SELECT c_custkey,
      |  COALESCE(p_total, 0.0) AS p_total_or_zero,
      |  CASE WHEN p_total IS NULL THEN 'none'
      |       WHEN p_total > 100000 THEN 'big' ELSE 'small' END AS bucket,
      |  p_total IS NOT NULL AS has_p,
      |  NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null
      |FROM customer LEFT JOIN o ON c_custkey = o_custkey""".stripMargin

  /** Date arithmetic: ship latency (datediff) and due dates (date_add)
    * over the order→lineitem chain, aggregated per priority. Latency stats
    * are exact integer math; the due-date sample keeps DATE type on both
    * engines.
    */
  def qDateArith(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("latency_days"),
        date_add(col("o_orderdate"), 30).as("due_date"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        min(col("latency_days")).as("min_latency"),
        max(col("latency_days")).as("max_latency"),
        sum(col("latency_days")).as("total_latency_days"),
        min(col("due_date")).as("earliest_due"),
        max(col("due_date")).as("latest_due"))
  }

  val qDateArithSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  MIN(date_diff('day', o_orderdate, l_shipdate)) AS min_latency,
      |  MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_latency,
      |  CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_latency_days,
      |  MIN(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS earliest_due,
      |  MAX(CAST(o_orderdate + INTERVAL 30 DAY AS DATE)) AS latest_due
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Spark 4 VARIANT path for semi-structured data — parse the props JSON
    * once into a VARIANT and extract typed fields with variant_get (the
    * shredded lakehouse alternative to per-field get_json_object
    * re-parsing, cf. q_json_fns). Exercises: typed extraction (bigint),
    * try_variant_get on a missing path (NULL, not an error),
    * schema_of_variant inference. DuckDB has no VARIANT, so the schema
    * string and missing-path behavior gate as contract verdicts; the
    * extracted VALUES gate exactly against json_extract. Scale: one
    * parse per row instead of one per field — the reason VARIANT exists.
    */
  def qVariant(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("v", expr("parse_json(props)"))
      .select(col("event_type"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("try_variant_get(v, '$.missing', 'string')").as("miss"),
        expr("schema_of_variant(v)").as("sch"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).cast("bigint").as("sum_k"),
        min(col("k")).cast("bigint").as("min_k"),
        max(col("k")).cast("bigint").as("max_k"),
        (count(lit(1)) - count(col("miss"))).cast("bigint").as("n_missing"),
        (count_distinct(col("sch")) === 1 &&
          max(col("sch")) === "OBJECT<k: BIGINT>").as("schema_ok"))
  }

  val qVariantSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  COUNT(*) AS n_missing,
      |  TRUE AS schema_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Generator/UDTF surface (SURVEY §2.8 U1 / §2.3 D2 — the 1→N emit
    * family beyond plain explode): three generators folded into one
    * (key, kind, pos, val) stream — stack() for columns→rows unpivot
    * pairs, posexplode() for position-tagged array expansion, and
    * explode(sequence()) for range generation. The oracle replays each
    * with DuckDB's UNNEST idioms (VALUES lateral for stack, range-index
    * for posexplode, range() for sequence), so generator ROW SETS —
    * including positions — are cross-engine-gated, not just counts.
    * Scale: generators are narrow (no shuffle); output volume is input ×
    * fan-out, the 1→N contract of the reference's queue emit
    * (bert/binding.py stage bodies yielding multiple items).
    */
  def qGenerators(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val st = n.select(col("n_nationkey").as("key"), lit("attr").as("kind"),
      expr("""stack(2, 0L, n_name, 1L, CAST(n_regionkey AS STRING))""")
        .as(Seq("pos", "val")))
      .select(col("key"), col("kind"), col("pos"), col("val"))
    val pe = n.select(col("n_nationkey").as("key"), lit("split").as("kind"),
      posexplode(split(col("n_name"), "A")).as(Seq("pos", "val")))
      .select(col("key"), col("kind"), col("pos").cast("long").as("pos"), col("val"))
    val sq = n.select(col("n_nationkey").as("key"), lit("seq").as("kind"),
      posexplode(sequence(lit(1L), col("n_regionkey") + 1)).as(Seq("pos", "num")))
      .select(col("key"), col("kind"), col("pos").cast("long").as("pos"),
        col("num").cast("string").as("val"))
    st.unionByName(pe).unionByName(sq)
  }

  val qGeneratorsSql: String =
    """SELECT n_nationkey AS key, 'attr' AS kind, v.pos, v.val
      |FROM nation, LATERAL (VALUES (CAST(0 AS BIGINT), n_name),
      |                             (1, CAST(n_regionkey AS VARCHAR))) v(pos, val)
      |UNION ALL
      |SELECT n_nationkey, 'split', CAST(i - 1 AS BIGINT),
      |  string_split(n_name, 'A')[CAST(i AS INT)]
      |FROM nation, UNNEST(range(1, len(string_split(n_name, 'A')) + 1)) AS u(i)
      |UNION ALL
      |SELECT n_nationkey, 'seq', CAST(i AS BIGINT),
      |  CAST(i + 1 AS VARCHAR)
      |FROM nation, UNNEST(range(0, n_regionkey + 1)) AS u(i)""".stripMargin

  /** URL parsing + per-host rollup — the provenance-normalization step
    * every web-scale corpus pipeline runs (host extraction for per-domain
    * quality caps, path/query decomposition for dedup keys). A canonical
    * URL is synthesized per document from its (source, lang, doc_id)
    * columns, then DECOMPOSED with Spark's codegen'd `parse_url`
    * (HOST/PATH/QUERY-key/REF); the oracle rebuilds each component
    * directly from the generating columns and never parses a URL, so a
    * component-boundary bug in the parse (host vs path vs query vs
    * fragment) breaks the hash gate. Scale: parse_url is a per-row
    * expression inside whole-stage codegen; the rollup is
    * map-side-combinable on O(#sources) groups.
    */
  def qUrlParse(s: SparkSession, dir: String): DataFrame = {
    val url = concat(
      lit("https://"), col("source"), lit(".example.com/"), col("lang"),
      lit("/"), col("doc_id"), lit("?ref=r"), pmod(col("doc_id"), lit(7)),
      lit("#frag"))
    Tables.documents(s, dir)
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY', 'ref')").as("ref"),
        expr("parse_url(url, 'REF')").as("frag"))
      .withColumn("path_lang", split(col("path"), "/").getItem(1))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("path")).as("n_paths"),
        countDistinct(col("path_lang")).as("n_langs"),
        countDistinct(col("ref")).as("n_refs"),
        min(col("frag")).as("min_frag"))
  }

  val qUrlParseSql: String =
    """SELECT source || '.example.com' AS host,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT '/' || lang || '/' || doc_id) AS n_paths,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  COUNT(DISTINCT 'r' || (doc_id % 7)) AS n_refs,
      |  MIN('frag') AS min_frag
      |FROM documents GROUP BY 1""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_url_parse" -> ((qUrlParse _, Some(qUrlParseSql))),
    "q_variant" -> ((qVariant _, Some(qVariantSql))),
    "q_generators" -> ((qGenerators _, Some(qGeneratorsSql))),
    "q_date_arith" -> ((qDateArith _, Some(qDateArithSql))),
    "q_date_trunc" -> ((qDateTrunc _, Some(qDateTruncSql))),
    "q_scalar_fns" -> ((qScalarFns _, Some(qScalarFnsSql))),
    "q_json_fns" -> ((qJsonFns _, Some(qJsonFnsSql))),
    "q_map_fns" -> ((qMapFns _, Some(qMapFnsSql))),
    "q_array_explode" -> ((qArrayExplode _, Some(qArrayExplodeSql))),
    "q_higher_order" -> ((qHigherOrder _, Some(qHigherOrderSql))),
    "q_conditional_fns" -> ((qConditionalFns _, Some(qConditionalFnsSql)))
  )
}
