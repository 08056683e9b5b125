package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Dedup and identity surface — the reference's only stateful machinery
  * re-expressed relationally (SURVEY.md §2.4 C1/C5, §1.3 identity).
  *
  * Reference semantics being mirrored:
  *  - QueueItem identity = sha256 of the canonicalized payload
  *    (bert/queues.py:29-35) — here `sha2(concat_ws(...), 256)` over the
  *    row's columns (deliberately WITHOUT the reference's appended uuid4,
  *    which made identities unique and dedup vacuous — see SURVEY §1.3).
  *  - ETLState.contains/contain — "have I seen this value" set membership
  *    (bert/etl/__init__.py:24-84) — here an anti-join against a state
  *    table. The reference kept the whole set in ONE S3 JSON doc (does not
  *    scale); an anti-join shuffles only matching keys and is the 100 TB
  *    shape.
  *  - bert-debug.py dedup diagnostics: hash each entry, count dups
  *    (bert/debug/factory.py:41-59).
  */
object DedupQueries {

  /** Exact dedup, keep-first: one event per (user_id, event_type), earliest
    * event_id wins. dropDuplicates() is nondeterministic about the survivor,
    * so the deterministic form is a window rn=1 — same plan shape (shuffle
    * on the key, per-group sort over 2 columns), deterministic output.
    * Scale: Spark 3.5+ rewrites rn=1 to a window-group-limit, so only one
    * row per group survives each sort buffer.
    */
  def qDedupExact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
  }

  val qDedupExactSql: String =
    """SELECT user_id, event_type, event_id, value FROM (
      |  SELECT user_id, event_type, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  /** Identity column: content hash of every document row. The canonical
    * string is an explicit '|'-joined column list (field order fixed by the
    * query, not by JSON serialization quirks). Narrow projection, codegen'd
    * sha2 — no shuffle at all.
    */
  def qIdentityHash(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        sha2(concat_ws("|",
          col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text")), 256)
          .as("identity"))
  }

  val qIdentityHashSql: String =
    """SELECT doc_id,
      |  sha256(concat_ws('|', doc_id, lang, source, n_chars, text)) AS identity
      |FROM documents""".stripMargin

  /** ETLState as a table: rows already "seen" (here: documents with
    * doc_id < 250, keyed by text hash) filter out re-submissions via
    * left-anti join. Exactly ETLState.contains → skip (C1), but distributed:
    * the state is a keyed table, the membership test a hash anti-join.
    */
  def qDedupState(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val state = docs.filter(col("doc_id") < 250)
      .select(sha2(col("text"), 256).as("seen_hash"))
    docs.withColumn("h", sha2(col("text"), 256))
      .join(state, col("h") === col("seen_hash"), "left_anti")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_new_docs"), sum(col("n_chars")).as("new_chars"))
  }

  val qDedupStateSql: String =
    """SELECT lang, COUNT(*) AS n_new_docs, CAST(SUM(n_chars) AS BIGINT) AS new_chars
      |FROM documents d
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents s WHERE s.doc_id < 250
      |    AND sha256(s.text) = sha256(d.text))
      |GROUP BY lang""".stripMargin

  /** Dedup diagnostics (C5): hash-group rows, report groups seen more than
    * once. Key = (user_id, event_type) over events. The reference did this
    * with a Python set over a full queue scan; here it is one hash aggregate
    * with map-side partials.
    */
  def qDedupDiag(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("dup_groups"),
        sum(col("n_copies") - 1).as("redundant_rows"),
        max(col("n_copies")).as("worst_group"))
  }

  val qDedupDiagSql: String =
    """SELECT event_type, COUNT(*) AS dup_groups,
      |  CAST(SUM(n_copies - 1) AS BIGINT) AS redundant_rows, MAX(n_copies) AS worst_group
      |FROM (SELECT user_id, event_type, COUNT(*) AS n_copies
      |      FROM events GROUP BY 1, 2) g
      |WHERE n_copies > 1 GROUP BY event_type""".stripMargin

  /** Referential-integrity + constraint validation as a query (ops.Validate
    * semantics, SURVEY §1.2 schema enforcement): orphan counts for both FK
    * edges of the fact chain plus null/range rule violations on orders.
    * All-zeros on this dataset — the assertion that the warehouse is
    * consistent IS the result.
    */
  def qValidate(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val cust = Tables.customer(s, dir)
    val orphanLi = graft.ops.Validate.orphans(li, "l_orderkey", orders, "o_orderkey").count()
    val orphanOrd = graft.ops.Validate.orphans(orders, "o_custkey", cust, "c_custkey").count()
    val rules = graft.ops.Validate.notNull("o_orderkey", "o_custkey") :+
      graft.ops.Validate.inRange("o_totalprice", 0.0, 1e9)
    graft.ops.Validate.report(orders, rules)
      .withColumn("orphan_lineitems", lit(orphanLi))
      .withColumn("orphan_orders", lit(orphanOrd))
  }

  val qValidateSql: String =
    """WITH o AS (SELECT COUNT(*) AS rows_checked,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v2,
      |  CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND o_totalprice NOT BETWEEN 0 AND 1e9 THEN 1 ELSE 0 END) AS BIGINT) AS v3
      |  FROM orders),
      |orphan_li AS (SELECT COUNT(*) AS n FROM lineitem l
      |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l.l_orderkey)),
      |orphan_o AS (SELECT COUNT(*) AS n FROM orders od
      |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = od.o_custkey))
      |SELECT r.rule, r.violations, o.rows_checked,
      |  orphan_li.n AS orphan_lineitems, orphan_o.n AS orphan_orders
      |FROM o, orphan_li, orphan_o,
      |  LATERAL (VALUES ('not_null(o_orderkey)', v1),
      |                  ('not_null(o_custkey)', v2),
      |                  ('range(o_totalprice)', v3)) AS r(rule, violations)""".stripMargin

  /** Intake profile as a query (ops.Profile): one aggregate pass emits the
    * long-format (column, metric, value) quality sweep over `events`. The
    * deterministic metrics (nulls, min/max — length min/max for strings)
    * hash-gate exactly; the HLL distinct estimate differs by engine, so it
    * becomes an in-query tolerance verdict against the exact distinct
    * (|approx−exact| ≤ 3·rsd·exact, the same contract as
    * q_approx_distinct). Scale: Profile is one conditional-aggregate pass
    * (a single reduced row — the only driver materialization, metadata
    * scale); the verdict join is a 6-row equi-join.
    */
  def qProfile(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val prof = graft.ops.Profile.profile(s, ev)
    val det = prof.filter(col("metric") =!= "distinct")
    val exact = ev.agg(
        countDistinct(col("event_id")).as("event_id"),
        countDistinct(col("ts")).as("ts"),
        countDistinct(col("user_id")).as("user_id"),
        countDistinct(col("event_type")).as("event_type"),
        countDistinct(col("value")).as("value"),
        countDistinct(col("props")).as("props"))
      .select(expr(
        """stack(6, 'event_id', event_id, 'ts', ts, 'user_id', user_id,
          |  'event_type', event_type, 'value', value, 'props', props)
          |  AS (column, exact_distinct)""".stripMargin))
    val verdict = prof.filter(col("metric") === "distinct")
      .join(exact, "column")
      .select(col("column"), lit("distinct_ok").as("metric"),
        when(abs(col("value") - col("exact_distinct"))
          <= col("exact_distinct").cast("double") * 0.15, 1.0).otherwise(0.0)
          .as("value"),
        col("rows"))
    det.unionByName(verdict)
  }

  val qProfileSql: String =
    """WITH a AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS ei_nulls,
      |  CAST(MIN(event_id) AS DOUBLE) AS ei_min, CAST(MAX(event_id) AS DOUBLE) AS ei_max,
      |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS ts_nulls,
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS ui_nulls,
      |  CAST(MIN(user_id) AS DOUBLE) AS ui_min, CAST(MAX(user_id) AS DOUBLE) AS ui_max,
      |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS et_nulls,
      |  CAST(MIN(length(event_type)) AS DOUBLE) AS et_min,
      |  CAST(MAX(length(event_type)) AS DOUBLE) AS et_max,
      |  CAST(SUM(CASE WHEN "value" IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS v_nulls,
      |  CAST(MIN("value") AS DOUBLE) AS v_min, CAST(MAX("value") AS DOUBLE) AS v_max,
      |  CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS DOUBLE) AS p_nulls,
      |  CAST(MIN(length(props)) AS DOUBLE) AS p_min,
      |  CAST(MAX(length(props)) AS DOUBLE) AS p_max
      |  FROM events)
      |SELECT r."column", r.metric, r."value", a.n AS "rows"
      |FROM a, LATERAL (VALUES
      |  ('event_id','nulls',ei_nulls), ('event_id','distinct_ok',1.0),
      |  ('event_id','min',ei_min), ('event_id','max',ei_max),
      |  ('ts','nulls',ts_nulls), ('ts','distinct_ok',1.0),
      |  ('user_id','nulls',ui_nulls), ('user_id','distinct_ok',1.0),
      |  ('user_id','min',ui_min), ('user_id','max',ui_max),
      |  ('event_type','nulls',et_nulls), ('event_type','distinct_ok',1.0),
      |  ('event_type','min',et_min), ('event_type','max',et_max),
      |  ('value','nulls',v_nulls), ('value','distinct_ok',1.0),
      |  ('value','min',v_min), ('value','max',v_max),
      |  ('props','nulls',p_nulls), ('props','distinct_ok',1.0),
      |  ('props','min',p_min), ('props','max',p_max)
      |) AS r("column", metric, "value")""".stripMargin

  /** Exact substring-duplication coverage (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * criterion): a span is duplicated if its K=10-token window appears
    * verbatim in ANOTHER document. Positional shingles replace the paper's
    * suffix array — same duplicated-span set, but built from a groupBy
    * (doc-distinct shingle counts) instead of a global sort, so it
    * distributes: the only corpus-wide shuffle carries (shingle, doc)
    * pairs. Overlapping duplicated windows are merged into maximal islands
    * per doc with the running-max interval-union window (partitioned by
    * doc — no global window), and the report is per-doc duplicated-token
    * coverage: integers end-to-end, ratio r6'd last.
    */
  def qSubstringDup(s: SparkSession, dir: String): DataFrame = {
    val K = 10
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= K)
    val sh = t.select(col("doc_id"), explode(expr(
      s"transform(sequence(0, size(tk)-$K), i -> struct(CAST(i AS BIGINT) AS pos, concat_ws(' ', slice(tk, i+1, $K)) AS g))")).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.g").as("g"))
    val dup = sh.groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") >= 2)
      .select(col("g"))
    val pos = sh.join(dup, "g")
      .select(col("doc_id"), col("pos").as("st"), (col("pos") + K - 1).as("en"))
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("st"), col("en"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = pos
      .withColumn("brk",
        when(col("st") > coalesce(max(col("en")).over(wPrev), lit(-1L)), 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("st")).as("s0"), max(col("en")).as("e0"))
    val agg = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("e0") - col("s0") + 1).as("dup_tokens"))
    t.join(agg, "doc_id")
      .select(col("doc_id"), size(col("tk")).as("n_tokens"),
        col("n_spans"), col("dup_tokens"),
        r6(col("dup_tokens").cast("double") / size(col("tk"))).as("dup_ratio"))
      .orderBy(col("dup_ratio").desc, col("doc_id"))
      .limit(25)
  }

  val qSubstringDupSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
      |           WHERE len(string_split(text, ' ')) >= 10),
      |sh AS (SELECT doc_id, CAST(i AS BIGINT) - 1 AS pos,
      |         array_to_string(tk[CAST(i AS INT):CAST(i+9 AS INT)], ' ') AS g
      |       FROM t, UNNEST(range(1, len(tk) - 10 + 2)) AS u(i)),
      |dup AS (SELECT g FROM sh GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |pos AS (SELECT s.doc_id, s.pos AS st, s.pos + 9 AS en FROM sh s JOIN dup USING (g)),
      |isl AS (SELECT doc_id, st, en,
      |          CASE WHEN st > COALESCE(MAX(en) OVER (PARTITION BY doc_id ORDER BY st, en
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
      |               THEN 1 ELSE 0 END AS brk
      |        FROM pos),
      |isl2 AS (SELECT doc_id, st, en,
      |           SUM(brk) OVER (PARTITION BY doc_id ORDER BY st, en
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |         FROM isl),
      |spans AS (SELECT doc_id, island, MIN(st) AS s0, MAX(en) AS e0
      |          FROM isl2 GROUP BY doc_id, island),
      |agg AS (SELECT doc_id, COUNT(*) AS n_spans,
      |          CAST(SUM(e0 - s0 + 1) AS BIGINT) AS dup_tokens FROM spans GROUP BY doc_id)
      |SELECT t.doc_id, len(t.tk) AS n_tokens, a.n_spans, a.dup_tokens,
      |  ROUND(CAST(a.dup_tokens AS DOUBLE) / len(t.tk), 6) AS dup_ratio
      |FROM t JOIN agg a USING (doc_id)
      |ORDER BY dup_ratio DESC, t.doc_id LIMIT 25""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_substring_dup" -> ((qSubstringDup _, Some(qSubstringDupSql))),
    "q_validate" -> ((qValidate _, Some(qValidateSql))),
    "q_profile" -> ((qProfile _, Some(qProfileSql))),
    "q_dedup_exact" -> ((qDedupExact _, Some(qDedupExactSql))),
    "q_identity_hash" -> ((qIdentityHash _, Some(qIdentityHashSql))),
    "q_dedup_state" -> ((qDedupState _, Some(qDedupStateSql))),
    "q_dedup_diag" -> ((qDedupDiag _, Some(qDedupDiagSql)))
  )
}
