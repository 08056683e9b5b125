package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Sort/limit/top-k, set operations, and grouping sets
  * (SURVEY.md §2.9 R8, R10, R11).
  */
object SortSetQueries {

  /** Top-15 orders by total price, deterministic tie-break on o_orderkey.
    * Scale: Catalyst plans TakeOrderedAndProject — each partition retains
    * 15 rows and the driver merges 15×P, never a global sort of the fact
    * table. This is the only safe top-k shape at 100 TB.
    */
  def qTopK(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
  }

  val qTopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** Keyset-style pagination page: multi-key ORDER BY with an explicit
    * NULLS LAST position on a null-bearing key (NULLIF turns status 'O'
    * into NULL, so both engines must agree on null placement, not just
    * value order), then LIMIT 20 OFFSET 100. The final o_orderkey key
    * makes the page deterministic. Scale note: OFFSET pagination is
    * driver-merged top-(offset+limit) — fine for page-sized offsets;
    * deep pagination at 100 TB should switch to keyset predicates
    * (WHERE (k1,k2) > (last_seen...)), which this ordering supports.
    */
  def qSortPaginate(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("status_key"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("status_key").asc_nulls_last, col("o_totalprice").desc, col("o_orderkey"))
      .offset(100)
      .limit(20)
  }

  val qSortPaginateSql: String =
    """SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS status_key, o_totalprice, o_orderdate
      |FROM orders
      |ORDER BY status_key ASC NULLS LAST, o_totalprice DESC, o_orderkey
      |LIMIT 20 OFFSET 100""".stripMargin

  /** Set ops in one result: nations that have customers vs suppliers —
    * INTERSECT, EXCEPT both ways, UNION, tagged so one frame carries all
    * four (R11). Scale: each leg aggregates to ≤25 keys before the set op,
    * so the set ops run on dimension-sized inputs.
    */
  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val custNations = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey")).distinct()
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("cust_only"))
    val suppOnly = suppNations.except(custNations).withColumn("tag", lit("supp_only"))
    val either = custNations.union(suppNations).distinct().withColumn("tag", lit("either"))
    both.union(custOnly).union(suppOnly).union(either)
  }

  val qSetOpsSql: String =
    """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'cust_only' FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'supp_only' FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
      |UNION ALL
      |SELECT nationkey, 'either' FROM (SELECT nationkey FROM cn UNION SELECT nationkey FROM sn)""".stripMargin

  /** ROLLUP region ⟶ nation over customer account balances, with
    * grouping_id so subtotal rows are distinguishable. Scale: rollup is a
    * single expand + hash aggregate; partial aggregation still applies.
    */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir))
    c.join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("c_acctbal")).as("sum_acctbal"),
        grouping_id().as("gid"))
  }

  val qRollupSql: String =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_acctbal,
      |  GROUPING(r_name) * 2 + GROUPING(n_name) AS gid
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  /** CUBE over order status × priority: all 2^2 grouping combinations. */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        grouping_id().as("gid"))
  }

  val qCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
      |  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Explicit GROUPING SETS via SQL: (status), (priority), and grand total —
    * the general form behind rollup/cube (R8).
    */
  def qGroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        |  grouping_id(o_orderstatus, o_orderpriority) AS gid
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  val qGroupingSetsSql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
      |  GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** unionByName with missing columns (schema evolution union): customers
    * and suppliers unified into one parties frame, absent fields null —
    * the schemaless-queue merge case (heterogeneous dict payloads in one
    * queue) done relationally.
    */
  def qUnionByName(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as("party_id"), lit("customer").as("kind"),
        col("c_nationkey").as("nationkey"), col("c_acctbal").as("acctbal"),
        col("c_mktsegment").as("mktsegment"))
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("party_id"), lit("supplier").as("kind"),
        col("s_nationkey").as("nationkey"), col("s_acctbal").as("acctbal"))
    c.unionByName(sup, allowMissingColumns = true)
      .groupBy(col("kind"), col("mktsegment"))
      .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("sum_bal"))
  }

  val qUnionByNameSql: String =
    """SELECT kind, mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_bal
      |FROM (
      |  SELECT c_custkey AS party_id, 'customer' AS kind, c_nationkey AS nationkey,
      |         c_acctbal AS acctbal, c_mktsegment AS mktsegment FROM customer
      |  UNION ALL BY NAME
      |  SELECT s_suppkey AS party_id, 'supplier' AS kind, s_nationkey AS nationkey,
      |         s_acctbal AS acctbal FROM supplier) parties
      |GROUP BY kind, mktsegment""".stripMargin

  /** max_by/min_by (argmax aggregates): richest/poorest customer per
    * nation. DuckDB 1.0's arg_max can't order by a struct, so both engines
    * rank on a padded fixed-width sort key (balance offset positive, then
    * custkey) — deterministic under balance ties.
    */
  def qArgmax(s: SparkSession, dir: String): DataFrame = {
    val ord = format_string("%012.2f|%010d", col("c_acctbal") + 10000, col("c_custkey"))
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        max_by(col("c_name"), ord).as("richest"),
        min_by(col("c_name"), ord).as("poorest"),
        max(col("c_acctbal")).as("max_bal"))
  }

  val qArgmaxSql: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers,
      |  arg_max(c_name, printf('%012.2f|%010d', c_acctbal + 10000, c_custkey)) AS richest,
      |  arg_min(c_name, printf('%012.2f|%010d', c_acctbal + 10000, c_custkey)) AS poorest,
      |  MAX(c_acctbal) AS max_bal
      |FROM customer GROUP BY c_nationkey""".stripMargin

  /** HyperLogLog distinct estimate — the 100 TB path where exact distinct
    * is a full shuffle of the key space. Sketch estimates differ by engine,
    * so the ESTIMATE itself can't be hash-compared; instead the query emits
    * the exact count plus a tolerance verdict (|approx−exact| ≤ 3·rsd·exact,
    * rsd = 0.05 default) and the oracle asserts the verdict is TRUE with the
    * same exact counts — an honest gate on the sketch's accuracy contract.
    */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users")).cast("double")
          <= col("exact_users").cast("double") * 0.15).as("hll_ok"))
  }

  val qApproxDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  COUNT(*) AS n_events, TRUE AS hll_ok
      |FROM events GROUP BY event_type""".stripMargin

  /** Ordered string aggregation (LISTAGG ... WITHIN GROUP): the canonical
    * "collapse a group to a delimited, deterministically ordered list"
    * reporting op. The explicit ORDER BY inside the aggregate is what makes
    * it gate-able — an unordered collect_list is nondeterministic under any
    * parallel execution. Scale: one hash shuffle on the group key; the
    * per-group sort is bounded by group width (here: nations per region).
    */
  def qStringAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(expr("listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n_nations"))
  }

  val qStringAggSql: String =
    """SELECT r_name, string_agg(n_name, '|' ORDER BY n_name) AS nations,
      |  COUNT(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** Boolean and bitwise aggregates — the predicate-rollup surface
    * (bool_and/bool_or for "does every/any row satisfy X", bit_and/or/xor
    * for mask folding). All are order-independent reductions, so they are
    * exactly hash-gateable and AQE/partition-count-proof by construction.
    * Scale: one hash aggregate with map-side partials; #groups rows move.
    */
  def qBoolBitAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("bool_and(value > 0)").as("all_positive"),
        expr("bool_or(value > 100)").as("any_large"),
        expr("bit_and(user_id)").as("uid_mask_and"),
        expr("bit_or(user_id)").as("uid_mask_or"),
        expr("bit_xor(user_id)").as("uid_mask_xor"))
  }

  val qBoolBitAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  bool_and("value" > 0) AS all_positive,
      |  bool_or("value" > 100) AS any_large,
      |  bit_and(user_id) AS uid_mask_and,
      |  bit_or(user_id) AS uid_mask_or,
      |  bit_xor(user_id) AS uid_mask_xor
      |FROM events GROUP BY event_type""".stripMargin

  /** Exact distinct set carried as an aggregate VALUE via the typed
    * Aggregator UDAF (functions.DistinctSetAgg) — the reference's
    * ETLState-as-a-value shape. Output is the sorted member array, so the
    * custom merge path (set union across partitions) hash-gates against
    * DuckDB's list aggregation; group cardinality is bounded (users per
    * event type), which is the only regime where a set-valued aggregate
    * is scale-sane.
    */
  def qDistinctSet(s: SparkSession, dir: String): DataFrame = {
    // The set is emitted as a comma-joined string, not array<bigint>: the
    // gate harness sorts result columns with pandas, which cannot sort
    // ndarray cells (r5 verdict). Same information, hashable shape.
    Tables.events(s, dir)
      .filter(col("user_id") < 40)
      .groupBy(col("event_type"))
      .agg(graft.functions.DistinctSetAgg.distinctSet(col("user_id")).as("users_set"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"),
        concat_ws(",", expr("transform(users_set, x -> cast(x as string))")).as("users"),
        col("n_events"))
  }

  val qDistinctSetSql: String =
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
      |  COUNT(*) AS n_events
      |FROM events WHERE user_id < 40 GROUP BY event_type""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_distinct_set" -> ((qDistinctSet _, Some(qDistinctSetSql))),
    "q_bool_bit_agg" -> ((qBoolBitAgg _, Some(qBoolBitAggSql))),
    "q_string_agg" -> ((qStringAgg _, Some(qStringAggSql))),
    "q_union_by_name" -> ((qUnionByName _, Some(qUnionByNameSql))),
    "q_argmax" -> ((qArgmax _, Some(qArgmaxSql))),
    "q_approx_distinct" -> ((qApproxDistinct _, Some(qApproxDistinctSql))),
    "q_topk" -> ((qTopK _, Some(qTopKSql))),
    "q_sort_paginate" -> ((qSortPaginate _, Some(qSortPaginateSql))),
    "q_set_ops" -> ((qSetOps _, Some(qSetOpsSql))),
    "q_rollup" -> ((qRollup _, Some(qRollupSql))),
    "q_cube" -> ((qCube _, Some(qCubeSql))),
    "q_grouping_sets" -> ((qGroupingSets _, Some(qGroupingSetsSql)))
  )
}
