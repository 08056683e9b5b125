package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Exact._

/** Join surface (SURVEY.md §2.9 R4–R6): equi inner/outer, broadcast star
  * joins, semi/anti, and non-equi range joins.
  *
  * The reference delegates all joins to user Python (verified absence,
  * SURVEY §2.9); here they are first-class declarative plans so Catalyst
  * picks the physical join. 100 TB posture notes per query below; dimension
  * tables (region 5 / nation 25 / part 2k·sf / supplier 100·sf) are
  * broadcast explicitly so the big fact tables never shuffle for them.
  */
object JoinQueries {

  /** TPC-H Q3 shape: customer⋈orders⋈lineitem, filter early, top-10 revenue.
    * Scale: filters pushed below the joins (Catalyst), the two fact-fact
    * joins shuffle on their keys; top-k plans as TakeOrderedAndProject —
    * each partition keeps 10 rows, driver merges 10×P rows, never a global
    * sort. Tie-break on l_orderkey keeps the LIMIT deterministic.
    */
  def q3Join(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dProductSum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: 6-table star join, revenue per nation.
    * Scale: region/nation/supplier/customer are dimensions — broadcast them
    * (explicit hint) so lineitem⋈orders is the only shuffle join; the agg is
    * 25 groups with map-side partial aggregation, so the final shuffle is
    * tiny. At 100 TB the plan is one fact-fact shuffle + broadcast hash
    * joins, which is the plan a human would hand-pick.
    */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    // customer is NOT hinted: it's a semi-fact (150k rows/sf) — small enough
    // for AQE to broadcast at low sf, correctly shuffle-joined at 100 TB.
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    val sup = broadcast(Tables.supplier(s, dir))
    val n = broadcast(Tables.nation(s, dir))
    val r = broadcast(Tables.region(s, dir).filter(col("r_name").isin("ASIA", "EUROPE")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dProductSum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .as("revenue"))
  }

  val q5MultiJoinSql: String =
    """SELECT r_name, n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(24,4)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY r_name, n_name""".stripMargin

  /** Left-semi join: customers with at least one urgent open order.
    * Semantics match the reference's C1 "have I seen this" check inverted
    * (ref: bert/etl/__init__.py:71-80). Scale: semi-join shuffles only the
    * distinct keys of the probe side; no row multiplication ever.
    */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_orderstatus") === "O")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
  }

  val qSemiJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE) AS sum_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |              AND o.o_orderpriority = '1-URGENT' AND o.o_orderstatus = 'O')
      |GROUP BY c_mktsegment""".stripMargin

  /** Left-anti join: customers with no 'P'-status order — the dedup/state
    * primitive (ref ETLState.contains, bert/etl/__init__.py:71-80) as a
    * relational plan. Scale: anti-join is a shuffle on the key with early
    * termination per match; never materializes the complement.
    */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "P")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin

  /** Left-outer join preserving zero-order customers, rolled up per nation.
    * Scale: count aggregation pushed after the join; the outer join shuffles
    * on custkey; nation is broadcast.
    */
  def qLeftJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    val n = broadcast(Tables.nation(s, dir))
    val perCust = c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(count(col("o_orderkey")).as("n_f_orders"))
    perCust.join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("n_f_orders")).as("total_f_orders"),
        sum(when(col("n_f_orders") === 0, 1).otherwise(0)).as("zero_order_customers"))
  }

  val qLeftJoinAggSql: String =
    """WITH per_cust AS (
      |  SELECT c_custkey, c_nationkey, COUNT(o_orderkey) AS n_f_orders
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderstatus = 'F'
      |  GROUP BY c_custkey, c_nationkey)
      |SELECT n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(n_f_orders) AS BIGINT) AS total_f_orders,
      |  CAST(SUM(CASE WHEN n_f_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_order_customers
      |FROM per_cust JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin

  /** Full-outer join of two aggregates: customer count vs supplier count per
    * nation (nations may lack either side). Scale: both inputs are already
    * aggregated to ≤#nations rows before the join — the join is trivially
    * small no matter the fact-table size.
    */
  def qFullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val sup = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  val qFullOuterJoinSql: String =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |  COALESCE(n_customers, 0) AS n_customers,
      |  COALESCE(n_suppliers, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      |      FROM supplier GROUP BY 1) s ON c.nationkey = s.nationkey""".stripMargin

  /** Non-equi range join: parts bucketed into size bands via BETWEEN against
    * an inline band table. Scale: the band table is tiny and broadcast, so
    * the non-equi condition runs as BroadcastNestedLoopJoin — each part row
    * tests 5 bands locally, no shuffle. This is the pattern for any
    * dimension-range lookup (rate tables, SLA tiers) at 100 TB.
    */
  def qRangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = broadcast(Seq(
      ("XS", 1, 10), ("S", 11, 20), ("M", 21, 30), ("L", 31, 40), ("XL", 41, 50)
    ).toDF("band", "lo", "hi"))
    Tables.part(s, dir)
      .join(bands, col("p_size").between(col("lo"), col("hi")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
        dsum(col("p_retailprice")).as("sum_price"),
        min(col("p_size")).as("min_size"), max(col("p_size")).as("max_size"))
  }

  val qRangeJoinSql: String =
    """SELECT band, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price,
      |  MIN(p_size) AS min_size, MAX(p_size) AS max_size
      |FROM part JOIN (VALUES ('XS',1,10),('S',11,20),('M',21,30),('L',31,40),('XL',41,50))
      |  AS bands(band, lo, hi) ON p_size BETWEEN lo AND hi
      |GROUP BY band""".stripMargin

  /** TPC-H Q10 shape: revenue lost to returned items per customer, top 20.
    * Scale: the returnflag filter lands on the lineitem scan; the
    * orders⋈lineitem shuffle join dominates; customer joins post-aggregate
    * via broadcast-sized key set; top-k is TakeOrderedAndProject.
    */
  def q10Returns(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
    val n = broadcast(Tables.nation(s, dir))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_mktsegment"))
      .agg(dProductSum(dec(col("l_extendedprice")) * (lit(1).cast(D) - dec(col("l_discount"))))
        .as("lost_revenue"))
      .orderBy(col("lost_revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, n_name, c_mktsegment,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(24,4)) AS DOUBLE) AS lost_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY c_custkey, c_name, n_name, c_mktsegment
      |ORDER BY lost_revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** The salted-join path through the correctness gate: lineitem⋈part on
    * the join key spread across 8 deterministic salt buckets, aggregated
    * per brand. The oracle is the PLAIN join — salting must be invisible
    * in the result. On this uniform testdata salting is pure overhead; the
    * point is gating the rewrite's correctness (hot-key corpora get the
    * same plan shape with the hot key's rows actually spread).
    */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val part = Tables.part(s, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    graft.ops.Skew.saltedJoin(li, part, "l_partkey", buckets = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
  }

  val qSkewJoinSql: String =
    """SELECT p_brand, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  /** Typed cogroup (KeyValueGroupedDataset.cogroup) — the last member of
    * the typed-Dataset surface (SURVEY §2.8 U1) not yet demonstrated:
    * both sides shuffle ONCE on the key, then a single function sees the
    * two per-key iterators together — the Spark-native shape for merge
    * logic a join+agg can't express (here it CAN, deliberately, so the
    * declarative outer-join oracle gates the typed path bit-for-bit).
    * Per-customer order history: count, exact decimal spend (BigDecimal
    * accumulation inside the function — order-independent), first/last
    * order timestamp; customers with no orders surface with NULL spend.
    * Scale: one hash shuffle per side, streaming iterators per key — no
    * per-key materialization beyond the order list of ONE customer.
    */
  def qCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").as[Long], col("c_name").as[String])
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as[Long], col("o_totalprice").as[Double],
        col("o_orderdate").as[java.sql.Timestamp])
    val merged = c.groupByKey(_._1).cogroup(o.groupByKey(_._1)) { (k, cs, os) =>
      val cl = cs.toList
      if (cl.isEmpty) Iterator.empty // orphan orders: none under TPC-H FK
      else {
        val ol = os.toList
        val n = ol.size.toLong
        val spend =
          if (n == 0) None
          else Some(ol.foldLeft(java.math.BigDecimal.ZERO) { (acc, r) =>
            // money values are 2dp; scale-4 decimal is value-preserving
            acc.add(java.math.BigDecimal.valueOf(r._2)
              .setScale(4, java.math.RoundingMode.HALF_UP))
          }.doubleValue)
        val times = ol.map(_._3.getTime)
        val first = if (n == 0) None else Some(new java.sql.Timestamp(times.min))
        val last = if (n == 0) None else Some(new java.sql.Timestamp(times.max))
        Iterator((k, cl.head._2, n, spend, first, last))
      }
    }.toDF("c_custkey", "c_name", "n_orders", "total_spent", "first_order", "last_order")
    merged.orderBy(col("total_spent").desc_nulls_last, col("c_custkey")).limit(25)
  }

  val qCogroupSql: String =
    """SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS total_spent,
      |  MIN(o.o_orderdate) AS first_order, MAX(o.o_orderdate) AS last_order
      |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_name
      |ORDER BY total_spent DESC NULLS LAST, c.c_custkey LIMIT 25""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_cogroup" -> ((qCogroup _, Some(qCogroupSql))),
    "q_skew_join" -> ((qSkewJoin _, Some(qSkewJoinSql))),
    "q3_join" -> ((q3Join _, Some(q3JoinSql))),
    "q10_returns" -> ((q10Returns _, Some(q10ReturnsSql))),
    "q5_multi_join" -> ((q5MultiJoin _, Some(q5MultiJoinSql))),
    "q_semi_join" -> ((qSemiJoin _, Some(qSemiJoinSql))),
    "q_anti_join" -> ((qAntiJoin _, Some(qAntiJoinSql))),
    "q_left_join_agg" -> ((qLeftJoinAgg _, Some(qLeftJoinAggSql))),
    "q_full_outer_join" -> ((qFullOuterJoin _, Some(qFullOuterJoinSql))),
    "q_range_join" -> ((qRangeJoin _, Some(qRangeJoinSql)))
  )
}
