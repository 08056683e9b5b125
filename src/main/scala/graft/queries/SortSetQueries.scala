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

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_topk" -> ((qTopK _, Some(qTopKSql))),
    "q_set_ops" -> ((qSetOps _, Some(qSetOpsSql))),
    "q_rollup" -> ((qRollup _, Some(qRollupSql))),
    "q_cube" -> ((qCube _, Some(qCubeSql))),
    "q_grouping_sets" -> ((qGroupingSets _, Some(qGroupingSetsSql)))
  )
}
