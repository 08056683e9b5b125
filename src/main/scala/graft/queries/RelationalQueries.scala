package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Exact.dProductSum

/** Relational operator surface (SURVEY.md §2.9) exposed as named queries.
  *
  * Oracle-stability rules (the driver hash-compares our parquet output with
  * DuckDB's result for the same SQL):
  *  - Linear aggregates (sum/avg of money-ish doubles) are computed over
  *    DECIMAL casts: decimal addition is exact and order-independent, so
  *    Spark and DuckDB agree bit-for-bit regardless of partitioning /
  *    parallelism — no "sum of doubles differs in the last ulp" flakes.
  *    The final cast back to DOUBLE is exact as long as the scaled integer
  *    value stays below 2^53 (true at the verify scale factors).
  *  - Nonlinear math (sqrt, cosine, …) is rounded to 6 decimals on BOTH
  *    sides; a disagreement would need an error within 1e-6 of a rounding
  *    boundary, which double arithmetic on this data cannot produce.
  *  - Every query is fully ordered only when order matters (top-k); the
  *    driver sorts rows before hashing, but ties in a LIMIT must be broken
  *    deterministically with a unique key.
  */
object RelationalQueries {

  // Max |value| 99,999,999.9999 — covers per-row money (~1e5 here) with 3
  // spare integer digits. Do NOT widen casually: DuckDB binds the 3-factor
  // sum_charge product at DECIMAL(18,12), leaving only 6 integer digits
  // (~9× headroom over the ~1.1e5 max per-row charge) — a wider-price
  // dataset needs a joint re-pick of precision/scale on BOTH engines.
  private val D = DecimalType(12, 4)

  /** sum over a decimal cast, emitted as an exact double. */
  private def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  // ---------------------------------------------------------------- q1_agg
  /** TPC-H Q1 shape: scan-filter-aggregate over lineitem.
    * Ref: the reference's generate→calculate→show chain (docs/index.rst) is a
    * per-item map; the relational form is a hash aggregate with map-side
    * partial aggregation (Spark plans partial_sum/final_sum automatically).
    * 100 TB posture: single scan, filter pushed to parquet, 4-ish groups →
    * partial agg reduces shuffle to #groups × #partitions rows.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dProductSum(col("l_extendedprice").cast(D) * (lit(1).cast(D) - col("l_discount").cast(D)))
          .as("sum_disc_price"),
        // Two constraints shape this expression (found at sf0.1):
        // (a) (6,4) factor casts, not D(12,4): with D factors the triple
        //     product needs precision 40 > Spark's 38 cap, forcing a
        //     scale-reducing round DuckDB doesn't mirror.
        // (b) final rescale at scale 6, the data's TRUE precision (2dp
        //     price × 2dp disc × 2dp tax): decimal rescale is HALF_UP in
        //     Spark but TRUNCATION in DuckDB, so any rescale that actually
        //     rounds diverges — rescale only where it is exact. The
        //     scale-6 scaled integer stays below 2^53 at the verify sfs,
        //     keeping the final double cast correctly rounded on both.
        sum(col("l_extendedprice").cast(D) *
            ((lit(1).cast(DecimalType(6, 4)) - col("l_discount").cast(DecimalType(6, 4))) *
             (lit(1).cast(DecimalType(6, 4)) + col("l_tax").cast(DecimalType(6, 4)))))
          .cast(DecimalType(24, 6)).cast("double").as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(24,4)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * ((CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))))) AS DECIMAL(24,6)) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** name -> (query fn, oracle sql). */
  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q1_agg" -> ((q1Agg _, Some(q1AggSql)))
  )
}
