package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Exact._

/** Window-function surface (SURVEY.md §2.9 R9) over the `events` table.
  *
  * The reference has no event-time machinery at all (SURVEY §2.7 —
  * wall-clock batching only, bert/utils.py:192-194); these are the
  * north-star additions. All windows partition by user_id: at 100 TB the
  * sort for a window is per-partition after a hash shuffle on the partition
  * key — no global sort, and skew is bounded by the hottest single user.
  */
object WindowQueries {

  /** Ranking trio per user ordered by time: first 3 events of each user.
    * Deterministic: ts has microsecond resolution and event_id breaks any
    * remaining tie. Scale: shuffle on user_id, per-group sort, early filter
    * rn<=3 (Spark pushes a window-group-limit since 3.5 — only the top rows
    * per group survive the sort buffer).
    */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(Window.partitionBy(col("user_id")).orderBy(col("event_type"))))
      .filter(col("rn") <= 3)
      .select(col("user_id"), col("rn"), col("event_id"), col("event_type"), col("rnk"))
  }

  val qWindowRankSql: String =
    """SELECT user_id, rn, event_id, event_type, rnk FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
      |    RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk
      |  FROM events) t WHERE rn <= 3""".stripMargin

  /** Running sum + lag/lead per user ordered by time. The running sum is a
    * decimal cast so every prefix is exact on both engines. Restricted to
    * users 0-9 to keep the dump small; the plan shape is sf-independent.
    */
  def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 10)
      .withColumn("running_value", sum(dec(col("value"))).over(w).cast("double"))
      .withColumn("prev_event", lag(col("event_type"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("running_value"), col("prev_event"), col("next_value"))
  }

  val qWindowRunningSql: String =
    """SELECT user_id, event_id, event_type, value,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER w AS DOUBLE) AS running_value,
      |  LAG(event_type, 1) OVER w AS prev_event,
      |  LEAD(value, 1) OVER w AS next_value
      |FROM events WHERE user_id < 10
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** RANGE frame: per event, sum of the same user's values in the preceding
    * hour (inclusive). Event-time sliding aggregate as a batch window —
    * the streaming analogue is a sliding window with watermark (SURVEY
    * §2.7). Range frames need a numeric order key: epoch seconds.
    */
  def qWindowRange(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("user_id") < 10)
      .withColumn("epoch", unix_timestamp(col("ts")))
      .withColumn("hour_sum", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("epoch"), col("hour_sum"))
  }

  val qWindowRangeSql: String =
    """SELECT user_id, event_id, epoch,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER (
      |    PARTITION BY user_id ORDER BY epoch
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
      |FROM (SELECT user_id, event_id, value, CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch
      |      FROM events WHERE user_id < 10) t""".stripMargin

  /** Tumbling 1-hour event-time windows: the batch twin of the Structured
    * Streaming windowed aggregation (graft.streaming). Scale: window(ts) is
    * a projection then an ordinary hash aggregate — shuffle carries
    * #windows × #event_types rows after partial agg.
    */
  def qWindowTumbling(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  val qWindowTumblingSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** ntile + percent_rank + cume_dist: distribution windows over order value
    * per priority class. first_value/last_value with explicit frames.
    */
  def qWindowDistribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", r6(percent_rank().over(w)))
      .withColumn("cume", r6(cume_dist().over(w)))
      .withColumn("cheapest", first_value(col("o_orderkey")).over(w))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        col("quartile"), col("pct_rank"), col("cume"), col("cheapest"))
  }

  val qWindowDistributionSql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume,
      |  FIRST_VALUE(o_orderkey) OVER w AS cheapest
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin

  /** Navigation functions over the full per-user frame: first/last/nth
    * event plus lead/lag neighbors for each user's 3rd event. Deterministic
    * order (ts, event_id); last_value needs the explicit unbounded-following
    * frame — the default frame stops at CURRENT ROW, a classic silent-wrong
    * in both engines, pinned identically here and in the oracle.
    * Scale: same shape as every window — hash shuffle on user_id, one
    * per-group sort shared by all five functions over the same window.
    */
  def qWindowNavigation(s: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(ord))
      .withColumn("first_type", first(col("event_type")).over(full))
      .withColumn("last_type", last(col("event_type")).over(full))
      .withColumn("second_id", nth_value(col("event_id"), 2).over(full))
      .withColumn("prev_id", lag(col("event_id"), 1).over(ord))
      .withColumn("next_id", lead(col("event_id"), 1).over(ord))
      .filter(col("rn") === 3)
      .select(col("user_id"), col("event_id"), col("first_type"),
        col("last_type"), col("second_id"), col("prev_id"), col("next_id"))
  }

  val qWindowNavigationSql: String =
    """SELECT user_id, event_id, first_type, last_type, second_id, prev_id, next_id
      |FROM (
      |  SELECT user_id, event_id,
      |    ROW_NUMBER() OVER w AS rn,
      |    FIRST_VALUE(event_type) OVER wf AS first_type,
      |    LAST_VALUE(event_type) OVER wf AS last_type,
      |    NTH_VALUE(event_id, 2) OVER wf AS second_id,
      |    LAG(event_id, 1) OVER w AS prev_id,
      |    LEAD(event_id, 1) OVER w AS next_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
      |    wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |) t WHERE rn = 3""".stripMargin

  /** Time-weighted average value per user — the irregular-sampling mean
    * every metering/pricing pipeline needs (a plain AVG over-weights busy
    * intervals): each observation holds until the next one, so its weight
    * is the gap to the successor, TWA = Σ value·Δt / Σ Δt. Δt is exact
    * integer micros from a per-user lead(); the value·Δt products
    * accumulate as decimals (the momentSums sxy pattern), the duration sum
    * is a BIGINT, and the one division rounds once. The last observation
    * per user has no successor and carries zero weight — emitted as
    * n_weighted vs n_obs so the contract is visible. Scale: one per-user
    * window (hash shuffle on user_id) + one hash aggregate; no global
    * anything.
    */
  def qTwa(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("dt", unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_obs"),
        count(col("dt")).as("n_weighted"),
        sum(col("dt")).cast("bigint").as("total_us"),
        sum((dec(col("value")) * col("dt")).cast(DecimalType(28, 4)))
          .cast("double").as("vw_sum"))
      .select(col("user_id"), col("n_obs"), col("n_weighted"), col("total_us"),
        r6(col("vw_sum") / col("total_us")).as("twa_value"))
  }

  val qTwaSql: String =
    """WITH e AS (SELECT user_id, value,
      |    epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      - epoch_us(ts) AS dt
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_obs, COUNT(dt) AS n_weighted,
      |  CAST(SUM(dt) AS BIGINT) AS total_us,
      |  ROUND(CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * dt AS DECIMAL(28,4))) AS DOUBLE)
      |        / CAST(SUM(dt) AS BIGINT), 6) AS twa_value
      |FROM e GROUP BY user_id""".stripMargin

  /** Exponentially-decayed average of each user's most recent events —
    * the recency-weighted engagement score every feature store keeps,
    * spelled so NO float recursion exists: the half-life weights are
    * dyadic (2^(13-k) for the k-th most recent event, k ≤ 13), so the
    * weighted numerator is an EXACT decimal sum of value × integer and
    * the normalizer an exact BIGINT — the only IEEE operation is the
    * final division, rounded to 6 dp. A recursive s_t = αx + (1−α)s
    * formulation would accumulate engine-specific rounding at every
    * step; truncating the kernel at 14 taps (weight < 2⁻¹³ of the
    * newest) makes the fixed-point spelling exact instead. Scale: one
    * shuffle on user_id; the rank window sorts per user and the
    * window-group-limit keeps only 14 rows per user past the filter.
    */
  def qDecaySum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("k", row_number().over(w) - 1)
      .filter(col("k") <= 13)
      .withColumn("wt", expr("shiftleft(1L, 13 - k)"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_used"),
        sum(col("wt")).cast("bigint").as("norm"),
        sum((dec(col("value")) * col("wt")).cast(DecimalType(28, 4))).as("num"))
      .select(col("user_id"), col("n_used"), col("norm"),
        col("num").cast("double").as("decayed_sum"),
        r6(col("num").cast("double") / col("norm")).as("ewma"))
  }

  val qDecaySumSql: String =
    """WITH o AS (SELECT user_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) - 1 AS k
      |  FROM events),
      |t AS (SELECT user_id, value, 1::BIGINT << (13 - k) AS wt FROM o WHERE k <= 13)
      |SELECT user_id, COUNT(*) AS n_used, CAST(SUM(wt) AS BIGINT) AS norm,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * wt AS DECIMAL(28,4))) AS DOUBLE)
      |    AS decayed_sum,
      |  ROUND(CAST(SUM(CAST(CAST(value AS DECIMAL(12,4)) * wt AS DECIMAL(28,4))) AS DOUBLE)
      |        / CAST(SUM(wt) AS BIGINT), 6) AS ewma
      |FROM t GROUP BY user_id""".stripMargin

  def all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "q_decay_sum" -> ((qDecaySum _, Some(qDecaySumSql))),
    "q_twa" -> ((qTwa _, Some(qTwaSql))),
    "q_window_navigation" -> ((qWindowNavigation _, Some(qWindowNavigationSql))),
    "q_window_rank" -> ((qWindowRank _, Some(qWindowRankSql))),
    "q_window_running" -> ((qWindowRunning _, Some(qWindowRunningSql))),
    "q_window_range" -> ((qWindowRange _, Some(qWindowRangeSql))),
    "q_window_tumbling" -> ((qWindowTumbling _, Some(qWindowTumblingSql))),
    "q_window_distribution" -> ((qWindowDistribution _, Some(qWindowDistributionSql)))
  )
}
