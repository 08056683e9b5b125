package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-stability arithmetic shared by all query modules.
  *
  * The driver hash-compares our parquet output with DuckDB's result for the
  * same SQL, demanding bit-exact values. Strategy:
  *  - Linear aggregates (sum/avg of money-ish doubles) run over DECIMAL
  *    casts: decimal addition is exact and order-independent, so Spark and
  *    DuckDB agree regardless of partitioning/parallelism. The final cast
  *    back to DOUBLE is exact while the scaled integer stays below 2^53
  *    (true at all verify scale factors; Spark widens sum(DECIMAL(12,4))
  *    to DECIMAL(22,4), safe far past sf100).
  *  - Nonlinear math (sqrt, cosine, log) is computed on identical double
  *    operands on both sides, then rounded to 6 decimals; a disagreement
  *    would need an error within 1e-6 of a rounding boundary.
  *  - DuckDB 1.0 binds decimal multiplication by summing scales, so keep
  *    per-factor scale <= 4 when three factors multiply (see sum_charge in
  *    q1_agg: DECIMAL(12,4)^3 -> scale 12, 18-digit cap leaves 6 integer
  *    digits — enough for per-row values < ~1e6 but mind it for new queries).
  */
object Exact {
  /** Money values: max |v| < 1e8 at scale 4 (DECIMAL(12,4) max 99,999,999.9999). */
  val D: DecimalType = DecimalType(12, 4)

  def dec(c: Column): Column = c.cast(D)

  /** Exact, order-independent sum emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Product-sum (revenue-style Σ price×(1−disc)) emitted as double.
    * The sum is rescaled to DECIMAL(24,4) BEFORE the double cast, for two
    * engine asymmetries found at sf0.1:
    *  - once the scaled integer outgrows 2^53, DuckDB's wide-decimal→double
    *    conversion (via hugeint) stops being correctly rounded and drifts a
    *    1-ulp from Spark; at scale 4 the scaled value stays below 2^53 at
    *    the verify sfs so both casts are exact-then-correctly-rounded.
    *  - decimal RESCALING itself is HALF_UP in Spark but TRUNCATION in
    *    DuckDB, so the rescale must be value-preserving: safe here because
    *    2dp×2dp data makes products exact at scale 4. A 3-factor product
    *    (6 real decimals) must rescale at ≥6 instead — see q1_agg's
    *    sum_charge.
    * Mirror with CAST(CAST(SUM(...) AS DECIMAL(24,4)) AS DOUBLE) in SQL.
    */
  def dProductSum(c: Column): Column =
    sum(c).cast(DecimalType(24, 4)).cast("double")

  /** Round nonlinear doubles to 6 dp — mirror with ROUND(x, 6) in DuckDB. */
  def r6(c: Column): Column = round(c, 6)

  /** Σx² for money-scale values, rescaled to scale 4 BEFORE the double
    * cast. The per-product scale is 8 (4dp × 4dp) but 2-dp source data
    * makes every product exact at scale 4, so the rescale is
    * value-preserving — and at scale 8 the summed scaled integer crosses
    * 2^53 around sf0.1, where DuckDB's wide-decimal→double cast stops
    * being correctly rounded (see dProductSum). ONE definition for every
    * moment-sum site (z-score, correlation).
    * Mirror with CAST(CAST(SUM(CAST(CAST(x AS DECIMAL(12,4)) *
    * CAST(x AS DECIMAL(12,4)) AS DECIMAL(28,8))) AS DECIMAL(24,4)) AS
    * DOUBLE).
    */
  def dSumSq(c: Column): Column =
    sum((dec(c) * dec(c)).cast(DecimalType(28, 8)))
      .cast(DecimalType(24, 4)).cast("double")

  /** Decimal-accumulated mean at scale 14 (full-mantissa floats, not the
    * money scale): order-independent across partitions AND engines — the
    * per-dimension centroid-mean algebra shared by qCentroids and
    * ops.Ann.centroids(exactArith). SQL mirror:
    * CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*).
    */
  def dMean14(c: Column): Column =
    sum(c.cast("double").cast(DecimalType(28, 14))).cast("double") / count(lit(1))

  /** The six bivariate moment aggregates over (x = money-scale double
    * column, y = integral column): n, sx, sy, sxy, sxx, syy. Decimal
    * accumulation where an operand is fractional (order-independent),
    * exact long sums where integral, all emitted as double — ONE
    * definition for every covariance/correlation/regression site, so a
    * precision fix cannot silently desynchronize one from its oracle.
    * SQL mirror (the m CTE shared by q_correlation/q_regression):
    * COUNT(*), CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE),
    * CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE),
    * CAST(SUM(CAST(CAST(x AS DECIMAL(12,4)) * y AS DECIMAL(28,4))) AS DOUBLE),
    * dSumSq's documented mirror, CAST(CAST(SUM(y*y) AS BIGINT) AS DOUBLE).
    */
  def momentSums(x: Column, y: Column): Seq[Column] = Seq(
    count(lit(1)).as("n"),
    sum(dec(x)).cast("double").as("sx"),
    sum(y).cast("double").as("sy"),
    sum((dec(x) * y).cast(DecimalType(28, 4))).cast("double").as("sxy"),
    dSumSq(x).as("sxx"),
    sum(y * y).cast("double").as("syy"))

  /** Word n-grams over a tokenized array column (space-joined windows of n
    * adjacent tokens) — ONE definition for every shingling/bigram/
    * contamination/repetition site, so a tokenization change cannot
    * silently desynchronize one Spark query from its DuckDB oracle.
    * Requires size(tkCol) >= n (filter first).
    */
  def ngrams(tkCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$tkCol[i+$j]").mkString(", ")
    expr(s"transform(sequence(0, size($tkCol)-$n), i -> concat_ws(' ', $parts))")
  }

  /** Uniform integer in [0, 16^n) from hex nibbles [start, start+n) of
    * md5(inner) — the deterministic-hash randomness primitive shared by
    * the sampling/sketch queries (no RNG: reruns and both engines agree
    * bit-for-bit). `md5IntExpr` is the Spark SQL spelling, `md5IntSql`
    * the DuckDB mirror (instr/substring vs strpos/substr; identical
    * arithmetic). Keep n <= 15 nibbles so the value stays in a BIGINT.
    */
  def md5IntExpr(inner: String, start: Int, n: Int): String =
    // BIGINT seed: Spark types the nibble arithmetic INT and would
    // overflow (ANSI error) past 7 nibbles without it; the value is
    // unchanged (0*16+x = x), so existing oracles are unaffected
    (start until start + n)
      .map(k => s"(instr('0123456789abcdef', substring(md5($inner), $k, 1)) - 1)")
      .foldLeft("CAST(0 AS BIGINT)")((acc, nx) => s"($acc * 16 + $nx)")

  def md5IntSql(inner: String, start: Int, n: Int): String =
    (start until start + n)
      .map(k => s"(strpos('0123456789abcdef', substr(md5($inner), $k, 1)) - 1)")
      .foldLeft("CAST(0 AS BIGINT)")((acc, nx) => s"($acc * 16 + $nx)")
}
