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

  /** Exact average: decimal sum / count, division done in double on both sides. */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(lit(1))

  /** Round nonlinear doubles to 6 dp — mirror with ROUND(x, 6) in DuckDB. */
  def r6(c: Column): Column = round(c, 6)
}
