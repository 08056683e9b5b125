package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted equi-join.
  *
  * When one join key carries a disproportionate share of rows (the hot
  * user, the null-ish default key), the shuffle partition owning it becomes
  * the stage's critical path. AQE's skew-join split handles sort-merge
  * cases; salting is the explicit, always-available fix and the only one
  * that also spreads the downstream aggregation.
  *
  * Left rows get a DETERMINISTIC salt from a high-entropy hash of the whole
  * row (not rand() — reruns and retries must route rows identically or a
  * task retry double-counts); the right side is replicated `buckets` times.
  * Shuffle volume: left unchanged, right × buckets — use for big-left /
  * small-right skew, which is the common shape (facts joining dims with a
  * hot key). Result equality with the unsalted join is asserted in
  * SkewSpec.
  */
object Skew {

  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      buckets: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // Replicating the right side `buckets`× is only sound when unmatched
    // RIGHT rows are never emitted — a right/full outer join would emit
    // every unmatched right row once per replica.
    val safe = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(safe.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin replicates the right side; joinType '$joinType' would " +
        "duplicate unmatched right rows (use inner/left/semi/anti/cross)")
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(buckets)))
    val rightSalted = right
      .withColumn("__salt", explode(sequence(lit(0L), lit((buckets - 1).toLong))))
    leftSalted.join(rightSalted, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
