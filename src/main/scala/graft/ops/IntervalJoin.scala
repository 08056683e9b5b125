package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large×large interval-containment join — the range-join shape Spark has
  * no native strategy for (SURVEY §2.9 theta/range: a point-in-interval
  * join on big inputs plans BroadcastNestedLoopJoin or a cartesian, both
  * quadratic).
  *
  * The scalable composition: quantize time into fixed-width buckets,
  * explode each interval into every bucket it covers, equi-join on the
  * probe row's (single) bucket, then apply the exact containment filter.
  * Catalyst sees a plain equi-join, so it shuffles both sides once on the
  * bucket key (or broadcasts a small side) — never all-pairs. Because a
  * probe row has exactly ONE bucket, a qualifying (probe, interval) pair
  * meets in exactly one bucket and no post-join dedup is needed.
  *
  * Cost model: interval replication = ⌈len/width⌉+1 rows per interval;
  * probe is unreplicated. Pick width ≈ the median interval length — wider
  * buckets cut replication but admit more false candidates for the exact
  * filter; the product (replication × candidate ratio) is minimized near
  * the interval scale. Skew bound = hottest bucket (burst hours) — at
  * production scale a two-level bucket (width, salt) splits hot buckets
  * the same way Skew.saltedJoin does.
  */
object IntervalJoin {

  /** Rows of `probe` joined to every row of `intervals` whose
    * [startCol, endCol] (inclusive both ends) contains probeTs. All three
    * columns must be integral (epoch seconds/micros); `bucketWidth` is in
    * the same unit. Column names must not collide across the two frames
    * (same contract as DataFrame.join).
    */
  def containment(
      probe: DataFrame,
      probeTs: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // a caller-supplied __bucket column would be silently overwritten,
    // joined on, and then dropped from the result (the operator's own
    // output never carries one — it is dropped below)
    require(!(probe.columns ++ intervals.columns).contains("__bucket"),
      "column name '__bucket' is reserved by IntervalJoin.containment")
    // integer DIV, not double division: epoch micros overflow the 2^53
    // double-exact range within a few decades, and floor(a/b) on doubles
    // would silently mis-bucket there
    val pb = probe.withColumn("__bucket", expr(s"$probeTs DIV $bucketWidth"))
    val iv = intervals.withColumn("__bucket",
      explode(expr(s"sequence($startCol DIV $bucketWidth, $endCol DIV $bucketWidth)")))
    pb.join(iv, Seq("__bucket"))
      .filter(col(probeTs) >= col(startCol) && col(probeTs) <= col(endCol))
      .drop("__bucket")
  }
}
