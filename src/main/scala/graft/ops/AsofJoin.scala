package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic operator Spark has no native primitive for
  * (SURVEY §2.9 "theta/range": as-of → window + last over union).
  *
  * For each left row, attach the nearest right row with the same key:
  * backward (default) = most recent right with right.time <= left.time;
  * forward = next right with right.time >= left.time. The naive
  * formulation is a non-equi range join (quadratic per key); this
  * implementation is the scalable shape: UNION the two sides, hash-shuffle
  * once on the key, sort per key by (time, side), and carry the nearest
  * right values with last(ignoreNulls) over an unbounded-preceding frame
  * (time descending for forward). One shuffle, one per-key sort, zero row
  * multiplication — survives 100 TB and arbitrary key skew (a hot key
  * costs one sorted partition, not its square).
  */
object AsofJoin {

  /** left asof-join right.
    * @param leftTime/rightTime  event-time columns (same comparable type)
    * @param key                 equi-key column name present on both sides
    * @param rightCols           right columns to carry (renamed as given)
    * @param direction           "backward" (right.time <= left.time, the
    *                            default) or "forward" (right.time >= left.time)
    * @param tolerance           optional predicate (leftTime, matchedRightTime)
    *                            => boolean Column; a match failing it is
    *                            nulled out (standard as-of tolerance — e.g.
    *                            `(l, r) => unix_micros(l) - unix_micros(r)
    *                            <= lit(600000000L)` for "within 10 min")
    * Right rows at exactly left.time match in both directions (<= / >=, the
    * standard convention). Ties in right time resolve to the later-sorted
    * row — pre-aggregate the right side to unique (key, time) rows if right
    * times can collide and determinism matters.
    * NULL times never match (the DuckDB/pandas as-of convention): a
    * null-time right row is dropped, a null-time left row comes back
    * unmatched. Without the explicit guards, nulls-first/last sort order
    * would silently treat a null time as "earliest"/"latest" and hand
    * null-time rows a bogus nearest match.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String],
      direction: String = "backward",
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"direction must be backward|forward, got '$direction'")
    require(!rightCols.values.exists(_ == "__rt"), "carried name '__rt' is reserved")
    val leftCols = left.columns.toSeq
    val carry = rightCols.toSeq // fixed field order for the carried struct
    // The carried right values travel as ONE struct so the match is
    // atomically a single right row: last(ignoreNulls) over the struct picks
    // the nearest right ROW, and a genuinely-NULL field of that row stays
    // NULL (per-column last() would back-fill it from an older row, silently
    // mixing rows — standard as-of semantics forbid that). The matched right
    // TIME rides along as __rt so a tolerance can disqualify stale matches.
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map { case (from, to) => right.schema(from).copy(name = to) } :+
        right.schema(rightTime).copy(name = "__rt"))
    // side 0 = right (sorts BEFORE a left row at the same timestamp in both
    // directions, so the boundary-equal right row is eligible)
    val r = right.filter(col(rightTime).isNotNull).select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        struct(carry.map { case (from, to) => col(from).as(to) } :+
          col(rightTime).as("__rt"): _*).as("__r")) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(carryType).as("__r")) ++
        leftCols.filterNot(c => c == key).map(col): _*)
    val ord = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(col(key)).orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    // a NULL tolerance verdict (no match at all) falls through to NULL;
    // a NULL left time matches nothing regardless of direction (in forward
    // mode desc-nulls-last sorting would otherwise hand it the earliest
    // right row)
    val matched0 = tolerance match {
      case Some(ok) =>
        when(ok(col("__t"), col("__c").getField("__rt")), col("__c"))
          .otherwise(lit(null).cast(carryType))
      case None => col("__c")
    }
    val matched = when(col("__t").isNull, lit(null).cast(carryType))
      .otherwise(matched0)
    carried.filter(col("__side") === 1)
      .withColumn("__m", matched)
      .select(
        Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
          carry.map { case (_, to) => col("__m").getField(to).as(to) }: _*)
  }
}
