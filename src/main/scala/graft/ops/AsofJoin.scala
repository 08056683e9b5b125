package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic operator Spark has no native primitive for
  * (SURVEY §2.9 "theta/range": as-of → window + last over union).
  *
  * For each left row, attach the most recent right row with the same key
  * and right.time <= left.time. The naive formulation is a non-equi range
  * join (quadratic per key); this implementation is the scalable shape:
  * UNION the two sides, hash-shuffle once on the key, sort per key by
  * (time, side), and carry the latest right values forward with
  * last(ignoreNulls) over an unbounded-preceding frame. One shuffle, one
  * per-key sort, zero row multiplication — survives 100 TB and arbitrary
  * key skew (a hot key costs one sorted partition, not its square).
  */
object AsofJoin {

  /** left asof-join right.
    * @param leftTime/rightTime  event-time columns (same comparable type)
    * @param key                 equi-key column name present on both sides
    * @param rightCols           right columns to carry (renamed as given)
    * Right rows at exactly left.time match (<=, the standard convention).
    * Ties in right time resolve to the later-sorted row — pass a
    * deterministic tiebreak column as part of rightTime ordering upstream
    * if right times can collide.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carry = rightCols.toSeq // fixed field order for the carried struct
    // The carried right values travel as ONE struct so the match is
    // atomically a single right row: last(ignoreNulls) over the struct picks
    // the most recent right ROW, and a genuinely-NULL field of that row
    // stays NULL (per-column last() would back-fill it from an older row,
    // silently mixing rows — standard as-of semantics forbid that).
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map { case (from, to) => right.schema(from).copy(name = to) })
    // side 0 = right (sorts BEFORE a left row at the same timestamp so <= holds)
    val r = right.select(
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        struct(carry.map { case (from, to) => col(from).as(to) }: _*).as("__r")) ++
        leftCols.filterNot(c => c == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(carryType).as("__r")) ++
        leftCols.filterNot(c => c == key).map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(
        Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
          carry.map { case (_, to) => col("__c").getField(to).as(to) }: _*)
  }
}
