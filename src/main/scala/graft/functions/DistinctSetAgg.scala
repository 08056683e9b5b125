package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF demo — the §2.8 surface the library had not yet exercised:
  * an `Aggregator[IN, BUF, OUT]` carrying an exact distinct set as the
  * aggregation STATE (the reference's ETLState-as-a-value shape,
  * SURVEY §7.3). Merge is set union, so the result is order- and
  * partition-independent by construction; the finish step sorts, making
  * the output deterministic and oracle-comparable.
  *
  * Scale note: a set-valued aggregate is only sane when per-group
  * cardinality is bounded (here: distinct users per event type). For
  * unbounded groups use approx_count_distinct or an anti-join state table
  * (ops.DedupState) — this demo exists for API completeness, and
  * FunctionsSpec pins its parity with the built-in spelling
  * `sort_array(collect_set(x))`, which stays the recommended form.
  */
object DistinctSetAgg extends Aggregator[java.lang.Long, Set[Long], Array[Long]] {
  override def zero: Set[Long] = Set.empty
  // boxed input so NULLs are representable and SKIPPED — matching
  // collect_set's null semantics; a primitive Long input would silently
  // unbox a NULL row into a spurious 0L member
  override def reduce(b: Set[Long], a: java.lang.Long): Set[Long] =
    if (a == null) b else b + a.longValue
  override def merge(b1: Set[Long], b2: Set[Long]): Set[Long] = b1 union b2
  override def finish(b: Set[Long]): Array[Long] = b.toArray.sorted
  override def bufferEncoder: Encoder[Set[Long]] = Encoders.kryo[Set[Long]]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Column form for untyped DataFrames: `distinctSet(col("user_id"))`. */
  def distinctSet(c: Column): Column = udaf(DistinctSetAgg, Encoders.LONG).apply(c)
}
