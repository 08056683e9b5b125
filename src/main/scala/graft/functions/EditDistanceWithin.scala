package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, IntegerType, NullType, StringType}

/** Thresholded edit distance: distance if ≤ k, else -1 — drop-in semantics
  * for the built-in `levenshtein(a, b, k)`, ~10× cheaper per pair.
  *
  * WHY (measured, not guessed): blocked fuzzy matching evaluates edit
  * distance on every candidate pair, so the per-call constant IS the
  * workload (q_edit_distance: 8M pairs at sf0.1 — built-in levenshtein was
  * 8s of an 11s query). The built-in decodes UTF-8 code points per
  * character per DP cell; part names / document text are ASCII, where a
  * byte-wise two-row DP with an early row-minimum exit does the same work
  * in primitive byte compares. Non-ASCII inputs (and negative thresholds)
  * fall back to UTF8String.levenshteinDistance(other, k) — the built-in's
  * own kernel — so results are identical on every input.
  */
case class EditDistanceWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  // ExpectsInputTypes is off-limits outside org.apache.spark.sql (see
  // CosineSimilarity) — validate at construction so a wrong-typed argument
  // is an analysis-time error, not a mid-query ClassCastException.
  // NullType is admissible everywhere: a null input short-circuits the
  // null-safe eval to NULL before any cast runs. String inputs match by
  // CLASS, not object equality — Spark 4 collated strings are StringType
  // instances that != the default StringType object, and the byte-wise
  // kernel is collation-irrelevant.
  require(
    Seq(first, second).forall(e =>
      !e.resolved || e.dataType.isInstanceOf[StringType] || e.dataType == NullType) &&
      (!third.resolved || third.dataType == IntegerType || third.dataType == NullType),
    "edit_distance_within expects (string, string, int)")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "edit_distance_within"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    EditDistanceWithin.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = ${classOf[EditDistanceWithin].getName}.distance($a, $b, $c);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object EditDistanceWithin {

  /** Banded byte-wise Levenshtein; -1 when the distance exceeds k.
    * Public + statically-forwarded so generated code calls it directly.
    */
  def distance(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (k < 0 || !a.isFullAscii || !b.isFullAscii)
      return a.levenshteinDistance(b, k) // built-in kernel: identical semantics
    val x = a.getBytes; val y = b.getBytes
    val n = x.length; val m = y.length
    if (math.abs(n - m) > k) return -1
    if (n == 0) return m // |m - 0| <= k already checked
    if (m == 0) return n
    // the distance never exceeds max(n, m), so a larger threshold is
    // equivalent — and clamping keeps inf = kk + 1 from overflowing when
    // k = Int.MaxValue (where inf would wrap negative and clamp every DP
    // cell to a huge negative "infinity")
    val kk = math.min(k, math.max(n, m))
    val inf = kk + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= kk) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = if (i <= kk) i else inf
      var rowMin = cur(0)
      j = 1
      while (j <= m) {
        val cost = if (x(i - 1) == y(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > kk) return -1 // the band is exhausted — no path back under k
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= kk) prev(m) else -1
  }
}
