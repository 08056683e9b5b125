package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd double-precision squared euclidean distance of two
  * float-array columns — the FILTER kernel of the filter-and-refine
  * nearest-centroid assignment (SimilarityQueries.semdedup).
  *
  * Relationship to [[DecimalSqDist]] (the oracle-exact REFINE kernel):
  * both evaluate the same per-element term (x−y)² in double; this kernel
  * accumulates the raw doubles while the decimal kernel rounds each term
  * to DECIMAL(28,14) (≤ 0.5e-14 per term) and sums exactly. For n terms
  * the two results therefore differ by at most
  * n·(0.5e-14 + ulp(S)) — about 2e-12 absolute plus 1.5e-14 relative for
  * n = 64 — so a candidate set of centroids within
  * `dmin + 1e-9·(1 + dmin)` of the double minimum provably contains every
  * centroid the exact-decimal argmin (with its (dist, cid) tie order)
  * could select, while typically holding a single candidate. NULL
  * semantics mirror DecimalSqDist exactly (NULL array / NULL element /
  * length mismatch → NULL), so the refine stage sees the same degenerate
  * rows either way.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  require(
    Seq(left, right).forall(e => !e.resolved || (e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })),
    "sqdist expects array<float> inputs")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
