package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product of two float-array columns — the fused kernel the
  * optimizer rule [[graft.plans.DotProductRewrite]] substitutes for the
  * declarative `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, +)` form,
  * which routes through CodegenFallback lambdas (per-element allocation,
  * interpreted eval).
  *
  * Semantics exactly mirror the HOF fold it replaces:
  *  - sequential left-to-right double accumulation (bit-identical result);
  *  - NULL if either array is NULL, if lengths differ (zip_with pads the
  *    shorter side with NULL, nulling the fold), or if any ELEMENT is NULL
  *    (NULL propagates through + in the fold);
  *  - empty arrays dot to 0.0 (the fold's zero).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  require(
    Seq(left, right).forall(e => !e.resolved || (e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })),
    "dot_product expects array<float> inputs")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
