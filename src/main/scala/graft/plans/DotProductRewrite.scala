package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.DotProduct

/** Optimizer rule: fuse the declarative dot-product fold into the codegen'd
  * [[graft.functions.DotProduct]] kernel.
  *
  * Users (and our own `ops/Ann`) write the composable form because it is
  * the idiomatic Spark spelling of a dot product:
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             CAST(0 AS DOUBLE), (acc, v) -> acc + v)
  *
  * and the norm special case over one array:
  *
  *   aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
  *
  * Higher-order-function lambdas are CodegenFallback — every element pays
  * interpreted eval and lambda-variable boxing, which is the whole scan
  * cost when the corpus × dim element ops ARE the workload (ANN scoring).
  * Both shapes fold sequentially over doubles, exactly like DotProduct's
  * fused loop, so the rewrite is bit-identical (FunctionsSpec asserts this
  * for the cosine composition) — including NULL semantics: a NULL array, a
  * NULL element, or a length mismatch (zip_with pads with NULL) all yield
  * NULL in both forms.
  *
  * The match is deliberately narrow: float arrays, double accumulation,
  * literal 0.0 zero, identity finish. The decimal-accumulated oracle
  * formulations (different zero type, cast-wrapped merge) do not match and
  * keep their exact plans.
  *
  * Wired two ways (same rule object):
  *  - deploy path: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    → `injectOptimizerRule` (see [[graft.functions.GraftExtensions]]);
  *  - live session: [[install]] appends to `spark.experimental.extraOptimizations`
  *    (idempotent), which the SparkOptimizer runs as a post-hoc batch.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  /** Idempotently activate on a live session (runtime analog of the
    * spark.sql.extensions injection). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DotProductRewrite

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _ => false
  }

  /** CAST(v AS DOUBLE) of exactly the given lambda variable. */
  private def isVarToDouble(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(x, DoubleType, _, _) => isVar(x, v)
    case _ => false
  }

  /** Literal positive zero ONLY — matching -0.0 would flip the sign bit of
    * an empty-array fold (the fold returns its zero verbatim; DotProduct
    * returns +0.0), breaking bit-identity. Scala's == cannot tell them
    * apart, so compare bit patterns.
    */
  private object DoubleZero {
    private def isPosZero(v: Any): Boolean = v match {
      case d: java.lang.Double => java.lang.Double.doubleToRawLongBits(d) == 0L
      case _ => false
    }
    def unapply(e: Expression): Boolean = e match {
      case Literal(z, DoubleType) => isPosZero(z)
      case Cast(Literal(_, _), DoubleType, _, _) => // pre-constant-folding shape
        e.foldable && isPosZero(e.eval())
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // aggregate(zip_with(a, b, (x, y) -> xD * yD), 0D, (acc, v) -> acc + v)
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(mx, my, _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        DoubleZero(),
        LambdaFunction(Add(aacc, av, _),
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(a) && isFloatArray(b) &&
          isVarToDouble(mx, x) && isVarToDouble(my, y) &&
          isVar(aacc, acc) && isVar(av, v) && isVar(fin, fv) =>
      DotProduct(a, b)

    // aggregate(a, 0D, (acc, x) -> acc + xD * xD)  — squared norm.
    // `a` is duplicated into DotProduct(a, a), so it must be deterministic:
    // a non-deterministic input (rand()-derived slice) evaluates ONCE in
    // the fold but would evaluate twice, independently, after the rewrite.

    case ArrayAggregate(
        a,
        DoubleZero(),
        LambdaFunction(Add(aacc, Multiply(mx, my, _), _),
          Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _),
        LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(a) && a.deterministic && isVar(aacc, acc) &&
          isVarToDouble(mx, x) && isVarToDouble(my, x) && isVar(fin, fv) =>
      DotProduct(a, a)
  }
}
