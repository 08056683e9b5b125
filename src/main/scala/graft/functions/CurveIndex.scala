package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Space-filling-curve index kernels (q_zorder / q_hilbert layout queries).
  *
  * Both curves were first spelled as pure column arithmetic — Morton as a
  * 20-term shift/mask sum, Hilbert as the order-10 rotate-and-accumulate
  * recurrence unrolled into 10 per-step projections. That spelling is
  * correct and codegen-friendly in the narrow sense (every operator stays
  * inside WholeStageCodegen), but the 100× rehearsal exposed its failure
  * mode: the unrolled steps inline into ONE generated `processNext` method,
  * and once a query needs BOTH curves in the same stage the method crosses
  * HotSpot's `-XX:DontCompileHugeMethods` threshold (8 000 bytecode), the
  * JIT silently refuses to compile it, and the whole stage runs as
  * INTERPRETED bytecode — 73 s instead of 6 s for the identical plan shape
  * (re-running with `-XX:-DontCompileHugeMethods` recovered the fast path,
  * which is the proof, but a library cannot demand JVM flags). The fix is
  * the same one Spark applies to its own heavyweight kernels: a compact
  * Catalyst expression whose generated code is a single call into a small
  * static loop — ~20 bytecodes in the stage method, and the kernel itself
  * JIT-compiles independently. HilbertSpec pins the kernel against an
  * independent textbook xy2d and the curve properties (injectivity,
  * unit-step adjacency); the DuckDB oracles replay the recurrence
  * step-for-step in SQL, so cross-engine bit-identity is still proven on
  * every gate run.
  */
case class MortonIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"morton_index expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "morton_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    MortonIndex.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.MortonIndex.interleave($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MortonIndex {
  /** Order-10 Morton (Z) interleave: bit i of x → bit 2i, bit i of y →
    * bit 2i+1. Reads exactly bits 0..9 of each input — bit-identical to
    * the former 20-term column sum on any input.
    */
  def interleave(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 10) {
      z += (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
      i += 1
    }
    z
  }
}

case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (bigint, bigint), got ($l, $r)")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndex.xy2d($x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {
  /** Order-10 Hilbert xy2d (n = 1024), the exact loop form of the former
    * unrolled recurrence: per step (s = 512 down to 1), accumulate
    * s²·((3·rx) XOR ry), then on ry = 0 swap the axes with the FULL-GRID
    * complement flip (1023−v) on rx = 1 — the variant the SQL oracles
    * replay and HilbertSpec proves equal to the textbook sub-quadrant
    * form on every bit later steps examine.
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 512L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        val nx = if (rx == 1) 1023L - y else y
        val ny = if (rx == 1) 1023L - x else x
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }
}
