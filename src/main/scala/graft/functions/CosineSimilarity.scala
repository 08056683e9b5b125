package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-array columns.
  *
  * WHY a custom Catalyst Expression (the one place built-ins genuinely
  * fall short, per the §7.3 decision table): the composable formulation —
  * `aggregate(zip_with(a, b, …))` — routes through higher-order-function
  * lambdas, which are CodegenFallback: every element allocates lambda
  * variables and evaluates interpreted. For ANN scans the dot product IS
  * the workload (corpus × dim element ops), so the kernel belongs in
  * whole-stage codegen: one fused loop, primitive float math, no
  * allocation. Interpreted `nullSafeEval` mirrors the generated code for
  * non-codegen paths.
  *
  * Identical arithmetic order to the HOF formulation (sequential fold,
  * double accumulators), so swapping it in changes nothing numerically —
  * FunctionsSpec asserts bit-equality against the HOF version.
  *
  * Registered as SQL function `cosine_similarity` via [[GraftExtensions]]
  * (SparkSessionExtensions) or [[GraftFunctions.register]] on a live
  * session.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); validate at construction instead.
  require(
    Seq(left, right).forall(e => !e.resolved || e.dataType == ArrayType(FloatType) ||
      e.dataType == ArrayType(FloatType, containsNull = false)),
    s"cosine_similarity expects array<float> inputs")

  override def dataType: DataType = DoubleType

  // Nullable regardless of input nullability: a dimension mismatch yields
  // NULL (silently truncating to min length would return a plausible score
  // for what is always an upstream bug, e.g. mixed embedding versions).
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    if (x.length != y.length) return null
    val n = x.length
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x(i).toDouble; val yv = y(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |if ($x.length != $y.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $x.length;
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double xv = (double) $x[$i]; double yv = (double) $y[$i];
         |    $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val info = new ExpressionInfo(
    classOf[CosineSimilarity].getName, null, "cosine_similarity",
    "_FUNC_(a, b) - cosine similarity of two float arrays (codegen'd fused loop).",
    "")

  private val dotInfo = new ExpressionInfo(
    classOf[DotProduct].getName, null, "dot_product",
    "_FUNC_(a, b) - dot product of two float arrays (codegen'd fused loop).",
    "")

  private val decDotInfo = new ExpressionInfo(
    classOf[DecimalDot].getName, null, "decimal_dot",
    "_FUNC_(a, b) - DECIMAL(28,14)-exact dot product of two float arrays " +
      "(fused form of the oracle-arithmetic HOF fold; bit-identical).",
    "")

  private val decSqInfo = new ExpressionInfo(
    classOf[DecimalSqDist].getName, null, "decimal_sqdist",
    "_FUNC_(a, b) - DECIMAL(28,14)-exact squared euclidean distance of two " +
      "float arrays (fused form of the oracle-arithmetic HOF fold; bit-identical).",
    "")

  private def build(children: Seq[Expression]): Expression = {
    require(children.size == 2, "cosine_similarity takes exactly 2 arguments")
    CosineSimilarity(children(0), children(1))
  }

  private def buildDot(children: Seq[Expression]): Expression = {
    require(children.size == 2, "dot_product takes exactly 2 arguments")
    DotProduct(children(0), children(1))
  }

  private def buildDecDot(children: Seq[Expression]): Expression = {
    require(children.size == 2, "decimal_dot takes exactly 2 arguments")
    DecimalDot(children(0), children(1))
  }

  private def buildDecSq(children: Seq[Expression]): Expression = {
    require(children.size == 2, "decimal_sqdist takes exactly 2 arguments")
    DecimalSqDist(children(0), children(1))
  }

  /** Idempotent runtime registration on a live session: the SQL functions
    * plus the HOF→kernel optimizer rewrite. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cosine_similarity"), info, build _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hamming_distance"), HammingDistance.info, HammingDistance.build _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("dot_product"), dotInfo, buildDot _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("decimal_dot"), decDotInfo, buildDecDot _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("decimal_sqdist"), decSqInfo, buildDecSq _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("edit_distance_within"), edwInfo, buildEdw _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("damerau_levenshtein"), dlInfo, buildDl _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"), jwInfo, buildJw _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("srp_fingerprint"), SrpFingerprint.info, SrpFingerprint.build _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_filter_agg"), bloomAggInfo, buildBloomAgg _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("might_contain"), mightContainInfo, buildMightContain _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("sqdist"), sqDistInfo, buildSqDist _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("morton_index"), mortonInfo, buildMorton _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("hilbert_index"), hilbertInfo, buildHilbert _)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("unicode_normalize"), UnicodeNormalize.info,
      UnicodeNormalize.build _)
    graft.plans.DotProductRewrite.install(spark)
  }

  private val sqDistInfo = new ExpressionInfo(
    classOf[SqDist].getName, null, "sqdist",
    "_FUNC_(a, b) - double-precision squared euclidean distance of two " +
      "float arrays (the filter kernel of filter-and-refine assignment).", "")

  private def buildSqDist(children: Seq[Expression]): Expression = {
    require(children.size == 2, "sqdist takes exactly 2 arguments")
    SqDist(children(0), children(1))
  }

  private val mortonInfo = new ExpressionInfo(
    classOf[MortonIndex].getName, null, "morton_index",
    "_FUNC_(x, y) - order-10 Morton (Z) interleave of two bigint grid " +
      "coordinates (compact JIT-friendly kernel).", "")

  private def buildMorton(children: Seq[Expression]): Expression = {
    require(children.size == 2, "morton_index takes exactly 2 arguments")
    MortonIndex(children(0), children(1))
  }

  private val hilbertInfo = new ExpressionInfo(
    classOf[HilbertIndex].getName, null, "hilbert_index",
    "_FUNC_(x, y) - order-10 Hilbert curve index of two bigint grid " +
      "coordinates (compact JIT-friendly kernel).", "")

  private def buildHilbert(children: Seq[Expression]): Expression = {
    require(children.size == 2, "hilbert_index takes exactly 2 arguments")
    HilbertIndex(children(0), children(1))
  }

  // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
  // runtime-filter rewrite but does not register them as SQL functions;
  // exposing them here (same names Databricks uses) gives queries the
  // broadcast-compact-membership primitive without a driver-side
  // DataFrameStatFunctions round trip or an interpreted UDF.
  private val bloomAggInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
    null, "bloom_filter_agg",
    "_FUNC_(xxhash64(col), items, bits) - build a bloom filter over a LONG hash column.",
    "")

  private def buildBloomAgg(children: Seq[Expression]): Expression = {
    require(children.size == 3,
      "bloom_filter_agg takes exactly 3 arguments (hash col, est items, num bits)")
    new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
      children(0), children(1), children(2))
  }

  private val mightContainInfo = new ExpressionInfo(
    classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
    null, "might_contain",
    "_FUNC_(bloom, xxhash64(col)) - probabilistic membership (no false negatives).",
    "")

  private def buildMightContain(children: Seq[Expression]): Expression = {
    require(children.size == 2, "might_contain takes exactly 2 arguments")
    org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      children(0), children(1))
  }

  private val jwInfo = new ExpressionInfo(
    classOf[JaroWinkler].getName, null, "jaro_winkler",
    "_FUNC_(a, b) - Jaro-Winkler similarity (standard params: window " +
      "max/2-1, prefix<=4, scale 0.1, boost>0.7; matches DuckDB).",
    "")

  private def buildJw(children: Seq[Expression]): Expression = {
    require(children.size == 2, "jaro_winkler takes exactly 2 arguments")
    JaroWinkler(children(0), children(1))
  }

  private val dlInfo = new ExpressionInfo(
    classOf[DamerauLevenshtein].getName, null, "damerau_levenshtein",
    "_FUNC_(a, b) - full Damerau-Levenshtein distance (adjacent transposition " +
      "= 1 edit, alphabet table; matches DuckDB's damerau_levenshtein).",
    "")

  private def buildDl(children: Seq[Expression]): Expression = {
    require(children.size == 2, "damerau_levenshtein takes exactly 2 arguments")
    DamerauLevenshtein(children(0), children(1))
  }

  private val edwInfo = new ExpressionInfo(
    classOf[EditDistanceWithin].getName, null, "edit_distance_within",
    "_FUNC_(a, b, k) - edit distance if <= k else -1 (byte-banded DP, early exit).",
    "")

  private def buildEdw(children: Seq[Expression]): Expression = {
    require(children.size == 3, "edit_distance_within takes exactly 3 arguments")
    EditDistanceWithin(children(0), children(1), children(2))
  }
}

/** spark.sql.extensions entry point: ships the function with the session
  * from first plan, the deployment-grade path
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("hamming_distance"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming_distance"),
      (children: Seq[Expression]) => HammingDistance(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("decimal_dot"),
      new ExpressionInfo(classOf[DecimalDot].getName, "decimal_dot"),
      (children: Seq[Expression]) => DecimalDot(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("decimal_sqdist"),
      new ExpressionInfo(classOf[DecimalSqDist].getName, "decimal_sqdist"),
      (children: Seq[Expression]) => DecimalSqDist(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("edit_distance_within"),
      new ExpressionInfo(classOf[EditDistanceWithin].getName, "edit_distance_within"),
      (children: Seq[Expression]) => EditDistanceWithin(children(0), children(1), children(2))))
    ext.injectFunction((FunctionIdentifier("srp_fingerprint"),
      new ExpressionInfo(classOf[SrpFingerprint].getName, "srp_fingerprint"),
      (children: Seq[Expression]) => SrpFingerprint(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "sqdist"),
      (children: Seq[Expression]) => SqDist(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("morton_index"),
      new ExpressionInfo(classOf[MortonIndex].getName, "morton_index"),
      (children: Seq[Expression]) => MortonIndex(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (children: Seq[Expression]) => HilbertIndex(children(0), children(1))))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (children: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children(0), children(1), children(2))))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
