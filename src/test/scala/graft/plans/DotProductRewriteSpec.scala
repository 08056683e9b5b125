package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions

/** The HOF→DotProduct optimizer rewrite: fires on the canonical dot-product
  * and squared-norm folds, leaves the decimal oracle formulations alone,
  * and is value-preserving on every edge (nulls, null elements, length
  * mismatch, empty arrays).
  */
class DotProductRewriteSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
  private val hofNorm =
    "aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"

  private def optimized(sql: String): String = {
    // a parquet-backed (non-foldable) input: over a literal LocalRelation
    // ConstantFolding evaluates the whole projection away before any plan
    // inspection could see the rewrite
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir)
    emb.select(col("embedding").as("a"), col("embedding").as("b"))
      .selectExpr(s"$sql AS r").queryExecution.optimizedPlan.toString
  }

  test("dot-product fold is rewritten to the codegen'd kernel") {
    assert(optimized(hofDot).contains("dot_product"))
  }

  test("squared-norm fold is rewritten to dot_product(a, a)") {
    assert(optimized(hofNorm).contains("dot_product"))
  }

  test("decimal-accumulated oracle formulation is NOT rewritten") {
    val decimalForm =
      """aggregate(zip_with(a, b, (x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,14))),
        |  CAST(0 AS DECIMAL(28,14)), (acc, v) -> CAST(acc + v AS DECIMAL(28,14)))""".stripMargin
    assert(!optimized(decimalForm).contains("dot_product"))
  }

  test("negative-zero literal and non-deterministic input are NOT rewritten") {
    // -0.0 zero: an empty-array fold returns its zero verbatim (-0.0);
    // DotProduct would return +0.0 — a bit-level change, so no rewrite
    val negZero =
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), -0.0D, (acc, v) -> acc + v)"
    assert(!optimized(negZero).contains("dot_product"))
    // non-deterministic squared-norm input would be evaluated twice by
    // DotProduct(a, a) — the fold evaluates it once, so no rewrite
    val nondet =
      """aggregate(CAST(slice(a, 1, CAST(rand() * 2 + 1 AS INT)) AS ARRAY<FLOAT>),
        | CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))""".stripMargin
    assert(!optimized(nondet).contains("dot_product"))
  }

  test("rewrite is value-preserving incl. nulls, mismatched lengths, empties") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f))), // length mismatch
      (None, Some(Array(1.0f))),                                // null array
      (Some(Array.empty[Float]), Some(Array.empty[Float]))      // empty
    ).toDF("a", "b")
    val rows = df.selectExpr(s"$hofDot AS hof", "dot_product(a, b) AS native").collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), s"value drift: $r")
    }
    assert(rows(0).getDouble(1) == (4.0 + 2.0 * 5.0 + 3.0 * 6.0))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(1))
    assert(rows(3).getDouble(1) == 0.0)
  }

  test("null ELEMENT nulls the product, matching the fold's semantics") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      s"""SELECT $hofDot AS hof, dot_product(a, b) AS native
         |FROM (SELECT CAST(array(1.0F, NULL) AS ARRAY<FLOAT>) AS a,
         |             CAST(array(3.0F, 4.0F) AS ARRAY<FLOAT>) AS b)""".stripMargin)
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("real embeddings: rewritten plan matches the unrewritten values") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).limit(20)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
    // the rewritten HOF (rule active) vs the explicitly-native expression:
    // same kernel, but this asserts end-to-end wiring on real data
    val diff = pairs
      .withColumn("hof", expr(hofDot))
      .withColumn("native", expr("dot_product(a, b)"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diff == 0)
  }
}
