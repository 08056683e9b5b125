package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** IVF ANN vs the exact brute-force scan: structural invariants + recall.
  * The testdata labels are random cluster ids (embeddings are not actually
  * clustered around them — max pairwise cosine ≈ 0.5), so recall@5 with
  * nprobe=2/10 cells is statistically ~nprobe/cells; the spec asserts the
  * mechanics (subsetting, ranking, degeneration to exact at full probe)
  * rather than a recall floor the data cannot support.
  */
class AnnSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sfDir)
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("centroids: one per cell, dimension preserved") {
    val c = Ann.centroids(emb, "label", "embedding").collect()
    val nLabels = emb.select("label").distinct().count()
    assert(c.length == nLabels)
    assert(c.forall(_.getSeq[Double](1).size == 64))
  }

  test("brute-force top-k: k rows per query, descending, no self-match") {
    val top = Ann.bruteTopK(queries, emb, k = 5).collect()
    assert(top.length == 5 * 5)
    val byQ = top.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    assert(top.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("ivf with nprobe = #cells equals the exact scan") {
    val cells = emb.select("label").distinct().count().toInt
    val exact = Ann.bruteTopK(queries, emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Ann.ivfTopK(spark, queries, emb, k = 3, nprobe = cells).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == exact)
  }

  test("bruteTopK with screenDim drops degenerate vectors and keeps results exact") {
    // hostile corpus rows: a NaN vector (must be screened out of the
    // neighbor set) and a wrong-dimension vector (dim_mismatch)
    val hostile = spark.sql(
      """SELECT CAST(8000002 AS BIGINT) AS vec_id,
        |  transform(sequence(1, 64), i -> CAST(CASE WHEN i = 1 THEN 'NaN' ELSE '1.0' END AS FLOAT)) AS embedding,
        |  2 AS label
        |UNION ALL
        |SELECT CAST(8000008 AS BIGINT),
        |  transform(sequence(1, 3), i -> CAST('1.0' AS FLOAT)), 8""".stripMargin)
    val corpus = hostile.unionByName(emb.filter(col("vec_id") < 100))
    val screened = Ann.bruteTopK(queries, corpus, k = 5, screenDim = Some(64)).collect()
    val clean = Ann.bruteTopK(queries, emb.filter(col("vec_id") < 100), k = 5).collect()
    // no degenerate vector survives into any top-k…
    assert(!screened.exists(r => r.getLong(2) >= 8000000L))
    // …and on the surviving clean rows the results are identical to the
    // hostile-free run (the screen only removes, never perturbs)
    assert(screened.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet ==
      clean.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
  }

  test("ivf with nprobe=2 searches only probed cells") {
    val res = Ann.ivfTopK(spark, queries, emb, k = 5, nprobe = 2)
    val withLabel = res.join(emb.select(col("vec_id").as("neighbor"), col("label")), "neighbor")
    val labelsPerQ = withLabel.groupBy("q_id")
      .agg(countDistinct("label").as("nl")).collect()
    assert(labelsPerQ.forall(_.getLong(1) <= 2))
  }
}
