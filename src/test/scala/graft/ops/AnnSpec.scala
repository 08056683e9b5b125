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

  test("fit: every row gets exactly one trained cell; centroids table matches") {
    val model = Ann.fit(emb.select(col("vec_id"), col("embedding")), k = 4, iters = 2)
    val n = emb.count()
    assert(model.assigned.count() == n)
    assert(model.assigned.filter(col("cell").isNull).count() == 0)
    val usedCells = model.assigned.select("cell").distinct()
      .collect().map(_.getInt(0)).toSet
    val modelCells = model.centroids.collect().map(_.getInt(0)).toSet
    // assignment only ever lands on a trained (non-degenerate) cell…
    assert(usedCells.subsetOf(modelCells))
    assert(modelCells.subsetOf((0 until 4).toSet))
    // …and every centroid keeps the corpus dimensionality
    assert(model.centroids.collect().forall(_.getSeq[Double](1).size == 64))
  }

  test("fit: Lloyd distortion is monotone non-increasing across rounds") {
    // J(assignment) = total sqdist to the assignment's own member means —
    // Lloyd's objective after the update half-step; classic monotonicity
    // guarantees J(iters=2) <= J(iters=1)
    def distortion(assigned: org.apache.spark.sql.DataFrame): Double = {
      val cents = Ann.centroids(assigned, "cell", "embedding")
        .withColumnRenamed("cell", "c_cell")
      assigned.join(broadcast(cents), col("cell") === col("c_cell"))
        .withColumn("d", expr(
          """aggregate(zip_with(embedding, centroid, (x, y) ->
            |  (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
            |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin))
        .agg(sum(col("d"))).collect()(0).getDouble(0)
    }
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val j1 = distortion(Ann.fit(corpus, k = 4, iters = 1).assigned)
    val j2 = distortion(Ann.fit(corpus, k = 4, iters = 2).assigned)
    val j3 = distortion(Ann.fit(corpus, k = 4, iters = 3).assigned)
    assert(j2 <= j1 + 1e-9, s"round 2 worsened Lloyd objective: $j1 -> $j2")
    assert(j3 <= j2 + 1e-9, s"round 3 worsened Lloyd objective: $j2 -> $j3")
  }

  test("fit-trained ivf: recall@5 vs bruteTopK beats the random-cell expectation") {
    // trained cells are GEOMETRIC (unlike the testdata's random labels), so
    // probing the 2 nearest of 4 trained cells must recover well over the
    // ~nprobe/k = 50% a random partition would give
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val model = Ann.fit(corpus, k = 4, iters = 2)
    val ivf = Ann.ivfTopK(spark, queries, model.assigned, k = 5, nprobe = 2,
      cellCol = "cell")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Ann.bruteTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"trained-cell recall@5 = $recall, expected >= 0.6")
  }

  test("assign composes fit-on-a-sample with full-corpus assignment") {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val sample = corpus.filter(col("vec_id") % 2 === 0) // uniform half
    val model = Ann.fit(sample, k = 4, iters = 2)
    val full = Ann.assign(corpus, model.centroids)
    // every corpus row (sampled or not) gets exactly one trained cell
    assert(full.count() == corpus.count())
    assert(full.filter(col("cell").isNull).count() == 0)
    val modelCells = model.centroids.collect().map(_.getInt(0)).toSet
    assert(full.select("cell").distinct().collect()
      .map(_.getInt(0)).toSet.subsetOf(modelCells))
    // same centroids + same argmin algebra: assigning the fit's own
    // corpus reproduces the model's assignment bit-for-bit
    val reassigned = Ann.assign(sample, model.centroids)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val original = model.assigned
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(reassigned == original)
  }

  test("persisted index: probe join prunes the cell-partitioned scan; serving matches") {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val model = Ann.fit(corpus, k = 4, iters = 2)
    val dir = tmpDir("annidx") + "/idx"
    Ann.writeIndex(model, dir)
    val stored = Ann.readIndex(spark, dir)
    val served = Ann.ivfTopK(spark, queries, stored.assigned, k = 5, nprobe = 2,
      cellCol = "cell", storedCentroids = Some(stored.centroids))
    // the probe equi-join's corpus scan carries a dynamic partition-pruning
    // filter — only the probed cell directories are read (the thing the
    // partitioned layout exists for)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the index scan:\n${plan.take(3000)}")
    // write → read → serve returns exactly what serving the in-memory
    // model returns (doubles round-trip parquet bit-exactly)
    val direct = Ann.ivfTopK(spark, queries, model.assigned, k = 5, nprobe = 2,
      cellCol = "cell", storedCentroids = Some(model.centroids))
    assert(served.collect().map(_.toString).toSet ==
      direct.collect().map(_.toString).toSet)
  }

  test("appendToIndex: incremental ingest equals a same-centroid rebuild") {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val half1 = corpus.filter(col("vec_id") < 250)
    val half2 = corpus.filter(col("vec_id") >= 250)
    val model = Ann.fit(half1, k = 4, iters = 2)
    val dir = tmpDir("annappend") + "/idx"
    Ann.writeIndex(model, dir)
    Ann.appendToIndex(spark, half2, dir)
    val grown = Ann.readIndex(spark, dir)
    // the grown index covers the full corpus, each row exactly once…
    assert(grown.assigned.count() == corpus.count())
    assert(grown.assigned.select("vec_id").distinct().count() == corpus.count())
    // …appended rows landed on the STORED centroids' argmin cells
    // (identical to assigning the full corpus under the same centroids)
    val rebuilt = Ann.assign(corpus, model.centroids)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val stored = grown.assigned
      .collect().map(r => (r.getLong(0), r.getAs[Int]("cell"))).toSet
    assert(stored == rebuilt)
    // …and serving the grown index can surface appended rows as neighbors
    val served = Ann.ivfTopK(spark, queries, grown.assigned, k = 5, nprobe = 4,
      cellCol = "cell", storedCentroids = Some(grown.centroids))
      .collect().map(_.getLong(2)).toSet
    assert(served.exists(_ >= 250L), "no appended row ever surfaced in any top-5")
  }

  test("appendToIndex with screenDim rejects hostile rows at ingest") {
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val model = Ann.fit(corpus.filter(col("vec_id") < 250), k = 4, iters = 2)
    val dir = tmpDir("annappend_s") + "/idx"
    Ann.writeIndex(model, dir)
    // a NaN vector in the ingest batch: unscreened it would PERSIST into a
    // cell and rank cosine=NaN above every real neighbor forever
    val hostile = spark.sql(
      """SELECT CAST(9000001 AS BIGINT) AS vec_id,
        |  transform(sequence(1, 64), i -> CAST('NaN' AS FLOAT)) AS embedding""".stripMargin)
    Ann.appendToIndex(spark, hostile.unionByName(corpus.filter(col("vec_id") >= 250)),
      dir, screenDim = Some(64))
    val grown = Ann.readIndex(spark, dir)
    assert(grown.assigned.filter(col("vec_id") === 9000001L).count() == 0)
    val served = Ann.ivfTopK(spark, queries, grown.assigned, k = 5, nprobe = 2,
      cellCol = "cell", storedCentroids = Some(grown.centroids)).collect()
    assert(served.forall(r => !r.getDouble(3).isNaN && r.getLong(2) != 9000001L))
  }

  test("fit with screenDim trains only on verdict-ok vectors") {
    // a NaN vector with the LOWEST id would poison seed centroid 0 unscreened
    val hostile = spark.sql(
      """SELECT CAST(-1 AS BIGINT) AS vec_id,
        |  transform(sequence(1, 64), i -> CAST('NaN' AS FLOAT)) AS embedding""".stripMargin)
    val corpus = hostile.unionByName(emb.select(col("vec_id"), col("embedding")))
    val model = Ann.fit(corpus, k = 4, iters = 2, screenDim = Some(64))
    // the hostile row is screened out of both training and assignment…
    assert(model.assigned.filter(col("vec_id") === -1L).count() == 0)
    // …and the trained model equals the hostile-free fit exactly
    val clean = Ann.fit(emb.select(col("vec_id"), col("embedding")), k = 4, iters = 2)
    assert(model.centroids.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet ==
      clean.centroids.collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSet)
  }

  test("ivf with nprobe=2 searches only probed cells") {
    val res = Ann.ivfTopK(spark, queries, emb, k = 5, nprobe = 2)
    val withLabel = res.join(emb.select(col("vec_id").as("neighbor"), col("label")), "neighbor")
    val labelsPerQ = withLabel.groupBy("q_id")
      .agg(countDistinct("label").as("nl")).collect()
    assert(labelsPerQ.forall(_.getLong(1) <= 2))
  }
}
