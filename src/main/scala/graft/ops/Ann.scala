package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column — the
  * scale path beside the exact scan (queries.SimilarityQueries.qCosineTopk).
  *
  * IVF (inverted-file) structure:
  *  1. coarse-quantize the corpus into cells (here: k-means-style centroids
  *     computed as per-`label` means — the testdata ships cluster labels;
  *     a production build would Lloyd-iterate the same aggregates)
  *  2. a query probes only the `nprobe` nearest cells, then scores
  *     exact cosine within them.
  *
  * Scale: the corpus is partitioned by cell; a query touches
  * nprobe/#cells of the data. Centroids are tiny (#cells × dim) and
  * broadcast. All arithmetic is codegen'd higher-order functions — no UDFs.
  * Recall is tunable via nprobe (nprobe = #cells degenerates to the exact
  * scan); AnnSpec asserts recall against the brute-force oracle.
  *
  * Input contract: vectors must pass [[Validate.embeddingVerdict]] —
  * the exact-decimal kernels are unevaluable on non-finite components and
  * zero-norm vectors divide by zero inside every cosine
  * (q_hostile_embedding pins both engines' behavior). The screen is now
  * WIRED IN: pass `screenDim = Some(dim)` to [[ivfTopK]]/[[bruteTopK]]
  * and both sides are filtered to verdict-'ok' rows BEFORE any kernel or
  * centroid sees them (a NaN corpus vector would otherwise poison its
  * cell centroid, not just its own scores). The driver's embeddings
  * tables are clean by construction, so the clean-corpus registry queries
  * run unscreened; an untrusted ingest sets screenDim
  * (q_ann_screened gates the screened path over hostile ∪ real vectors).
  */
object Ann {

  /** HOF cosine for mixed/double arrays (centroid comparisons — tiny
    * inputs, codegen irrelevant). The hot float×float corpus scan uses the
    * native codegen'd graft.functions.CosineSimilarity instead — same
    * arithmetic order, bit-identical results (FunctionsSpec).
    */
  private def cosineExpr(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
       |  * sqrt(aggregate($b, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin)

  /** Per-cell centroids: mean embedding per `cellCol` (elementwise —
    * aggregate each dimension). Returns (cell, centroid: array<double>).
    * `exactArith` accumulates each dimension in DECIMAL(28,14) before the
    * mean (order-independent across partitions AND engines — the same
    * algebra as queries.SimilarityQueries.qCentroids), so an oracle can
    * reproduce the centroids bit-for-bit; the default double `avg` is the
    * production path.
    */
  def centroids(corpus: DataFrame, cellCol: String, embCol: String,
                exactArith: Boolean = false): DataFrame = {
    val mean =
      if (exactArith) graft.queries.Exact.dMean14(col("v")).as("mean_v")
      else avg(col("v")).as("mean_v")
    corpus
      .select(col(cellCol).as("cell"), posexplode(col(embCol)).as(Seq("dim", "v")))
      .groupBy(col("cell"), col("dim"))
      .agg(mean)
      .groupBy(col("cell"))
      .agg(expr("transform(array_sort(collect_list(named_struct('d', dim, 'v', mean_v))), s -> s.v)")
        .as("centroid"))
  }

  /** Decimal-accumulated cosine rounded to 6 dp — identical value algebra
    * to queries.SimilarityQueries.qCosineTopk and its DuckDB oracle, so an
    * exact-arithmetic IVF run can be hash-compared across engines.
    */
  private def decimalCosineExpr(a: String, b: String) = expr(
    // the fused exact-decimal kernel (functions.DecimalDot): bit-identical
    // to the declarative aggregate(zip_with(...)) DECIMAL(28,14) fold
    // (FunctionsSpec pins this) without the interpreted lambda eval that
    // otherwise dominates an exact-arithmetic corpus scan
    s"""round(
       |  decimal_dot($a, $b)
       |  / (SQRT(decimal_dot($a, $a)) * SQRT(decimal_dot($b, $b))), 6)""".stripMargin)

  /** Top-k cosine neighbors per query, probing `nprobe` cells.
    * queries: (qIdCol, embCol); corpus: (idCol, embCol, cellCol).
    * `exactArith = true` scores with decimal accumulation and ranks on the
    * ROUNDED cosine (qCosineTopk's algebra) so a full-probe run is
    * bit-comparable to a brute-force SQL oracle; the default double path
    * is the faster production kernel.
    */
  def ivfTopK(
      spark: SparkSession,
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 5,
      nprobe: Int = 2,
      qIdCol: String = "q_id",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      cellCol: String = "label",
      exactArith: Boolean = false,
      screenDim: Option[Int] = None): DataFrame = {
    // BEFORE any DataFrame that references the kernels: Datasets analyze
    // eagerly at construction, so a later register() call is too late for
    // the probe-assignment plan built a few lines down
    graft.functions.GraftFunctions.register(spark)
    val (queriesS, corpusS) = screened(spark, queries, corpus, embCol, screenDim)
    val cents = broadcast(centroids(corpusS, cellCol, embCol, exactArith))
    // assign each query its nprobe nearest cells. In exactArith mode the
    // cell score is the ROUNDED decimal cosine with a cell tie-break, so
    // the probe CHOICE itself (not just the in-cell scores) is
    // engine-reproducible and an oracle can replicate the pruning.
    val cellScore =
      if (exactArith) decimalCosineExpr("q_emb", "centroid")
      else cosineExpr("q_emb", "centroid")
    val wCell = Window.partitionBy(col(qIdCol)).orderBy(col("cell_sim").desc, col("cell"))
    val probes = broadcast(
      queriesS.crossJoin(cents)
        .withColumn("cell_sim", cellScore)
        .withColumn("cell_rank", row_number().over(wCell))
        .filter(col("cell_rank") <= nprobe)
        .select(col(qIdCol), col("q_emb"), col("cell")))
    // score only within probed cells — native codegen'd kernel
    val wTop = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    val score =
      if (exactArith) decimalCosineExpr("q_emb", embCol)
      else expr(s"cosine_similarity(q_emb, $embCol)")
    probes
      .join(corpusS, probes("cell") === corpusS(cellCol))
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("cosine", score)
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= k)
      .select(col(qIdCol), col("rnk"), col(idCol).as("neighbor"), round(col("cosine"), 6).as("cosine"))
  }

  /** The embeddingVerdict screen applied to both sides of an ANN run:
    * only verdict-'ok' rows (finite, right-dimensioned, nonzero-norm in
    * the kernels' own DECIMAL(28,14) arithmetic) reach the kernels. One
    * narrow per-row filter on each side — no shuffle, pushed to the scans.
    * Queries carry their vector as `q_emb` (the ivfTopK/bruteTopK column
    * convention).
    *
    * Cost honesty: the filter re-evaluates PER CONSUMER SCAN — ivfTopK
    * reads the corpus twice (centroid build + probe equi-join), so every
    * surviving row pays the verdict's exact-decimal self dot product
    * twice. For one-shot screening that is the right trade (no
    * materialization); a pipeline running MANY ANN queries over one
    * untrusted corpus should instead persist the screened corpus once
    * upstream (filter + write, DedupState-style) and run unscreened here.
    */
  private def screened(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
                       embCol: String, screenDim: Option[Int]): (DataFrame, DataFrame) =
    screenDim match {
      case Some(d) =>
        (queries.filter(Validate.embeddingVerdict(spark, "q_emb", d) === "ok"),
          corpus.filter(Validate.embeddingVerdict(spark, embCol, d) === "ok"))
      case None => (queries, corpus)
    }

  /** Exact brute-force top-k (the recall oracle and the small-corpus path). */
  def bruteTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int = 5,
      qIdCol: String = "q_id",
      idCol: String = "vec_id",
      embCol: String = "embedding",
      screenDim: Option[Int] = None): DataFrame = {
    graft.functions.GraftFunctions.register(queries.sparkSession)
    val (queriesS, corpusS) = screened(queries.sparkSession, queries, corpus, embCol, screenDim)
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    broadcast(queriesS).crossJoin(corpusS)
      .filter(col(qIdCol) =!= col(idCol))
      .withColumn("cosine", expr(s"cosine_similarity(q_emb, $embCol)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col(qIdCol), col("rnk"), col(idCol).as("neighbor"), round(col("cosine"), 6).as("cosine"))
  }
}
