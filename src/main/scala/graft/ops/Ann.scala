package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column — the
  * scale path beside the exact scan (queries.SimilarityQueries.qCosineTopk).
  *
  * IVF (inverted-file) structure:
  *  1. coarse-quantize the corpus into cells — either pre-assigned cell
  *     ids (the testdata ships cluster labels) or, for the real unlabeled
  *     case, cells TRAINED by [[fit]] (Lloyd iterations over the same
  *     centroid aggregates; gated by q_ann_trained)
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

  /** A trained IVF coarse quantizer: `assigned` = the corpus plus an int
    * `cell` column (nearest trained centroid), `centroids` = the trained
    * k×dim table (cell, centroid: array<double>) — O(k) rows, broadcastable.
    */
  final case class IvfModel(assigned: DataFrame, centroids: DataFrame)

  /** Train IVF cells from an UNLABELED corpus — the production path the
    * [[centroids]] scaladoc promised ("a production build would
    * Lloyd-iterate the same aggregates"): a real 100 TB embedding table has
    * no label column, so the coarse quantizer must be LEARNED.
    *
    * `iters` Lloyd rounds (Lloyd 1982), each = one assignment pass + (for
    * all but the last round) one centroid update:
    *  - init: centroids = the embeddings of the k LOWEST ids (the
    *    q_kmeans_step seeding — deterministic, oracle-replicable; ORDER BY
    *    id LIMIT k is a TakeOrderedAndProject, no global sort materialized);
    *  - assignment is a NARROW map — the k×dim centroid matrix rides along
    *    as a literal (k·dim doubles, a few KB — far below the folded-literal
    *    plan-cost class Lineage.truncate exists for), each row computes its
    *    k squared distances via the codegen'd decimal_sqdist kernel
    *    (exactArith) or a double HOF fold, and argmins in-expression
    *    (array_position of array_min = first minimum = lowest cell id, the
    *    q_kmeans_step (dist, cid) tie-break). ZERO shuffle per assignment.
    *  - update: per-(cell, dim) mean — posexplode + groupBy, map-side
    *    combinable to k·dim rows per partition; only the k·dim result
    *    touches the driver per round (the qCoreset/qBpeMerges control-plane
    *    discipline: state is O(k·dim) numbers, never data). exactArith
    *    accumulates each dim in DECIMAL(28,14) (Exact.dMean14) so every
    *    round — and therefore the final assignment — is bit-reproducible by
    *    a SQL oracle; the default double avg is the production kernel.
    *
    * A cell whose membership becomes empty is DROPPED (k shrinks) — the
    * standard Lloyd degeneracy, chosen over respawn heuristics because it
    * is deterministic and oracle-replicable (an empty cell simply has no
    * mean row on either engine).
    *
    * Scale: iters sequential corpus scans (inherent to Lloyd — each round
    * depends on the previous), each a narrow map + a tiny-key aggregate;
    * at 100 TB the standard mitigation is to fit on a uniform sample
    * (Lloyd centroids are means — sampling error is O(1/√s)) and run only
    * the final assignment over the full corpus; this method composes that
    * way directly: fit(sample, …).centroids → assign full corpus.
    *
    * `screenDim` applies [[Validate.embeddingVerdict]] BEFORE the seed
    * selection — one hostile NaN vector among the k lowest ids would
    * otherwise poison a seed centroid exactly like the unscreened-centroid
    * hazard q_ann_screened pins.
    */
  def fit(corpus: DataFrame, k: Int, iters: Int,
          idCol: String = "vec_id", embCol: String = "embedding",
          cellCol: String = "cell", exactArith: Boolean = false,
          screenDim: Option[Int] = None): IvfModel = {
    require(k > 0, "fit needs k > 0 cells")
    require(iters > 0, "fit needs at least one Lloyd round")
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val c = screenDim match {
      case Some(d) => corpus.filter(Validate.embeddingVerdict(spark, embCol, d) === "ok")
      case None => corpus
    }
    // deterministic seeds: the k lowest-id embeddings, cell ids 0..k-1 in
    // id order. O(k·dim) driver bytes — control plane, not data.
    var cells: Seq[Int] = 0 until k
    var cents: Seq[Seq[Double]] =
      c.select(col(idCol), col(embCol)).orderBy(col(idCol)).limit(k).collect()
        .map(_.getSeq[Number](1).map(_.doubleValue()).toSeq).toSeq
    require(cents.size == k, s"fit(k=$k) needs k corpus rows, got ${cents.size}")

    // one narrow assignment pass under the current literal centroids
    def assigned(): DataFrame =
      c.withColumn(cellCol, assignExpr(embCol, cells, cents, exactArith))

    for (_ <- 1 until iters) {
      val mean =
        if (exactArith) graft.queries.Exact.dMean14(col("v")).as("cv")
        else avg(col("v")).as("cv")
      val rows = assigned()
        .select(col(cellCol), posexplode(col(embCol)).as(Seq("dim", "v")))
        .groupBy(col(cellCol), col("dim")).agg(mean)
        .collect()
      val byCell = rows.groupBy(_.getInt(0)).map { case (cell, rs) =>
        cell -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      cells = byCell.keys.toSeq.sorted
      cents = cells.map(byCell)
    }
    val centTable = spark.createDataFrame(
      spark.sparkContext.parallelize(cells.zip(cents).map { case (cl, ce) =>
        org.apache.spark.sql.Row(cl, ce)
      }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("centroid",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          nullable = false))))
    IvfModel(assigned(), centTable)
  }

  /** Persist a trained IVF index as the thing that makes IVF pay at
    * 100 TB: the assigned corpus written PARTITIONED BY cell (plus the
    * k-row centroid table beside it), so a probe join reads only the
    * nprobe/k of the data it scores. With the corpus laid out by cell,
    * Spark's dynamic partition pruning turns [[ivfTopK]]'s broadcast
    * probe join into a partition-pruned scan — the broadcast probe set's
    * cell ids become a runtime partition filter on the corpus read
    * (AnnSpec pins `dynamicpruning` in the index scan, and the gate
    * q_ann_index hash-matches q_ann_trained's oracle through the full
    * write → read-back → probe path). Without the layout, every probe
    * scans the whole corpus and IVF only saves kernel evaluations.
    */
  def writeIndex(model: IvfModel, path: String, cellCol: String = "cell"): Unit = {
    model.assigned.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(cellCol).parquet(s"$path/corpus")
    model.centroids.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$path/centroids")
  }

  /** Read back a persisted IVF index. `assigned`'s `cell` column is the
    * partition key — filters and probe joins on it prune to the matching
    * cell directories. */
  def readIndex(spark: SparkSession, path: String): IvfModel =
    IvfModel(spark.read.parquet(s"$path/corpus"),
      spark.read.parquet(s"$path/centroids"))

  /** Incremental ingest for a growing corpus — the reason the index keeps
    * its centroids beside the data: new rows are [[assign]]ed under the
    * STORED centroids (one narrow pass, no retraining, no touch of the
    * existing data) and appended into the matching cell directories.
    * Equivalent by construction to rebuilding the corpus layout from
    * scratch under the same centroids (AnnSpec pins append-then-serve ≡
    * rebuild-then-serve). Centroids drift as the corpus grows — the
    * standard maintenance trade; re-[[fit]] (on a sample) and rewrite
    * when recall degrades. Append atomicity is parquet's usual
    * task-commit story; concurrent appends to one index need an external
    * writer lock, same as any path-based table without a transaction log.
    *
    * `screenDim` matters MORE here than on any query path: a query-time
    * hostile vector poisons one result set, but an appended one is
    * PERSISTED — its all-NaN distances land it deterministically in a
    * cell, and every later probe of that cell scores it cosine = NaN,
    * which `desc` ordering ranks ABOVE every real neighbor, forever. An
    * index built from screened data should screen its ingest too.
    */
  def appendToIndex(spark: SparkSession, newRows: DataFrame, path: String,
                    embCol: String = "embedding", cellCol: String = "cell",
                    exactArith: Boolean = false,
                    screenDim: Option[Int] = None): Unit = {
    val stored = readIndex(spark, path)
    val rows = screenDim match {
      case Some(d) => newRows.filter(Validate.embeddingVerdict(spark, embCol, d) === "ok")
      case None => newRows
    }
    assign(rows, stored.centroids, embCol, cellCol, exactArith)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy(cellCol).parquet(s"$path/corpus")
  }

  /** Nearest-trained-cell for every corpus row — the second half of the
    * 100 TB composition [[fit]]'s scaladoc describes: fit on a uniform
    * SAMPLE (Lloyd centroids are means; sampling error is O(1/√s)), then
    * assign the FULL corpus in one narrow pass under the trained
    * centroids. `centroids` is an [[IvfModel.centroids]]-shaped table
    * (cell int, centroid array<double>) — O(k·dim), collected to the
    * driver as control plane and re-shipped as the same few-KB literal
    * the training rounds use, so assignment adds ZERO shuffle at any
    * corpus size. Same argmin algebra as [[fit]] (first-minimum =
    * (dist, cid) tie order): assigning the fit's own corpus under its
    * returned centroids reproduces `IvfModel.assigned` exactly (AnnSpec).
    */
  def assign(corpus: DataFrame, centroids: DataFrame,
             embCol: String = "embedding", cellCol: String = "cell",
             exactArith: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val rows = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).sortBy(_._1)
    require(rows.nonEmpty, "assign needs a nonempty centroid table")
    corpus.withColumn(cellCol,
      assignExpr(embCol, rows.map(_._1).toSeq, rows.map(_._2).toSeq, exactArith))
  }

  /** The narrow literal-centroid argmin shared by [[fit]] and [[assign]]:
    * dists[i] = sqdist(emb, cents[i]) — the codegen'd decimal_sqdist
    * kernel (exactArith) or a double HOF fold — and cell = cells[argmin],
    * where array_position-of-array_min takes the FIRST minimum = lowest
    * cell id, matching ROW_NUMBER ... ORDER BY dist, cid rn=1 in the
    * q_ann_trained oracle. cells/cents must be sorted by cell id.
    */
  private def assignExpr(embCol: String, cells: Seq[Int], cents: Seq[Seq[Double]],
                         exactArith: Boolean): Column = {
    val centsLit = typedlit(cents)
    val dists =
      if (exactArith)
        transform(centsLit, ce => call_function("decimal_sqdist", col(embCol), ce))
      else
        transform(centsLit, ce => aggregate(
          zip_with(col(embCol), ce, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
    element_at(typedlit(cells), array_position(dists, array_min(dists)).cast("int"))
  }

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
      screenDim: Option[Int] = None,
      storedCentroids: Option[DataFrame] = None): DataFrame = {
    // BEFORE any DataFrame that references the kernels: Datasets analyze
    // eagerly at construction, so a later register() call is too late for
    // the probe-assignment plan built a few lines down
    graft.functions.GraftFunctions.register(spark)
    val (queriesS, corpusS) = screened(spark, queries, corpus, embCol, screenDim)
    // index-serving shape: a persisted (cell, centroid) table (readIndex)
    // replaces the centroid-build pass — the ONLY corpus read left is the
    // probe equi-join, which a cell-partitioned index layout prunes to
    // the probed cells (see writeIndex). Derived-centroid mode (None)
    // keeps the self-contained q_ann_ivf shape.
    val cents = broadcast(storedCentroids
      .map(_.select(col("cell"), col("centroid")))
      .getOrElse(centroids(corpusS, cellCol, embCol, exactArith)))
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
    * upstream — [[Validate.screenToTable]] is that one-call helper
    * (gated by q_ann_screened_table) — and run unscreened here.
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
