package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions — the "is this the plan you'd want at 100×"
  * audit, frozen as tests so a regression (lost pushdown, surprise
  * cartesian, broken top-k) fails CI instead of a bench read.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  // The ONLY queries allowed a nested-loop/cartesian shape, by design:
  // band-table BETWEEN join, the broadcast-queries exact cosine scan, and
  // IVF's query×centroid assignment (both sides tiny; the corpus join is equi).
  // q_vocab_coverage / q_pack: PrefixSum's triangular offsets join
  // (numPartitions rows) and the broadcast scalar-total join are both
  // metadata-scale BNLJs.
  // q_embedding_neardup: the 64-row hyperplane table is broadcast against
  // the corpus with no join key by design (every vector × every plane).
  // q_gapfill: the spine join is distinct-types × a broadcast 1-row bounds
  // aggregate — keyless by design, metadata-scale (#types × 1 rows).
  // q_source_drift: the corpus-total scalar is a broadcast 1-row join.
  private val bnljAllowed =
    Set("q_range_join", "q_cosine_topk", "q_ann_ivf", "q_ann_ivf_kernel",
      "q_ann_fullprobe", "q_vocab_coverage", "q_pack", "q_embedding_neardup",
      "q_gapfill", "q_source_drift",
      // deliberate broadcast-cross/theta joins against O(k)/O(1)-row
      // tables: the 8-row centroid table (Lloyd assignment), the 1-row
      // bigram-type total, the 1-row corpus-max scalar (weighted sample),
      // the 100-row rank theta self-join (Zipf fit), the 1-row dangling
      // -mass scalar (PageRank), and the 1-row min/max bounds (quantize)
      "q_kmeans_step", "q_kneser_ney", "q_weighted_sample", "q_ivf_pq", "q_ivf_pq_recall",
      "q_zipf", "q_pagerank", "q_quantize",
      // PrefixSum's triangular offsets join (numPartitions rows) and/or a
      // 1-row scalar-totals broadcast-cross: AUC's cumulative-negatives
      // pass, KS's two ECDF passes + (na, nb) totals row, DSIR's
      // (nc, nt, v) totals row riding the vocab-sized LM table
      "q_auc", "q_ks_test", "q_dsir_weights",
      // SemDeDup's nearest-centroid assignment: 64-row centroid table
      // broadcast-crossed against the corpus (the q_kmeans_step shape)
      "q_semdedup",
      // hostile-embedding cosine probe: 6 screened vectors broadcast-
      // crossed with themselves (O(k), k = 6 by construction)
      "q_hostile_embedding",
      // the screened IVF run (q_ann_ivf's exact shape: query×centroid
      // assignment over the 10-row broadcast centroid table; the verdict
      // screen is a per-row filter, not a join)
      "q_ann_screened",
      // same q_ann_ivf probe shape: query×centroid assignment over the
      // O(k) trained-cell / screened-table centroid broadcast
      "q_ann_trained", "q_ann_screened_table", "q_ann_index",
      // the q_ann_index serve shape over the grown/compacted/replaced
      // index: stored O(k) centroid table crossed with the 10-row query set
      "q_stream_ann_ingest", "q_ann_compact", "q_ann_replace",
      // 1-row scalar-totals broadcast-cross: PMI's (n_tok, t_bi) pair on
      // the bigram table, MI's grand total on the contingency table
      "q_pmi", "q_mutual_info",
      // the broadcast-queries exact cosine scan (q_cosine_topk's shape):
      // hard-negative mining broadcasts its 16 anchors across the corpus
      "q_ndcg", "q_hard_negatives",
      // q_ivf_pq's pipeline (8-row coarse, 16-row codebook, 64-row LUT)
      // plus the O(q*20) ADC shortlist and 2-row query table for the
      // exact-rerank refine stage — every crossed frame is k-bounded
      "q_ivf_rerank",
      // 1-row scalar broadcast-crosses: kappa's chance-agreement scalar,
      // calibration's global (lo, hi) bounds row, k-anonymity's corpus
      // total riding the class table
      "q_cohens_kappa", "q_calibration", "q_k_anonymity", "q_l_diversity",
      // two 1-row sketch/estimate scalars crossed for the ALL verdict row
      "q_hll_merge",
      // two 1-row quantile-estimate scalars crossed onto the audit pass
      "q_kll_quantiles",
      // the 1-row digit-histogram total crossed onto the 9-row histogram
      "q_benford",
      // 1-row sketch-estimate scalars crossed with the 1-row exact audit
      "q_theta_ops",
      // BM25's (n_docs, sum_dl) corpus scalars ride one broadcast row
      "q_bm25",
      // the 1-row query-embedding broadcast-cross (q_cosine_topk's shape)
      "q_rrf",
      // PrefixSum's triangular offsets join (numPartitions rows), twice
      "q_skyline",
      // PrefixSum's triangular offsets join (rank assignment)
      "q_gini",
      // three 1-row layout-audit aggregates crossed into the verdict row
      // (q_hilbert no longer needs an entry: its verdict row is one
      // grouping-less aggregate over the tagged bucket-stats table)
      "q_zorder",
      // 1-row totals + 1-row merge-verdict scalars crossed onto the top-k probe
      "q_count_min",
      // greedy k-center rounds: O(k)-row selected-centers table broadcast-
      // crossed against the corpus (the q_kmeans_step Lloyd shape, k <= 8)
      "q_coreset",
      // marginal-sized crosses: the L×S contingency grid (row marginals ×
      // column marginals × 1-row total, then the 1-row statistic crossed
      // back onto the cells) and the S×S source-pair grid (S-row
      // per-source totals crossed with themselves)
      "q_chi_squared", "q_js_divergence",
      // 1-row (n_a, n_b, alpha0) scalar-totals broadcast-cross on the
      // min-count-filtered vocab table
      "q_log_odds",
      // 1-row piece-mass total crossed onto the candidate-piece vocab
      "q_unigram_lm", "q_unigram_refit",
      // two 1-row score-total scalars crossed onto the node-sized
      // hub/authority tables for the final share columns
      "q_hits",
      // PrefixSum offsets join + the 9-row decile-threshold theta join,
      // the 1-row boundary-array / cohort-total / psi-statistic crosses
      "q_psi",
      // 1-row basket-total scalar crossed onto the brand-pair table
      "q_market_basket",
      // calendar-bounded quadratic: the hourly aggregate's theta self-join
      // (#hours² pairs) + the 1-row point-count cross
      "q_kendall",
      // PrefixSum offsets joins (×3) + 1-row totals/peak crosses
      "q_cusum",
      // 1-row point-estimate cross onto the 1-row sorted-replica-means row
      "q_bootstrap",
      // PrefixSum offsets (×3) + 1-row anchor-date / customer-count crosses
      "q_rfm",
      // PrefixSum offsets + 1-row totals cross + the 10-row decile
      // cumulative theta self-join (metadata-scale, the q_zipf pattern)
      "q_gains",
      // 1-row grand-mean cross onto the <=168-cell grid
      "q_seasonality",
      // 1-row activity-cutoff cross onto the events scan (twice)
      "q_churn_features",
      // 1-row eval-window-start cross onto the hourly rollup
      "q_forecast_baseline",
      // 1-row mmd2 statistic cross onto the d-row per-dimension table
      "q_mmd",
      // PrefixSum offsets + 1-row eval-start/n_cal/q-hat crosses
      "q_conformal")
  // Streaming queries execute on fn() (AvailableNow drain) — their final
  // frame is a memory-table read; plan checks don't apply.
  private val skipped =
    Set("q_stream_tumbling", "q_stream_dedup", "q_stream_sliding", "q_stream_session",
      "q_stream_session_dyn",
      "q_stream_custom_state", "q_stream_join", "q_stream_enrich", "q_stream_curation",
      "q_stream_ohlc", "q_stream_drift")

  // ---------------------------------------------------------------------
  // Broadcast-hint guard (r5/r7 verdict): a broadcast() HINT whose subtree
  // scans a corpus-scale table is the classic 100-TB scale-killer — the
  // build side grows with the data and a forced broadcast OOMs where AQE
  // would have chosen correctly. Every hint below is individually audited:
  // the hinted frame must be O(1) rows (a grouping-less aggregate), O(k)
  // rows (a literal-bounded filter / k-row codebook), or vocabulary-sized
  // (grows sublinearly and is the thing you'd persist as a model table).
  // A NEW broadcast hint over documents/part/lineitem/orders/customer/
  // events/embeddings fails this test until it is audited into the list —
  // the r7 offenders (q_minhash_lsh, q_ngram_jaccard, q_minhash_est ×2 on
  // candidate-pair sets; q_jaro / q_entity_resolution on a whole-table
  // sample) are deliberately NOT here and must stay out.
  private val corpusTables =
    Set("documents", "part", "lineitem", "orders", "customer", "events", "embeddings")
  private val corpusBroadcastAllowed: Map[String, String] = {
    val scalar = "grouping-less aggregate: O(1)-row scalar totals/bounds"
    val perType = "groupBy on bounded key (event_type/priority/flag): O(#types) rows"
    val kRows = "literal-bounded query/centroid/codebook set: O(k) rows"
    val vocab = "vocabulary-sized model table: sublinear growth, the frame you'd persist"
    Map(
      "q_weighted_sample" -> scalar, "q_zipf" -> scalar, "q_ks_test" -> scalar,
      "q_cohens_kappa" -> scalar, "q_mutual_info" -> scalar, "q_pmi" -> scalar,
      "q_vocab_coverage" -> scalar, "q_benford" -> scalar, "q_hll_merge" -> scalar,
      "q_kll_quantiles" -> scalar, "q_theta_ops" -> scalar, "q_gapfill" -> scalar,
      "q_k_anonymity" -> scalar, "q_l_diversity" -> scalar,
      "q_weighted_median" -> scalar,
      "q_quantize" -> (scalar + " + 16-row codebook"),
      "q_winsorize" -> perType, "q_zscore_outliers" -> perType,
      "q_anomaly_mad" -> perType, "q_approx_percentile" -> perType,
      "q_heavy_hitters" -> (perType + " (sketch rows)"),
      "q_approx_topk" -> (perType + " (sketch rows)"),
      "q_count_min" -> (scalar + " + 1-row merge-linearity verdict"),
      "q_coreset" -> (kRows + " (<=8 selected centers per greedy round)"),
      "q_hostile_embedding" -> (kRows + " (6 id-filtered screened vectors, cosine self-cross)"),
      "q_ann_screened" -> (kRows + " (q_ann_ivf's shape over the screened hostile ∪ real slice)"),
      "q_ann_trained" -> (kRows + " (q_ann_ivf's shape over Ann.fit's k=4 trained cells; " +
        "fit's own assignment is a narrow literal-centroid map, no join)"),
      "q_ann_screened_table" -> (kRows + " (q_ann_ivf's shape over the persist-once screened table)"),
      "q_ann_index" -> (kRows + " (stored k-row centroid table + broadcast probe set; " +
        "the corpus read is the DPP-pruned partitioned index scan)"),
      "q_stream_ann_ingest" -> (kRows + " (q_ann_index's serve shape over the stream-grown index)"),
      "q_ann_compact" -> (kRows + " (q_ann_index's serve shape over the compacted index)"),
      "q_ann_replace" -> (kRows + " (q_ann_index's serve shape over the k=5 replaced generation)"),
      "q_cosine_topk" -> kRows, "q_ndcg" -> kRows, "q_rrf" -> kRows,
      "q_ann_fullprobe" -> kRows, "q_ann_ivf" -> kRows, "q_ann_ivf_kernel" -> kRows,
      "q_kmeans_step" -> kRows, "q_pq" -> kRows, "q_ivf_pq" -> (kRows + " (8-row coarse, 16-row codebook, 64-row LUT)"),
      "q_ivf_pq_recall" -> (kRows + " (same pipeline + 2-row query broadcast for the exact audit)"),
      "q_ivf_rerank" -> (kRows + " (same pipeline + O(q*20) ADC shortlist + 2-row query broadcast for the refine rerank)"),
      "q_hard_negatives" -> (kRows + " (16-anchor broadcast, q_cosine_topk's exact-scan shape)"),
      "q_perceptron_step" -> kRows,
      "q_calibration" -> (scalar + " (global lo/hi bounds)"),
      "q_semdedup" -> kRows,
      "q_bigram_lm" -> vocab, "q_perplexity" -> vocab, "q_kneser_ney" -> vocab,
      "q_tfidf" -> vocab, "q_bm25" -> (vocab + " + corpus scalars"),
      "q_simhash" -> (vocab + " (token→hyperplane votes)"),
      "q_boilerplate" -> (vocab + " (df-capped line table)"),
      "q_dsir_weights" -> (vocab + " + scalar totals"),
      "q_source_drift" -> (vocab + " + scalar totals — the r7-flagged extreme-vocab watch item"),
      "q_pagerank" -> (scalar + " (dangling-mass row) + vocab-scale degree"),
      "q_triangles" -> "degree table: O(#nodes), sublinear in edges; the oriented-wedge design",
      "q_jaccard_join" -> (vocab + " (PrefixFilterJoin df table)"),
      "q_lsh_recall" -> (vocab + " (PrefixFilterJoin df table)"),
      "q_chi_squared" -> (scalar + " (corpus-total row + 1-row chi2/dof statistic)"),
      "q_log_odds" -> (scalar + " (1-row group/prior token totals)"),
      "q_unigram_lm" -> (scalar + " (1-row piece-mass total on the candidate vocab)"),
      "q_unigram_refit" -> (scalar + " (same pipeline: 1-row piece-mass total)"),
      "q_hits" -> (scalar + " (1-row hub/authority score totals)"),
      "q_psi" -> (scalar + " (9-row decile thresholds, 1-row boundary array/totals/statistic)"),
      "q_market_basket" -> (scalar + " (1-row distinct-basket total)"),
      "q_kendall" -> (scalar + " (1-row hourly point count)"),
      "q_cusum" -> (scalar + " (1-row series totals + 1-row peak)"),
      "q_bootstrap" -> (scalar + " (1-row n/mean point estimate)"),
      "q_rfm" -> (scalar + " (1-row anchor date + 1-row customer count)"),
      "q_gains" -> (scalar + " (1-row n/positives totals + 10-row decile table)"),
      "q_seasonality" -> (scalar + " (1-row grand-mean totals)"),
      "q_churn_features" -> (scalar + " (1-row activity cutoff)"),
      "q_forecast_baseline" -> (scalar + " (1-row eval-window start)"),
      "q_mmd" -> (scalar + " (1-row mmd2 statistic)"),
      "q_conformal" -> (scalar + " (1-row eval-start, calibration count, conformal quantile)"),
      "q_js_divergence" -> (perType + " (per-source token totals: O(#sources) rows)"),
      "q_quantile_norm" -> (perType + " (S-row per-source counts + 20-row target-quantile table)"))
  }

  private def corpusHintsIn(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        h.child.collectLeaves().flatMap {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation => fs.location.rootPaths.map(_.getName)
              .filter(n => corpusTables.contains(n.stripSuffix(".parquet")))
            case _ => Nil
          }
          case _ => Nil
        }.distinct
    }.filter(_.nonEmpty).map(_.mkString("+"))
  }

  private def corpusBroadcastHints(name: String): Seq[String] =
    corpusHintsIn(SparkEntry.queries(name)(spark, sfDir).queryExecution.analyzed)

  test("no query plans a CartesianProduct; BNLJ only where designed") {
    val bad = (for ((name, _) <- SparkEntry.queries.toSeq if !skipped(name)) yield {
      val plan = planOf(name)
      if (plan.contains("CartesianProduct")) Some(s"$name: cartesian product")
      else if (!bnljAllowed(name) && plan.contains("BroadcastNestedLoopJoin"))
        Some(s"$name: unexpected nested-loop join")
      else None
    }).flatten
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("broadcast hints over corpus-table scans only where audited") {
    val offenders = (for {
      name <- SparkEntry.queries.keys.toSeq.sorted if !skipped(name)
      hinted = corpusBroadcastHints(name) if hinted.nonEmpty
      if !corpusBroadcastAllowed.contains(name)
    } yield s"$name: broadcast hint over ${hinted.mkString(", ")}")
    assert(offenders.isEmpty,
      s"un-audited broadcast hint(s) on corpus scans:\n${offenders.mkString("\n")}")
  }

  test("streaming queries: no broadcast hint over corpus-table scans (micro-batch guard)") {
    // r8 verdict "what's wrong" #2: q_stream_enrich force-broadcast the full
    // customer table into every micro-batch and the batch guard above skips
    // streaming queries entirely, so nothing protected it. Drain each stream
    // once (AvailableNow) — drainToMemory records the analyzed streaming
    // frame, hints intact — then apply the same corpus-hint audit to it.
    // NO streaming query is allowlisted: a mandatory corpus broadcast
    // re-shipped per micro-batch is strictly worse than the batch case, and
    // the batch planner already broadcasts genuinely small static sides on
    // its own per micro-batch.
    val offenders = (for (name <- skipped.toSeq.sorted) yield {
      SparkEntry.queries(name)(spark, sfDir).foreach(_ => ()) // run the drain
      val sink = name.replaceFirst("^q_", "graft_")
      val plan = graft.queries.StreamingQueries.analyzedPlans.get(sink)
      assert(plan.isDefined, s"$name: no analyzed plan recorded for sink $sink")
      val hinted = corpusHintsIn(plan.get)
      if (hinted.nonEmpty) Some(s"$name: broadcast hint over ${hinted.mkString(", ")}")
      else None
    }).flatten
    assert(offenders.isEmpty,
      s"corpus broadcast hint(s) inside streaming plans:\n${offenders.mkString("\n")}")
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val plan = planOf("q1_agg")
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      "filter not pushed to scan")
    // partial + final hash aggregation
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no partial aggregation")
  }

  test("q1_agg prunes columns to the ones used") {
    val plan = planOf("q1_agg")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unused column read: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("top-k queries plan TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q_topk", "q3_join", "q10_returns"))
      assert(planOf(q).contains("TakeOrderedAndProject"), s"$q does a global sort")
  }

  test("the ANN embedding screen is shuffle-neutral (a fused filter, not a join)") {
    // same corpus, same plan, screen on vs off: the verdict screen must
    // ride the existing scans as a per-row filter — identical exchange
    // count, no added join
    val emb = Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    def plan(sd: Option[Int]): String =
      graft.ops.Ann.ivfTopK(spark, qs, emb, k = 5, nprobe = 2,
        exactArith = true, screenDim = sd).queryExecution.executedPlan.toString
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    def joins(p: String) = "Join".r.findAllIn(p).size
    val (on, off) = (plan(Some(64)), plan(None))
    assert(exchanges(on) == exchanges(off),
      s"screen added a shuffle: ${exchanges(on)} vs ${exchanges(off)}")
    assert(joins(on) == joins(off), "screen added a join")
  }

  test("q_edit_distance broadcasts the self-join side (no SMJ duplicate-key buffering)") {
    val plan = planOf("q_edit_distance")
    assert(plan.contains("BroadcastHashJoin"), "blocked self-join not broadcast")
    assert(!plan.contains("SortMergeJoin"), "fuzzy match fell back to sort-merge")
  }

  test("q_interval_join plans an equi-join ON THE BUCKET KEY") {
    // the blanket test already forbids BNLJ/cartesian; this asserts the
    // positive shape — some hash/merge join keyed on the quantized bucket
    val plan = planOf("q_interval_join")
    val joinLine = plan.linesIterator.find(l =>
      (l.contains("SortMergeJoin") || l.contains("HashJoin")) && l.contains("__bucket"))
    assert(joinLine.isDefined, s"no equi-join on __bucket found:\n$plan")
  }

  test("LM queries broadcast their vocabulary-sized model tables") {
    // q_perplexity joins the probe bigrams against the LM count table and
    // the head totals; both are vocabulary-scale and must broadcast — a
    // silent fallback to sort-merge would shuffle the corpus per join.
    val plan = planOf("q_perplexity")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"LM tables not broadcast:\n$plan")
  }

  test("q_gram_matrix partial-aggregates the exploded products before the exchange") {
    // the d² outer-product explosion must map-side combine down to ≤2080
    // cells per partition BEFORE shuffling — without the partial
    // HashAggregate the exchange would carry rows × d²(≈2080) tuples
    val plan = planOf("q_gram_matrix")
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("partial_sum")
    assert(partialIdx >= 0, s"no partial aggregation:\n$plan")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      "partial agg must sit below (after in printed order) the exchange")
  }

  test("q_triangles broadcasts the degree table; wedge close is an equi-join") {
    val plan = planOf("q_triangles")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"degree table not broadcast:\n$plan")
  }

  test("q5_multi_join broadcasts the dimension tables") {
    val plan = planOf("q5_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "star-schema dims not broadcast")
  }

  test("flagship plans keep their hot path inside whole-stage codegen") {
    // A scan→filter→project→partial-agg pipeline that falls out of
    // codegen (interpreted expressions, UDFs) is the classic silent 10×
    // at scale. AQE wraps the plan and defers stage compilation, hiding
    // the codegen markers from the printed plan — turn it off for the
    // inspection only (codegen insertion is independent of AQE).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q1_agg", "q3_join", "q_topk", "q_window_rank", "q_scalar_fns")) {
        val plan = planOf(q)
        assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
          s"$q has no codegen span:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("exact-similarity queries run the fused decimal kernels, not interpreted HOF folds") {
    // a regression back to the aggregate(zip_with(...)) spelling would be
    // bit-identical but pay per-element interpreted lambda eval on every
    // scored pair — the classic silent 5× on an exact-arithmetic corpus scan
    // (q_semdedup's kernels sit behind localCheckpoint lineage cuts, so its
    // printed plan cannot witness them — its spellings are shared with the
    // queries below, and the FunctionsSpec pin covers the kernels themselves)
    for (q <- Seq("q_cosine_topk", "q_embedding_neardup",
                  "q_ann_fullprobe", "q_ann_ivf")) {
      val plan = planOf(q)
      assert(plan.contains("decimal_dot"),
        s"$q does not use the fused decimal_dot kernel")
      assert(!plan.contains("zip_with"),
        s"$q still evaluates an interpreted zip_with fold")
    }
  }

  test("shuffle joins get a runtime bloom filter from a selective build side") {
    // The non-partitioned analog of dynamic partition pruning: when the
    // fact is NOT laid out on the join key and the join is too big to
    // broadcast, Spark's InjectRuntimeFilter should semi-filter the probe
    // side with a bloom filter built from the selective dim — at 100 TB
    // that is the difference between shuffling the whole fact and
    // shuffling the surviving fraction. Frozen here so a conf/shape change
    // that silently drops the filter fails CI. Thresholds are tuned for
    // test-sized data; the default 10 GB application-side floor is exactly
    // the cluster posture (don't bother below scan sizes that matter).
    val path = tmpDir("bloom") + "/fact"
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.mode("overwrite").parquet(path)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val sel = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val q = spark.read.parquet(path)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected on the probe side:\n$plan")
      assert(q.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("decimal sums are partition-count invariant (order independence)") {
    import graft.queries.Exact
    val li = Tables.lineitem(spark, sfDir)
    def total(parts: Int): Double =
      li.repartition(parts).agg(Exact.dsum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(total(1) == total(7) && total(7) == total(32))
  }
}
