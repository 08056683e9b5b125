package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Engine-internal ground truths for the learning-operator queries —
  * invariants the DuckDB oracle cannot see: an independent in-JVM BPE
  * reference, the Kneser-Ney total-probability identity, true-nearest
  * centroid assignment, and the pagination window against a full sort.
  */
class LearnSpec extends SparkSpec {

  test("q_bpe_merges reproduces an independent in-JVM greedy BPE") {
    // plain-Scala reference BPE over the same word-frequency table
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var words: Map[Vector[String], Long] =
      wf.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (k, vs) => k -> vs.values.sum }
    val expected = (1 to 3).map { it =>
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; Seq(a, b) <- syms.sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + f
      val ((l, r), c) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.groupBy { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
          else { out += syms(i); i += 1 }
        }
        out.result()
      }.map { case (k, vs) => k -> vs.values.sum }
      (it, l, r, l + r, c)
    }
    val got = LearnQueries.qBpeMerges(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expected)
  }

  test("q_bpe_encode's token histogram matches the in-JVM BPE segmentation") {
    // same reference BPE as the merges test, but keep the segmented words
    // and roll up the token histogram after all 3 merges
    val wf = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var words: Map[Vector[String], Long] =
      wf.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (k, vs) => k -> vs.values.sum }
    for (_ <- 1 to 3) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- words; Seq(a, b) <- syms.sliding(2))
        pc((a, b)) = pc.getOrElse((a, b), 0L) + f
      val ((l, r), _) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      words = words.groupBy { case (syms, _) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { out += l + r; i += 2 }
          else { out += syms(i); i += 1 }
        }
        out.result()
      }.map { case (k, vs) => k -> vs.values.sum }
    }
    val hist = scala.collection.mutable.Map[String, Long]()
    for ((syms, f) <- words; t <- syms) hist(t) = hist.getOrElse(t, 0L) + f
    val expected = hist.toSeq.sortBy { case (t, n) => (-n, t) }.take(30)
      .map { case (t, n) => (t, t.length, n) }
    val got = LearnQueries.qBpeEncode(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("q_kneser_ney is a proper distribution: Σ_w2 P_KN(w2|w1) = 1") {
    // rebuild the integer count tables in-engine, then check the mass
    // identity exactly in BigDecimal for the three largest w1 contexts
    val tk = Tables.documents(spark, sfDir)
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("tk"))
      .filter(size(col("tk")) >= 2)
    val bigrams = tk.select(explode(expr(
      "transform(sequence(0, size(tk)-2), i -> struct(tk[i] AS w1, tk[i+1] AS w2))")).as("b"))
      .select("b.w1", "b.w2").groupBy("w1", "w2").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val cw1 = bigrams.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n1f = bigrams.groupBy(_._1._1).map { case (w, m) => w -> m.size.toLong }
    val n1b = bigrams.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val t = bigrams.size.toLong
    for (w1 <- cw1.toSeq.sortBy(-_._2).take(3).map(_._1)) {
      // discounted mass over OBSERVED continuations + interpolation mass
      // over the FULL continuation vocabulary = exactly 1
      val den = BigDecimal(4L * cw1(w1) * t)
      val obs = bigrams.collect { case ((a, b), c) if a == w1 =>
        BigDecimal((4 * c - 3) * t) / den
      }.sum
      // valuesIterator, NOT .keys.map: keys is a Set, and mapping a Set to
      // the per-w2 contribution would deduplicate equal terms before summing
      val interp = n1b.valuesIterator.map(nb =>
        BigDecimal(3L * n1f(w1) * nb) / den).sum
      val total = obs + interp
      assert((total - 1).abs < BigDecimal("1e-20"), s"mass for '$w1' = $total")
    }
  }

  test("q_gram_matrix matches in-JVM dot products and has PSD diagonal") {
    val grams = LearnQueries.qGramMatrix(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val d = 64
    assert(grams.size == d * (d + 1) / 2)
    assert(grams.forall { case ((i, j), _) => i <= j })
    assert((0 until d).forall(i => grams((i, i)) >= 0.0))
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    for ((i, j) <- Seq((0, 0), (0, 1), (5, 63), (63, 63))) {
      val ref = vecs.map(v => v(i) * v(j)).sum
      assert(math.abs(grams((i, j)) - ref) < 1e-4, s"cell ($i,$j)")
    }
  }

  test("q_kmeans_step assigns every vector to its true nearest centroid") {
    val out = LearnQueries.qKmeansStep(spark, sfDir).collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == n, "clusters must partition the corpus")
    // in-JVM argmin over the same init set
    val all = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val cents = all.filter(_._1 < 8)
    val sizes = all.map { case (_, v) =>
      cents.minBy { case (cid, c) =>
        (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, cid)
      }._1
    }.groupBy(identity).map { case (cid, xs) => cid -> xs.length.toLong }
    val got = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == sizes)
  }

  test("q_gopher_repetition fractions are in (0,1] and flags match thresholds") {
    val rows = LearnQueriesGopherAccess.rows(spark, sfDir)
    assert(rows.nonEmpty)
    for ((f2, f3, f4, g2, g3, g4) <- rows) {
      assert(f2 > 0 && f2 <= 1.0 && f3 > 0 && f4 > 0)
      // r6 rounding keeps the flag consistent except exactly at the
      // boundary; thresholds are compared in integer space in-query, so
      // re-derive with a tolerance band here
      assert(g2 == (f2 > 0.20) || math.abs(f2 - 0.20) < 1e-6)
      assert(g3 == (f3 > 0.18) || math.abs(f3 - 0.18) < 1e-6)
      assert(g4 == (f4 > 0.16) || math.abs(f4 - 0.16) < 1e-6)
    }
  }

  test("q_triangles matches in-JVM brute-force triangle enumeration") {
    val rows = Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val edges = (for {
      t <- rows.toSeq
      tk = t.split(' ')
      (a, b) <- tk.zip(tk.drop(1))
      if a.nonEmpty && b.nonEmpty && a != b
    } yield (if (a < b) (a, b) else (b, a))).toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val tris = for {
      (a, b) <- edges
      c <- adj(a) intersect adj(b)
    } yield Seq(a, b, c).sorted
    val perNode = tris.toSeq.distinct.flatten.groupBy(identity)
      .map { case (v, xs) => v -> xs.length.toLong }
    val expected = perNode.toSeq.sortBy { case (v, n) => (-n, v) }.take(15)
    val got = AnalyticsQueries.qTriangles(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("q_pca_power replicates in-JVM power iterations on the rounded Gram") {
    val out = LearnQueries.qPcaPower(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    val vecs = Tables.embeddings(spark, sfDir).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val d = 64
    val g = Array.tabulate(d, d) { (i, j) =>
      BigDecimal(vecs.map(v => v(i) * v(j)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble // r6 is HALF_UP
    }
    val v1 = Array.tabulate(d)(j => (0 until d).map(i => g(i)(j)).sum)
    val v2 = Array.tabulate(d)(j => (0 until d).map(i => g(i)(j) * v1(i)).sum)
    val v3 = Array.tabulate(d)(j => (0 until d).map(i => g(i)(j) * v2(i)).sum)
    for (((dim, gv1, gv2, ratio), k) <- out.zipWithIndex) {
      assert(dim == k)
      assert(math.abs(gv1 - v1(k)) < 1e-4, s"v1($k)")
      assert(math.abs(gv2 - v2(k)) < 1e-2, s"v2($k)")
      assert(math.abs(ratio - v3(k) / v2(k)) < 1e-4, s"ratio($k)")
    }
    // the TRUE Rayleigh quotient (v3·v2)/(v2·v2) is bounded by λ_max,
    // itself bounded by the max absolute row sum (per-component ratios
    // v3_j/v2_j are NOT so bounded — they can overshoot near small v2_j)
    val rayleigh = v3.zip(v2).map { case (a, b) => a * b }.sum /
      v2.map(x => x * x).sum
    val bound = (0 until d).map(i => (0 until d).map(j => math.abs(g(i)(j))).sum).max
    assert(rayleigh <= bound + 1e-6 && rayleigh > 0)
  }

  test("q_substring_dup matches in-JVM shingle + interval-union reference") {
    val k = 10
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(' ').toVector)
      .filter(_._2.length >= k).toMap
    val shingleDocs = scala.collection.mutable.Map[String, Set[Long]]()
    for ((d, tk) <- docs; i <- 0 to tk.length - k) {
      val g = tk.slice(i, i + k).mkString(" ")
      shingleDocs(g) = shingleDocs.getOrElse(g, Set.empty) + d
    }
    val dupSet = shingleDocs.collect { case (g, ds) if ds.size >= 2 => g }.toSet
    val expected = (for ((d, tk) <- docs.toSeq) yield {
      val ivs = (0 to tk.length - k)
        .filter(i => dupSet(tk.slice(i, i + k).mkString(" ")))
        .map(i => (i.toLong, (i + k - 1).toLong))
      if (ivs.isEmpty) None else {
        val merged = ivs.sorted.foldLeft(List.empty[(Long, Long)]) {
          case (acc @ ((s0, e0) :: rest), (s, e)) =>
            if (s <= e0) (s0, math.max(e0, e)) :: rest else (s, e) :: acc
          case (Nil, iv) => iv :: Nil
        }
        val dupTokens = merged.map { case (s, e) => e - s + 1 }.sum
        Some((d, tk.length.toLong, merged.length.toLong, dupTokens,
          BigDecimal(dupTokens.toDouble / tk.length)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }).flatten.sortBy { case (d, _, _, _, ratio) => (-ratio, d) }.take(25)
    val got = DedupQueries.qSubstringDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(got == expected)
  }

  test("q_pps_sample matches an in-JVM sequential-Poisson reference draw") {
    def md5Hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Tables.documents(spark, sfDir).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = 281474976710656.0 // 16^12
    val ref = rows.map { case (d, w) =>
      val h = java.lang.Long.parseLong(md5Hex(d.toString).take(12), 16)
      (d, w, h.toDouble / m / w)
    }.sortBy { case (d, _, p) => (p, d) }.take(50)
      .map { case (d, w, p) =>
        (d, w, BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq
    val got = SimilarityQueries.qPpsSample(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == ref)
    // weighting sanity: the PPS draw must skew toward longer docs
    val sampleMean = got.map(_._2).sum.toDouble / got.size
    val corpusMean = rows.map(_._2).sum.toDouble / rows.length
    assert(sampleMean > corpusMean, s"sample mean $sampleMean <= corpus mean $corpusMean")
  }

  test("q_cogroup (typed) matches the declarative left-join+agg spelling") {
    // Row.get returns java.time.LocalDateTime for the declarative plan but
    // java.sql.Timestamp from the tuple-encoder typed plan — same instant,
    // different box; canonicalize before comparing
    def canonTs(r: Seq[Any]): Seq[Any] = r.map {
      case t: java.sql.Timestamp => t.toLocalDateTime.toString
      case t: java.time.LocalDateTime => t.toString
      case x => x
    }
    val typed = JoinQueries.qCogroup(spark, sfDir).collect().map(r => canonTs(r.toSeq)).toSeq
    val c = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
    val declarative = c.join(o, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,4)")).cast("double").as("total_spent"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy(col("total_spent").desc_nulls_last, col("c_custkey")).limit(25)
      .collect().map(r => canonTs(r.toSeq)).toSeq
    assert(typed == declarative)
    // the typed path must also surface zero-order customers as NULL spend
    // when any exist at this scale (not silently drop them)
    val zeroOrder = c.join(o, col("o_custkey") === col("c_custkey"), "left_anti").count()
    val nullSpendShown = typed.count(r => r(3) == null)
    assert(zeroOrder == 0 || nullSpendShown > 0 || typed.size == 25)
  }

  test("q_sort_paginate returns exactly rows 101-120 of the full sort") {
    val page = SortSetQueries.qSortPaginate(spark, sfDir).collect()
      .map(_.getLong(0)).toSeq
    val full = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("k"),
        col("o_totalprice"))
      .orderBy(col("k").asc_nulls_last, col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.getLong(0)).toSeq
    assert(page == full.slice(100, 120))
  }

  test("q_unigram_lm replays the full Viterbi lattice in-JVM") {
    val docs = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(_.split(" ", -1)).filter(w => w.nonEmpty && w.length <= 12)
    val wf = words.groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val pc = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wf; i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)) {
      val p = w.substring(i, i + l)
      pc(p) = pc.getOrElse(p, 0L) + c
    }
    val kept = pc.filter { case (p, c) => c >= 500 || p.length == 1 }.toMap
    val tot = kept.values.sum
    def lp(p: String): BigDecimal =
      BigDecimal(math.log(kept(p).toDouble) - math.log(tot.toDouble))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)
    val expect = wf.map { case (w, c) =>
      val L = w.length
      val dp = Array.fill[Option[(BigDecimal, String)]](L + 1)(None)
      dp(0) = Some((BigDecimal(0), ""))
      for (j <- 1 to L; l <- 1 to math.min(4, j); p = w.substring(j - l, j)
           if kept.contains(p); prev <- dp(j - l)) {
        val cand = (prev._1 + lp(p), prev._2 + "|" + p)
        dp(j) = dp(j) match {
          case None => Some(cand)
          case Some(cur) =>
            if (cand._1 > cur._1 || (cand._1 == cur._1 && cand._2 < cur._2)) Some(cand)
            else Some(cur)
        }
      }
      val (sc, path) = dp(L).getOrElse(fail(s"word '$w' unsegmentable in reference"))
      val seg = path.drop(1)
      w -> ((c, seg, seg.split("\\|").length.toLong,
        BigDecimal(sc.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = LearnQueries.qUnigramLm(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == expect,
      s"unigram mismatch; e.g. ${(got.keySet ++ expect.keySet).take(3).map(k => (k, got.get(k), expect.get(k)))}")
    // segmentations concatenate back to the original word
    for ((w, (_, seg, _, _)) <- got) assert(seg.split("\\|").mkString == w)
  }

  test("q_unigram_lm is optimal: brute-force enumeration of every segmentation agrees") {
    // structurally independent of the DP (the replay test above shares the
    // Viterbi recurrence, so a recurrence bug could pass both): enumerate
    // ALL compositions of each word into pieces of length 1..4, keep the
    // in-vocab ones, and take max score / lexicographically-first path.
    val docs = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val words = docs.flatMap(_.split(" ", -1)).filter(w => w.nonEmpty && w.length <= 12)
    val wf = words.groupBy(identity).map { case (w, a) => w -> a.length.toLong }
    val pc = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wf; i <- 0 until w.length; l <- 1 to math.min(4, w.length - i)) {
      val p = w.substring(i, i + l)
      pc(p) = pc.getOrElse(p, 0L) + c
    }
    val kept = pc.filter { case (p, c) => c >= 500 || p.length == 1 }.toMap
    val tot = kept.values.sum
    def lp(p: String): BigDecimal =
      BigDecimal(math.log(kept(p).toDouble) - math.log(tot.toDouble))
        .setScale(14, BigDecimal.RoundingMode.HALF_UP)
    def segmentations(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(4, w.length)).flatMap { l =>
        val head = w.substring(0, l)
        if (!kept.contains(head)) Nil
        else segmentations(w.substring(l)).map(head :: _)
      }
    val got = LearnQueries.qUnigramLm(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    for ((w, (seg, score)) <- got) {
      val all = segmentations(w)
        .map(ps => (ps.map(lp).foldLeft(BigDecimal(0))(_ + _), ps.mkString("|")))
      assert(all.nonEmpty, s"'$w' has no in-vocab segmentation")
      val best = all.minBy { case (sc, path) => (-sc, path) }
      assert(seg == best._2, s"'$w': Viterbi '$seg' != brute-force '${best._2}'")
      val bestScore = BigDecimal(best._1.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(score == bestScore, s"'$w': score $score != brute-force $bestScore")
    }
  }

  test("q_unigram_refit re-counts exactly the Viterbi segmentations") {
    val seg = LearnQueries.qUnigramLm(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getString(2)))
    val expect = scala.collection.mutable.Map.empty[String, Long]
    for ((c, s) <- seg; p <- s.split("\\|")) expect(p) = expect.getOrElse(p, 0L) + c
    val got = LearnQueries.qUnigramRefit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    for ((p, _, nc, keep) <- got) {
      assert(nc == expect.getOrElse(p, 0L), s"piece '$p' new_cnt $nc")
      assert(keep == (nc > 0))
    }
    // every piece a segmentation uses is in the candidate table, and the
    // EM prune signal actually fires (some candidates go unused)
    assert(expect.keySet.subsetOf(got.map(_._1).toSet))
    assert(got.exists(!_._4), "no pruned pieces — prune signal untested")
  }
}

/** Tiny accessor so the gopher test reads typed fields without repeating
  * column positions inline.
  */
object LearnQueriesGopherAccess {
  def rows(s: org.apache.spark.sql.SparkSession, dir: String)
      : Seq[(Double, Double, Double, Boolean, Boolean, Boolean)] =
    TextQueries.qGopherRepetition(s, dir).collect().toSeq.map(r =>
      (r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
}
