package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.Identity

/** Semantic invariants the oracle cannot see — engine-internal ground
  * truths: LSH recall vs in-engine brute force, sessionization as a
  * partition of events, identity-column properties.
  */
class InvariantsSpec extends SparkSpec {

  test("minhash LSH finds exactly the brute-force Jaccard≥0.8 pairs at sf0.001") {
    val lsh = SimilarityQueries.qMinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // in-engine brute force: every shared-shingle pair with exact jaccard
    val docs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
        .as("shingle"))
    val sizes = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = docs.as("a")
      .join(docs.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .filter(col("inter").cast("double") /
        (col("sa.n") + col("sb.n") - col("inter")) >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("q_hostile_semantics probes carry the hostile values they claim to") {
    // the gate proves ENGINE AGREEMENT; this pins what the agreed values
    // ARE, at the bit level the parquet/DuckDB canon can't see
    val rows = AdvancedQueries.qHostileSemantics(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    // the merged ±0.0 group keys as +0.0 — raw bits all zero, not the
    // sign-bit-set -0.0 (repr-visible to the gate, but assert the bits)
    val negZero = rows("negzero_key")
    assert(negZero.getLong(1) == 2, "both zero spellings must merge")
    assert(java.lang.Double.doubleToRawLongBits(negZero.getDouble(3)) == 0L)
    // both NaNs form one group of two among five total groups
    val g = rows("nan_zero_groups")
    assert(g.getLong(1) == 5 && g.getLong(2) == 2)
    // NaN sorts last, -Infinity first, and max-min propagates NaN
    assert(java.lang.Double.isNaN(rows("nan_sort").getDouble(3)))
    assert(rows("inf_sort_first").getDouble(3) == Double.NegativeInfinity)
    assert(java.lang.Double.isNaN(rows("nan_minmax").getDouble(3)))
    // the emoji really is one char / four UTF-8 bytes, and survives upper()
    val e = rows("utf8_emoji")
    assert(e.getLong(1) == 3 && e.getLong(2) == 6)
    assert(e.getString(4) == "A😀B")
    assert(rows("utf8_substr").getString(4).codePointAt(0) == 0x1F600)
    // real parquet text passed through 4-byte wrapping: byte len exceeds
    // char len by exactly the 8 emoji bytes minus 2 emoji chars per doc
    // only if the text itself is ASCII — assert the diff is at least 4·(8-2)
    val d = rows("utf8_docs")
    assert(d.getLong(2) - d.getLong(1) >= 4 * 6)
    // the 10 MiB doc is really 10 MiB
    assert(rows("big_doc").getLong(1) == 10485760L)
    // NaN met real data: max over the mixed slice is NaN, distinct < count
    val n = rows("nan_in_data")
    assert(java.lang.Double.isNaN(n.getDouble(3)) && n.getLong(2) < n.getLong(1))
  }

  test("q_hostile_relational pins the join/set-op edge semantics it claims") {
    val rows = AdvancedQueries.qHostileRelational(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    def n(p: String) = rows(p).getLong(1)
    // equality join: NaN matches NaN (the ONLY common key between the
    // hostile frames), NULL never matches
    assert(n("nan_join") == 1)
    // left join keeps the NULL-key row AND the unmatched finite row
    assert(n("left_join_null_rows") == 2)
    // null-safe equality adds the NULL=NULL match
    assert(n("nullsafe_join") == 2)
    // anti-join keeps the NULL-key row (no match can be proven)
    assert(n("anti_join_keeps_null") == 2)
    // set ops treat NULL and NaN as equal under distinct-semantics
    assert(n("intersect_null_nan") == 2)
    assert(java.lang.Double.isNaN(rows("intersect_null_nan").getDouble(2)))
    // exact multiset semantics: min(3,2) and 3-1
    assert(n("intersect_all_mult") == 2 && n("except_all_mult") == 2)
    assert(n("dup_join_mult") == 6)
    // GROUPING disambiguates the source-NULL group from the total row
    assert(n("rollup_null_group") == 1 && n("rollup_total_row") == 2)
    // the NaN-salted self-join really has a quadratic NaN block: pairs
    // must be at least the NaN count squared
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("event_id") < 300 && col("event_id") % 7 === 0).count()
    assert(n("nan_join_real") >= ev * ev && ev > 0)
  }

  test("q_hostile_window pins the ordering edge semantics it claims") {
    val rows = AdvancedQueries.qHostileWindow(spark, sfDir).collect()
    val ord = rows.filter(_.getString(0) == "ordered")
      .sortBy(_.getLong(1)).toSeq
    // NULLS FIRST, then -Inf, the tied 1.0s, NaN last
    assert(ord.head.isNullAt(2) && ord.head.getDouble(6) == -99.0) // lag default
    assert(ord(1).getDouble(2) == Double.NegativeInfinity)
    assert(ord(2).getLong(3) == 3 && ord(3).getLong(3) == 3) // rank ties
    assert(java.lang.Double.isNaN(ord(4).getDouble(2)))
    assert(ord(4).getLong(3) == 5 && ord(4).getLong(4) == 4) // rank 5, dense 4
    // first_value ignore nulls skips the NULL to -Inf on every row
    assert(ord.forall(_.getDouble(7) == Double.NegativeInfinity))
    // fractional RANGE frame: 1.5 absorbs 1.0; 3.0 stands alone
    val rng = rows.filter(_.getString(0) == "range_frame")
      .map(r => r.getDouble(2) -> r.getDouble(7)).toMap
    assert(rng(1.5) == 2.5 && rng(3.0) == 3.0)
    // NaN-salted DESC top-k: NaN outranks every finite value
    val topk = rows.filter(r => r.getString(0) == "salted_topk" && r.getLong(1) == 1)
    assert(topk.nonEmpty && topk.forall(r => java.lang.Double.isNaN(r.getDouble(2))))
  }

  test("q_hostile_datetime pins the calendar edges it claims") {
    val rows = AdvancedQueries.qHostileDatetime(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    def dt(p: String) = rows(p).getDate(1).toString
    assert(dt("leap_add_year") == "2025-02-28")   // leap day clamps
    assert(dt("eom_add_month") == "2024-02-29")   // end-of-month clamps INTO leap day
    assert(dt("last_day_leap") == "2024-02-29")
    assert(dt("trunc_week_monday") == "2026-08-10") // Sunday truncates to prior Monday
    assert(rows("iso_week_jan1").getLong(3) == 1)
    assert(rows("iso_week_dec31").getLong(3) == 53)
    assert(rows("iso_week_next_jan1").getLong(3) == 53) // ISO: 2027-01-01 belongs to 2026's week 53
    assert(rows("pre_epoch_micros").getLong(3) == -1L)
    assert(rows("pre_epoch_trunc").getTimestamp(2).toString.startsWith("1969-12-31 00:00:00"))
    assert(rows("year_9999").getLong(3) == 1)
    // the real-data ISO-weekday histogram covers the full slice
    val dow = rows.keys.filter(_.startsWith("iso_dow_"))
    assert(dow.nonEmpty)
    assert(dow.map(k => rows(k).getLong(3)).sum ==
      graft.Tables.events(spark, sfDir).filter(col("event_id") < 2000).count())
  }

  test("q_hostile_numeric pins the arithmetic edge rules it claims") {
    val rows = AdvancedQueries.qHostileNumeric(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    // half rounds AWAY FROM ZERO: 2.5 -> 3 and -2.5 -> -3 (3 + -3*0.001)
    assert(rows("round_half_dbl").getDouble(2) == 2.997)
    assert(rows("round_half_dec").getString(3) == "3.0000")
    assert(rows("round_dec_125").getString(3) == "0.1300")
    // modulo sign = dividend's: (-1)*100 + 1*10 + (-1)
    assert(rows("mod_signs").getLong(1) == -91)
    // integer division truncates toward zero, not floor
    assert(rows("int_div_trunc").getLong(1) == -2)
    assert(rows("pow_zero_zero").getDouble(2) == 1.0)
    assert(java.lang.Double.isNaN(rows("pow_neg_frac").getDouble(2)))
    assert(rows("greatest_null").getLong(1) == 1 && rows("least_null").getLong(1) == 1)
    assert(rows("dec_widen").getString(3) == "1.005000")
    assert(rows("floor_ceil_neg_half").getLong(1) == -10) // floor -1, ceil 0
    // two's complement: 6*10000 + 8*100 + 14 + (-13)
    assert(rows("bit_ops").getLong(1) == 60801)
    assert(rows("shifts").getLong(1) == (1L << 62) - 4)
    // the aggregates really ran over the slice
    val slice = graft.Tables.events(spark, sfDir).filter(col("event_id") < 2000)
    val xorRef = slice.select(col("event_id")).collect().map(_.getLong(0)).reduce(_ ^ _)
    assert(rows("agg_bit_xor").getLong(1) == xorRef)
    assert(rows("agg_dec_sum").getString(3).matches("""-?\d+\.\d{4}"""))
  }

  test("q_hostile_string pins the text-function edge rules it claims") {
    val rows = AdvancedQueries.qHostileString(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    def s(p: String) = rows(p).getString(2)
    assert(s("substr_negative") == "ll")       // negative start counts from end
    assert(s("pad_cycle_trunc") == "abab7|7xyx|hel") // pad cycles; overlong truncates
    assert(s("repeat_zero_neg") == "[|]")      // zero and negative both empty
    assert(s("left_overlong") == "hello")
    assert(s("translate_delete") == "xyyx")    // unmapped 'c' deleted
    assert(s("regex_split") == "a|b|c")
    assert(rows("instr_pos").getLong(1) == 10) // first match 1-based; absent = 0
    assert(s("reverse_4byte") == "b😀a")       // char-wise, 4-byte char intact
    assert(s("trim_charset") == "x|a|a")
    assert(s("split_part_oob") == "[b|]")      // past-the-end field is ''
    assert(s("concat_ws_null") == "a,b")       // ws variant skips NULL
    assert(s("regex_nomatch") == "[123|]")     // no-match extract is '' not NULL
    assert(s("regex_replace_all") == "aXbX")   // Spark replaces ALL (oracle spells 'g')
    // real-data rollups really covered the slice
    assert(rows("doc_regex_tokens").getLong(1) > 0)
    assert(rows("doc_instr_rollup").getLong(1) > 0)
  }

  test("q_hostile_collection pins the array/map/json edge rules it claims") {
    val rows = AdvancedQueries.qHostileCollection(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    def s(p: String) = rows(p).getString(2)
    assert(s("sort_nulls_last") == "[1,3,N]")   // array_sort: NULLs last
    assert(s("sort_nulls_first") == "[N,1,3]")  // sort_array ASC: NULLs first
    assert(s("slice_mid") == "2,3,4" && s("slice_negative") == "4,5")
    assert(rows("position_absent").getLong(1) == 20) // found 2, absent 0
    assert(rows("contains_present").getLong(1) == 1)
    assert(rows("contains_null_probe").getLong(1) == 1) // NULL probe -> NULL
    assert(s("sorted_distinct") == "1,2,3")
    assert(s("json_nested") == "7" && s("json_array_idx") == "2")
    assert(rows("json_missing").getLong(1) == 1)
    assert(rows("map_lookup").getLong(1) == 11) // found 1*10, missing NULL -> +1
    assert(rows("doc_token_position").getLong(1) > 0)
    assert(s("doc_sorted_tokens").split("\\|").length == 5)
  }

  test("sessionization partitions events exactly: Σ session sizes = row count") {
    val sessions = AdvancedQueries.qSessionize(spark, sfDir)
    val total = sessions.agg(sum("n_events")).collect().head.getLong(0)
    val events = Tables.events(spark, sfDir).count()
    assert(total == events)
    // within a session, duration is consistent with bounds
    val bad = sessions.filter(col("session_end") - col("session_start") =!= col("duration_sec")).count()
    assert(bad == 0)
  }

  test("identity content hash is deterministic and field-order sensitive by design") {
    val docs = Tables.documents(spark, sfDir).limit(10)
    val h1 = Identity.withIdentity(docs, "id1", Seq("doc_id", "text"))
      .select("id1").collect().map(_.getString(0)).toSeq
    val h2 = Identity.withIdentity(docs, "id2", Seq("doc_id", "text"))
      .select("id2").collect().map(_.getString(0)).toSeq
    assert(h1 == h2) // deterministic across runs
    val swapped = Identity.withIdentity(docs, "id3", Seq("text", "doc_id"))
      .select("id3").collect().map(_.getString(0)).toSeq
    assert(h1 != swapped) // canonical form fixes field order at the call site
    // uniqueId really is unique per row
    val uniq = docs.select(Identity.uniqueId.as("u")).collect().map(_.getString(0))
    assert(uniq.distinct.length == uniq.length)
  }

  test("q_pack is partition-count invariant (PrefixSum total order)") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def packs(parts: String): Map[Long, (Long, Long, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try TextQueries.all("q_pack")._1(spark, sfDir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    val p1 = packs("1")
    val p7 = packs("7")
    assert(p1 == p7, "pack assignment depends on partitioning")
    assert(p1.nonEmpty)
    // packing covers every doc exactly once
    val total = p1.values.map(_._1).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("hash sampling is stable across runs and subsets the corpus") {
    val a = SimilarityQueries.qHashSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = SimilarityQueries.qHashSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
    val total = Tables.documents(spark, sfDir).count()
    assert(a.values.sum < total && a.values.sum > 0)
  }

  test("skyline is exactly the non-dominated set (in-JVM brute force)") {
    val pts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(Exact.dsum(col("o_totalprice")).as("spend"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominates(q: (Long, Double, Long), p: (Long, Double, Long)): Boolean =
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)
    val expected = pts.filter(p => !pts.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = AnalyticsQueries.qSkyline(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got == expected, s"missing ${expected -- got}, extra ${got -- expected}")
  }

  test("weighted median satisfies both cumulative-weight inequalities") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getAs[Number](2).longValue))
    val got = AnalyticsQueries.qWeightedMedian(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((flag, m) <- got) {
      val grp = rows.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      val below = grp.filter(_._2 < m).map(_._3).sum   // strictly below
      val upTo = grp.filter(_._2 <= m).map(_._3).sum   // at or below
      assert(2 * upTo >= tot, s"$flag: median too low")
      assert(2 * below < tot, s"$flag: median too high")
    }
  }

  test("coreset greedy matches an in-JVM farthest-point reference (exact decimals)") {
    // independent reimplementation of Gonzalez greedy with the SAME
    // decimal-term arithmetic as the decimal_sqdist kernel: per-term
    // BigDecimal.valueOf((x-y)^2).setScale(14, HALF_UP), summed exactly
    import java.math.{BigDecimal => JBD, RoundingMode}
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def sqdist(a: Array[Double], b: Array[Double]): JBD =
      a.indices.foldLeft(JBD.ZERO) { (acc, i) =>
        val d = a(i) - b(i)
        acc.add(JBD.valueOf(d * d).setScale(14, RoundingMode.HALF_UP))
      }
    var sel = Vector(vecs.keys.min)
    val radii = Vector.newBuilder[JBD]
    for (_ <- 1 until 8) {
      val (id, md) = vecs.keysIterator.filterNot(sel.contains).map { v =>
        v -> sel.map(c => sqdist(vecs(v), vecs(c))).min
      }.reduceLeft { (p, q) =>
        val c = q._2.compareTo(p._2)
        if (c > 0 || (c == 0 && q._1 < p._1)) q else p
      }
      sel = sel :+ id
      radii += md
    }
    val got = LearnQueries.qCoreset(spark, sfDir).collect()
      .sortBy(_.getInt(0))
    assert(got.length == 9)
    assert(got.head.isNullAt(2) && got.head.getLong(1) == vecs.keys.min)
    val gotIds = got.slice(1, 8).map(_.getLong(1)).toVector
    assert(gotIds == sel.drop(1), s"pick order: got $gotIds want ${sel.drop(1)}")
    // radius sequence non-increasing, and coverage <= last pick's radius
    val r = got.slice(1, 9).map(_.getDouble(2))
    assert(r.zip(r.tail).forall { case (a, b) => a >= b }, s"radii increase: ${r.toSeq}")
    // the reference radii agree after the same r6 rounding
    val want = radii.result().map(d =>
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.slice(0, 7).toVector == want, s"radii: got ${r.toSeq} want $want")
  }

  test("count-min verdicts hold and the sketch never undercounts any key") {
    val rows = AnalyticsQueries.qCountMin(spark, sfDir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"undercount for user ${r.getLong(0)}")
      assert(r.getBoolean(3), s"error bound broken for user ${r.getLong(0)}")
      assert(r.getBoolean(4), "merge not exact")
    }
  }

  test("label propagation is deterministic across runs and conserves nodes") {
    def run() = AnalyticsQueries.qLabelProp(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(); val b = run()
    assert(a == b, "LPA result depends on run/shuffle order")
    assert(a.nonEmpty)
    // top-20 community sizes cannot exceed the node count
    val nodes = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 3)
      .select(explode(array(col("o_custkey") * 2, col("l_suppkey") * 2 + 1)).as("n"))
      .distinct().count()
    assert(a.map(_._2).sum <= nodes)
  }

  test("q_scd2_pit assigns every purchase its sequentially-replayed status") {
    // independent reference: replay each user's event stream in (ts,
    // event_id) order, tracking the current status run; the status at a
    // purchase is the run's type, the run start its status_since.
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val expected = ev.groupBy(_._2).flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._1))
      // segment starts: events whose type differs from the previous event
      val starts = sorted.zipWithIndex.collect {
        case ((_, _, ts, tpe), i) if i == 0 || sorted(i - 1)._4 != tpe => (ts, tpe)
      }
      // interval semantics: status at t = LAST segment with start <= t
      // (duplicate-ts starts collapse to the later one, matching the
      // half-open-interval join where the superseded segment is empty)
      sorted.toSeq.collect { case (id, _, ts, "purchase") =>
        val (since, status) = starts.filter(!_._1.after(ts)).last
        id -> ((status, since))
      }
    }
    val got = AdvancedQueries.qScd2Pit(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(3), r.getTimestamp(4)))).toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size} purchases")
    assert(got == expected.toMap)
  }

  test("q_hits matches an in-JVM replay of the mutual-reinforcement rounds") {
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 3)
      .select(col("o_custkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h1 = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val a1 = edges.groupBy(_._2).map { case (k, v) => k -> v.map(e => h1(e._1)).sum }
    val h2 = edges.groupBy(_._1).map { case (k, v) => k -> v.map(e => a1(e._2)).sum }
    val a2 = edges.groupBy(_._2).map { case (k, v) => k -> v.map(e => h2(e._1)).sum }
    def top(m: Map[Long, Long]) =
      m.toSeq.sortBy { case (n, sc) => (-sc, n) }.take(15)
    val got = AnalyticsQueries.qHits(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.filter(_._1 == "hub").map(t => (t._2, t._3)).toSeq == top(h2))
    assert(got.filter(_._1 == "authority").map(t => (t._2, t._3)).toSeq == top(a2))
  }

  test("q_containment rows recompute exactly from in-JVM shingle sets") {
    val rows = SimilarityQueries.qContainment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty, "no containment pairs at this sf — test data drifted?")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val tk = r.getString(1).split(" ", -1)
        r.getLong(0) -> tk.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.toMap
    def r6d(d: Double) = new java.math.BigDecimal(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rows.foreach { case (a, b, na, nb, inter, cab, cba) =>
      val sa = docs(a); val sb = docs(b)
      assert(na == sa.size.toLong && nb == sb.size.toLong)
      val i = (sa intersect sb).size.toLong
      assert(inter == i, s"pair ($a,$b) inter $inter vs $i")
      assert(cab == r6d(i.toDouble / sa.size) && cba == r6d(i.toDouble / sb.size))
      assert(inter <= math.min(na, nb))
      assert(math.max(cab, cba) >= 0.6)
    }
  }

  test("q_survivorship keeps exactly one best doc per cluster, consistent with q_dedup_clusters") {
    val rows = SimilarityQueries.qSurvivorship(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4), r.getString(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cluster, members) =>
      assert(members.count(_._4) == 1, s"cluster $cluster canonical count != 1")
      val canon = members.find(_._4).get
      // canonical maximizes (n_chars, -doc_id)
      members.foreach { m =>
        assert(m._3 < canon._3 || (m._3 == canon._3 && m._2 >= canon._2),
          s"cluster $cluster: ${m._2} beats canonical ${canon._2}")
        assert(if (m._4) m._5 == "keep" else m._5 == "drop_near_dup")
      }
    }
    // membership agrees with q_dedup_clusters' (cluster, size) report
    val sizes = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val expected = SimilarityQueries.qDedupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes == expected)
  }

  test("q_market_basket matches an in-JVM basket replay") {
    val items = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = items.map(_._1).distinct.length.toLong
    val cnt = items.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val pairCnt = items.groupBy(_._1).toSeq.flatMap { case (_, its) =>
      val brands = its.map(_._2).sorted
      for (i <- brands.indices; j <- (i + 1) until brands.length)
        yield (brands(i), brands(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 >= 20)
    def r6d(d: Double) = new java.math.BigDecimal(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val expected = pairCnt.toSeq.map { case ((a, b), nab) =>
      (a, b, nab, cnt(a), cnt(b), r6d(nab.toDouble * n / (cnt(a) * cnt(b))))
    }.sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(30)
    val got = AnalyticsQueries.qMarketBasket(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(8))).toSeq
    assert(got == expected)
  }

  test("q_attribution replays the 7-day touch windows sequentially") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val clicksByUser = ev.filter(_._4 == "click").groupBy(_._2)
    val sevenDaysMs = 7L * 24 * 3600 * 1000
    val expected = ev.filter(_._4 == "purchase").map { case (pid, u, pts, _) =>
      val touches = clicksByUser.getOrElse(u, Array.empty)
        .filter { case (_, _, cts, _) =>
          cts.getTime <= pts.getTime && cts.getTime > pts.getTime - sevenDaysMs }
      val lastId = if (touches.isEmpty) None else {
        val maxTs = touches.map(_._3.getTime).max
        Some(touches.filter(_._3.getTime == maxTs).map(_._1).max)
      }
      pid -> ((touches.length.toLong, lastId))
    }.toMap
    val got = AnalyticsQueries.qAttribution(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(3),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))).toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("q_seasonality indexes average to 1 under volume weighting") {
    val rows = AnalyticsQueries.qSeasonality(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (dw, hr, n, si, vi) =>
      assert(dw >= 1 && dw <= 7 && hr >= 0 && hr <= 23)
      assert(n > 0 && si > 0 && vi > 0)
    }
    val totalN = rows.map(_._3).sum.toDouble
    // volume-weighted mean of the seasonal index is the grand mean ratio = 1
    val weighted = rows.map { case (_, _, n, si, _) => n * si }.sum / totalN
    assert(math.abs(weighted - 1.0) < 1e-3, s"weighted seasonal index $weighted")
    // volume_index is the cell's share of volume relative to uniform: n·168/totalN
    rows.foreach { case (dw, hr, n, _, vi) =>
      val expectedVi = BigDecimal(n * 168.0 / totalN)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(vi - expectedVi) < 1e-9, s"volume_index at ($dw,$hr)")
    }
  }

  test("q_churn_features labels agree with a sequential cutoff replay") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val cutoff = ev.map(_._2).max - 7L * 24 * 3600 * 1000
    val pre = ev.filter(_._2 < cutoff).groupBy(_._1)
    val postUsers = ev.filter(_._2 >= cutoff).map(_._1).toSet
    val got = AnalyticsQueries.qChurnFeatures(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(8))).toSeq
    assert(got.map(_._1).toSet == pre.keySet, "feature rows = users with pre-cutoff history")
    got.foreach { case (u, nEvents, churned) =>
      assert(nEvents == pre(u).length.toLong, s"user $u n_events")
      assert(churned == !postUsers.contains(u), s"user $u label")
    }
  }

  test("q_forecast_baseline replays the lag-168 errors sequentially") {
    val hourly = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("hour", col("ts")).as("hr")).collect()
      .map(_.getTimestamp(0).getTime)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val maxTs = Tables.events(spark, sfDir).agg(max(col("ts")))
      .collect().head.getTimestamp(0).getTime
    val evalStart = maxTs - 7L * 24 * 3600 * 1000
    val lag = 168L * 3600 * 1000
    val target = hourly.filter(_._1 >= evalStart)
    val scoredErrs = target.toSeq.flatMap { case (hr, x) =>
      hourly.get(hr - lag).map(f => (math.abs(x - f), x - f))
    }
    val got = AnalyticsQueries.qForecastBaseline(spark, sfDir).collect().head
    assert(got.getLong(0) == target.size.toLong)
    assert(got.getLong(1) == scoredErrs.size.toLong)
    assert(got.getLong(2) == scoredErrs.map(_._1).sum)
    assert(got.getLong(3) == scoredErrs.map(_._2).sum)
    assert(got.getDouble(7) > 0.0 && got.getDouble(7) <= 1.0)
  }

  test("q_conformal's quantile replays sequentially and coverage honors the guarantee") {
    val hourly = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(date_trunc("hour", col("ts")).as("hr")).collect()
      .map(_.getTimestamp(0).getTime)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val maxTs = Tables.events(spark, sfDir).agg(max(col("ts")))
      .collect().head.getTimestamp(0).getTime
    val evalStart = maxTs - 7L * 24 * 3600 * 1000
    val lag = 168L * 3600 * 1000
    val scored = hourly.toSeq.flatMap { case (hr, x) =>
      hourly.get(hr - lag).map(f => (hr, math.abs(x - f)))
    }
    val cal = scored.filter(_._1 < evalStart).map(_._2).sorted
    val k = (9 * (cal.length + 1) + 9) / 10
    val qHat = cal(math.min(k, cal.length) - 1)
    val ev = scored.filter(_._1 >= evalStart)
    val covered = ev.count(_._2 <= qHat)
    val got = AnalyticsQueries.qConformal(spark, sfDir).collect().head
    assert(got.getLong(0) == cal.length.toLong)
    assert(got.getLong(1) == qHat)
    assert(got.getLong(2) == ev.length.toLong && got.getLong(3) == covered.toLong)
    // the finite-sample guarantee, with slack for a small eval window
    assert(got.getDouble(4) >= 0.75, s"conformal coverage ${got.getDouble(4)} < 0.75")
  }

  test("RRF output is ranked consistently with its component ranks") {
    val rows = TextQueries.qRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), Option(r.getAs[Integer]("rank_lex")),
        Option(r.getAs[Integer]("rank_vec")), r.getDouble(3)))
    assert(rows.nonEmpty)
    // every row retrieved by at least one ranker; scores non-increasing
    assert(rows.forall { case (_, l, v, _) => l.isDefined || v.isDefined })
    val scores = rows.map(_._4).toSeq
    assert(scores == scores.sorted.reverse, "rrf_score not non-increasing")
    // a doc in both lists must outscore a doc appearing in neither list
    // position better than 60+rank identity: spot-check the score formula
    for ((_, l, v, s) <- rows.take(5)) {
      val expect = l.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        v.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(s - expect) < 1e-6)
    }
  }

  test("q_line_dedup replays exactly from an in-JVM segmentation of the corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // in-JVM reference: 8-word non-overlapping segments, df >= 2 dropped,
    // survivors rejoined in order
    val segsOf = (t: String) => t.split(" ", -1).grouped(8).map(_.mkString(" ")).toVector
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, t) <- docs; s <- segsOf(t).distinct)
      df(s) = df.getOrElse(s, Set.empty) + id
    val boiler = df.collect { case (s, ids) if ids.size >= 2 => s }.toSet
    val expect = docs.flatMap { case (id, t) =>
      val segs = segsOf(t)
      val kept = segs.filterNot(boiler)
      val dropped = segs.size - kept.size
      if (dropped == 0) None
      else {
        val nt = kept.mkString(" ")
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(nt.getBytes("UTF-8")).map("%02x".format(_)).mkString
        Some(id -> ((segs.size.toLong, dropped.toLong, nt.length.toLong, sha)))
      }
    }
    val got = TextQueries.qLineDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(got == expect, s"line-dedup mismatch: got ${got.size} docs, expected ${expect.size}")
    assert(expect.nonEmpty, "reference found no boilerplate — test is vacuous")
  }

  test("q_image_phash finds exactly the brute-force hamming<=3 pairs, all planted pairs included") {
    // in-JVM reference hashes from the generator formula (no codec): the
    // banded join must equal the full quadratic scan at the threshold
    def hashOf(id: Long): (Long, Long) = {
      val base = id - (id % 2); val odd = id % 2 == 1
      val blocks = new Array[Long](64)
      for (i <- 0 until 256) {
        var g = ((base * 37 + i * 11) % 256).toInt
        if (odd && i % 16 == 0) g = (g + 2) % 256
        blocks((i / 32) * 8 + (i % 16) / 2) += 3L * g
      }
      val tot = blocks.sum
      var hi = 0L; var lo = 0L
      for (k <- 0 until 64 if blocks(k) * 64 > tot)
        if (k < 32) hi |= 1L << k else lo |= 1L << (k - 32)
      (hi, lo)
    }
    val hs = (0L until 60L).map(id => id -> hashOf(id)).toMap
    def ham(a: Long, b: Long) = {
      val (ah, al) = hs(a); val (bh, bl) = hs(b)
      java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
    }
    val brute = (for (a <- 0L until 60L; b <- a + 1 until 60L if ham(a, b) <= 3)
      yield (a, b, ham(a, b).toLong)).toSet
    val got = NorthStarQueries.qImagePhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}: " +
      s"missing ${brute -- got}, extra ${got -- brute}")
    // every planted pair (2k, 2k+1) survives the perceptual hash
    val planted = (0L until 30L).map(k => (2 * k, 2 * k + 1)).toSet
    val gotPairs = got.map(t => (t._1, t._2))
    assert(planted.subsetOf(gotPairs), s"planted lost: ${planted -- gotPairs}")
  }

  test("q_feature_hashing replays the md5 dims, signs, and signed counts in-JVM") {
    val docs = graft.Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val acc = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((id, t) <- docs; tok <- t.split(" ", -1) if tok.nonEmpty) {
      val h = md5hex(tok)
      val dim = java.lang.Long.parseLong(h.substring(0, 3), 16) % 64
      val sign = if (Integer.parseInt(h.substring(3, 4), 16) < 8) 1L else -1L
      val (n, w) = acc.getOrElse((id, dim), (0L, 0L))
      acc((id, dim)) = (n + 1, w + sign)
    }
    val expect = acc.filter(_._2._2 != 0).toMap
    val got = TextQueries.qFeatureHashing(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(expect.nonEmpty, "reference produced no features — vacuous")
    assert(got == expect, s"mismatch: got ${got.size} cells, expected ${expect.size}")
  }

  test("q_hard_negatives: labels, margins, and hardest-negative choice are consistent") {
    val rows = SimilarityQueries.qHardNegatives(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byAnchor = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byAnchor) {
      val qLabel = rs.head.getAs[Number](1).longValue
      // every negative is cross-label, the positive is fixed per anchor
      assert(rs.forall(_.getAs[Number](4).longValue != qLabel),
        "negative shares the anchor label")
      assert(rs.map(_.getLong(6)).distinct.length == 1, "pos_id varies within anchor")
      // ranks are 1..n and neg_cos is non-increasing in rank
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to rs.length).toSeq)
      val negCos = sorted.map(_.getDouble(5)).toSeq
      assert(negCos == negCos.sorted.reverse, "neg_cos not ranked")
      // margin is exactly round6(neg_cos - pos_cos)
      for (r <- rs) {
        val m = BigDecimal(r.getDouble(5) - r.getDouble(7))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(8) == m, s"margin ${r.getDouble(8)} != $m")
      }
    }
    // the rank-1 negative beats (or ties) every cross-label cosine found by
    // an independent in-engine brute force (no window, no join-back — a
    // different plan over the same kernel, whose HOF identity FunctionsSpec
    // already pins bit-for-bit)
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val hof = "decimal_dot(%s, %s)"
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("nrm", expr(s"SQRT(${hof.format("embedding", "embedding")})"))
    val anchors = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_norm"))
    val best = anchors.crossJoin(e)
      .filter(col("q_id") =!= col("vec_id") && col("label") =!= col("q_label"))
      .select(col("q_id"),
        round(expr(hof.format("q_emb", "embedding")) / (col("q_norm") * col("nrm")), 6).as("c"))
      .groupBy("q_id").agg(max(col("c")).as("mx"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((a, rs) <- byAnchor) {
      val top = rs.minBy(_.getInt(2))
      assert(top.getDouble(5) == best(a),
        s"anchor $a: rank-1 neg_cos ${top.getDouble(5)} != brute-force max ${best(a)}")
    }
  }

  test("q_ivf_rerank: ranks partition the shortlist and exact distances recompute") {
    val rows = SimilarityQueries.qIvfRerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for ((_, rs) <- rows.groupBy(_.getLong(0))) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to rs.length).toSeq)
      val d = sorted.map(_.getDouble(3)).toSeq
      assert(d == d.sorted, "exact_dist not non-decreasing in rank")
      for (r <- rs)
        assert(r.getBoolean(5) == (r.getInt(4) != r.getInt(1)), "moved flag wrong")
    }
    // exact_dist recomputes from the stored vectors with the kernel
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val e = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val pairs = rows.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    val emb = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for ((qid, vid, d) <- pairs) {
      val acc = emb(qid).zip(emb(vid)).foldLeft(BigDecimal(0)) { case (s, (a, b)) =>
        val diff = a.toDouble - b.toDouble
        // the kernel squares in IEEE double, THEN casts to DECIMAL(28,14)
        s + BigDecimal(diff * diff).setScale(14, BigDecimal.RoundingMode.HALF_UP)
      }
      val expect = BigDecimal(acc.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(d == expect, s"($qid,$vid): exact_dist $d != replay $expect")
    }
  }

  // ---- hostile-corpus gates: the oracle proves ENGINE AGREEMENT; these
  // pin what the agreed values ARE, so a both-engines-wrong drift in the
  // degenerate-document semantics cannot pass silently.

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private val shaEmpty = sha256Hex("")

  test("q_hostile_corpus_dedup: planted pairs and degenerate shingle counts are exact") {
    val rows = HostileCorpusQueries.qHostileCorpusDedup(spark, sfDir).collect()
    val pairs = rows.filter(r => r.getString(0) == "pair" && r.getLong(1) >= 9000000L)
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    // mono↔seed and 10MiB↔seed share their single shingle (J=1.0); the
    // exact duplicate is 1.0; the 20-common-word near-dups score 18/20
    assert(pairs == Map(
      (9000003L, 9000009L) -> 1.0, (9000004L, 9000010L) -> 1.0,
      (9000006L, 9000008L) -> 1.0,
      (9000006L, 9000007L) -> 0.9, (9000007L, 9000008L) -> 0.9), s"pairs: $pairs")
    val sh = rows.filter(_.getString(0) == "shingles")
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    // empty doc EXCLUDED (0); whitespace/mono/10MiB/UTF-8/seed docs each
    // collapse to ONE distinct shingle; the 21-word docs have 19
    assert(sh == Map(
      9000001L -> 0.0, 9000002L -> 1.0, 9000003L -> 1.0, 9000004L -> 1.0,
      9000005L -> 1.0, 9000006L -> 19.0, 9000007L -> 19.0, 9000008L -> 19.0,
      9000009L -> 1.0, 9000010L -> 1.0), s"shingles: $sh")
  }

  test("q_hostile_corpus_lines: the one-segment seeds delete whole degenerate docs") {
    val rows = HostileCorpusQueries.qHostileCorpusLines(spark, sfDir).collect()
      .filter(_.getLong(0) >= 9000000L)
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    // 12 500 identical segments in the mono and 10 MiB docs all match the
    // single-seg seed doc → both reassemble to the EMPTY string
    assert(rows(9000003L) == ((12500L, 12500L, 0L, shaEmpty)))
    assert(rows(9000004L) == ((12500L, 12500L, 0L, shaEmpty)))
    // exact-dup pair drops whole; the near-dup keeps exactly its tail seg
    assert(rows(9000006L) == ((3L, 3L, 0L, shaEmpty)))
    assert(rows(9000008L) == ((3L, 3L, 0L, shaEmpty)))
    assert(rows(9000007L) == ((3L, 2L, 21L, sha256Hex("w17 w18 w19 w20 uniqb"))))
    assert(rows(9000009L) == ((1L, 1L, 0L, shaEmpty)))
    assert(rows(9000010L) == ((1L, 1L, 0L, shaEmpty)))
    // WITHIN-doc repetition is not boilerplate (df counts distinct docs):
    // the UTF-8 doc's 6 identical segments survive → doc absent here,
    // as are the empty and whitespace docs (unique degenerate segments)
    assert(!rows.contains(9000005L) && !rows.contains(9000001L) && !rows.contains(9000002L))
  }

  test("q_hostile_corpus_chunk: window arithmetic on empty/degenerate/100k-token docs") {
    val rows = HostileCorpusQueries.qHostileCorpusChunk(spark, sfDir).collect()
      .filter(_.getLong(0) >= 9000000L)
      .groupBy(_.getLong(0))
    def shas(id: Long) = rows(id).map(_.getString(3)).toSet
    // the empty doc is ONE chunk of its single empty token; whitespace's 4
    // empty tokens rejoin to the original three spaces
    assert(rows(9000001L).length == 1 && shas(9000001L) == Set(shaEmpty))
    assert(rows(9000002L).length == 1 && shas(9000002L) == Set(sha256Hex("   ")))
    // both 100 000-token docs: exactly 2083 chunks, every one 64 tokens
    // (2082·48+64 = 100000 — the last window lands exactly full) and all
    // chunk texts identical
    for (id <- Seq(9000003L, 9000004L)) {
      assert(rows(id).length == 2083, s"$id chunk count")
      assert(rows(id).map(_.getInt(2)).toSet == Set(64), s"$id chunk widths")
      assert(shas(id).size == 1, s"$id chunk texts should all repeat")
    }
    // the 4-byte-UTF-8 doc: one 50-token chunk, sha of the exact bytes
    val em3 = new String(Character.toChars(0x1F600)) * 3
    assert(rows(9000005L).length == 1 && rows(9000005L).head.getInt(2) == 50)
    assert(shas(9000005L) == Set(sha256Hex(Seq.fill(50)(em3).mkString(" "))))
  }

  test("q_hostile_corpus_segment: run pieces, symmetric scores, and the engineered tie") {
    val rows = HostileCorpusQueries.qHostileCorpusSegment(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getString(2), r.getLong(3), r.getDouble(4)))).toMap
    val em3 = new String(Character.toChars(0x1F600)) * 3
    assert(rows("aaaaaaaaaaaa")._1 == "aaaa|aaaa|aaaa", "12-char run segments as 3×aaaa")
    assert(rows(em3) == ((em3, 1L, rows(em3)._3)), "4-byte-char word stays one piece")
    // abab/baba plant symmetric piece counts → their Viterbi scores tie
    assert(rows("abab")._3 == rows("baba")._3, "symmetric words must score identically")
    assert(rows("abab")._1 == "abab" && rows("baba")._1 == "baba")
    // 'juklm': all four 2-piece paths tie EXACTLY (every piece count = 7);
    // the lexicographic path tie-break must pick 'jukl|m' ('|' sorts
    // above letters, so longest-first-piece is the smallest path string)
    assert(rows("juklm") == (("jukl|m", 2L, rows("juklm")._3)), s"tie-break: ${rows("juklm")}")
    assert(rows("q")._1 == "q" && rows("q")._2 == 1L)
  }

  test("q_hostile_embedding: screen verdicts, exact ±1.0 cosines, and the kernel crash") {
    val rows = HostileCorpusQueries.qHostileEmbedding(spark, sfDir).collect()
    val verdicts = rows.filter(_.getString(0) == "screen")
      .map(r => r.getLong(1) -> r.getString(3)).toMap
    assert(verdicts == Map(
      8000001L -> "zero_norm", 8000002L -> "non_finite", 8000003L -> "non_finite",
      8000004L -> "non_finite", 8000005L -> "ok", 8000006L -> "ok",
      8000007L -> "ok", 8000008L -> "dim_mismatch", 8000009L -> "zero_norm",
      8000010L -> "zero_norm", 8000011L -> "null_component",
      8000012L -> "null_embedding"), s"verdicts: $verdicts")
    // every real vector screens ok (the slice is the only degenerate data)
    val Array(nOk, nAll) = rows.filter(_.getString(0) == "real_ok")
      .flatMap(r => Seq(r.getLong(1), r.getLong(2)))
    assert(nOk == nAll && nAll == 30L)
    // scaled duplicate and antipodal pairs are EXACTLY ±1.0 through the
    // production kernel (integer-exact norms by construction: √64=8, √256=16)
    val cos = rows.filter(r => r.getString(0) == "cosine" && r.getLong(1) >= 8000000L)
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(4))).toMap
    assert(cos == Map(
      (8000005L, 8000006L) -> 1.0,
      (8000005L, 8000007L) -> -1.0,
      (8000006L, 8000007L) -> -1.0), s"cosines: $cos")
    // scaled-dup consistency on real pairs: cosine(r, const-1.0) ==
    // cosine(r, const-2.0) == -cosine(r, const-(-1.0)) for every real r
    val hc = rows.filter(r => r.getString(0) == "cosine" && r.getLong(1) < 3L &&
        r.getLong(2) >= 8000000L)
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(4)).toMap
    for (r <- 0L to 2L) {
      assert(hc((r, 8000005L)) == hc((r, 8000006L)), s"real $r: scale invariance")
      assert(hc((r, 8000005L)) == -hc((r, 8000007L)), s"real $r: antipodal negation")
    }
    // the reason the screen exists: the exact-decimal kernel is
    // UNEVALUABLE on non-finite components (BigDecimal.valueOf(NaN)
    // throws; the DuckDB decimal cast errors) — assert the crash is real,
    // so nobody "simplifies" the verdict order into scoring-then-checking
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val nanVec = spark.sql(
      "SELECT transform(sequence(1, 4), i -> CAST(CASE WHEN i = 1 THEN 'NaN' ELSE '1.0' END AS FLOAT)) AS v")
    val crash = intercept[Exception] {
      nanVec.select(expr("decimal_dot(v, v)")).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(crash).exists(_.isInstanceOf[NumberFormatException]),
      s"expected the kernel's BigDecimal NaN crash, got: $crash")
  }

  test("q_ann_screened: the wired screen is what keeps the ANN kernels alive") {
    import graft.ops.Ann
    // the SAME hostile ∪ real corpus/queries the gate uses, via the gate
    val rows = HostileCorpusQueries.qAnnScreened(spark, sfDir).collect()
    val qids = rows.map(_.getLong(0)).distinct.sorted.toSeq
    // NaN query 8000002 screened OUT (no output rows); valid hostile
    // query 8000005 ADMITTED with a full top-5
    assert(qids == Seq(0L, 1L, 2L, 3L, 4L, 8000005L), s"query ids: $qids")
    assert(rows.count(_.getLong(0) == 8000005L) == 5)
    // and the same plan UNSCREENED genuinely crashes on this corpus —
    // the kernels (or the decimal centroid build) hit the non-finite
    // rows the screen exists to stop. Rebuild the corpus inline (the
    // gate's construction is private) and run ivfTopK screenless.
    graft.functions.GraftFunctions.register(spark)
    val konst = (c: String) =>
      s"transform(sequence(1, 64), i -> CAST('$c' AS FLOAT))"
    val nanAt1 =
      "transform(sequence(1, 64), i -> CAST(CASE WHEN i = 1 THEN 'NaN' ELSE '1.0' END AS FLOAT))"
    val hostile = spark.sql(
      s"""SELECT CAST(8000002 AS BIGINT) AS vec_id, $nanAt1 AS embedding, 2 AS label
         |UNION ALL
         |SELECT CAST(8000005 AS BIGINT), ${konst("1.0")}, 5""".stripMargin)
    val corpus = hostile.unionByName(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val crash = intercept[Exception] {
      Ann.ivfTopK(spark, queries, corpus, k = 5, nprobe = 2,
        exactArith = true, screenDim = None).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(crash).exists(t => t.isInstanceOf[NumberFormatException]
        || t.getMessage != null && t.getMessage.contains("NaN")),
      s"expected the unscreened NaN crash, got: $crash")
  }

  test("q_dedup_nfc: the wired NFC pre-pass changes exactly the planted identities") {
    val v = HostileCorpusQueries.qDedupNfc(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch1 = 3 hostile + 25 real, all NFC-distinct
    assert(v("state_size_b1") == 28L, s"probes: $v")
    // NFC run: decomposed-café and letter-Å collapse onto batch-1 state
    // (cross-batch), the mark-ordered pair merges to ONE in-batch, the
    // ligature survives (NFKC-only fold) → 2 hostile + 25 real new
    assert(v("nfc_b2_new") == 27L && v("nfc_b2_new_hostile") == 2L)
    assert(v("nfc_cross_dup_dropped") == 0L && v("nfc_inbatch_merged") == 1L)
    // RAW twin: every byte-distinct spelling is "new" — the flag is the
    // only difference (5 hostile + 25 real)
    assert(v("raw_b2_new") == 30L)
  }

  test("q_shingle_nfc: NFC-LSH finds the cross-spelling pairs raw banding is blind to") {
    val rows = HostileCorpusQueries.qShingleNfc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3))
    val planted = rows.filter(_._1._2 >= 7100000L).toMap
    // NFC: composed≡decomposed duplicate at exactly 1.0; both spellings
    // near-dup the third doc at exactly 18/20
    assert(planted == Map(
      ("nfc", 7100001L, 7100002L) -> 1.0,
      ("nfc", 7100001L, 7100003L) -> 0.9,
      ("nfc", 7100002L, 7100003L) -> 0.9,
      // raw: ONLY the same-spelling (both decomposed) pair survives —
      // the cross-spelling pairs sit at 16/22 < 0.8 and never verify
      ("raw", 7100002L, 7100003L) -> 0.9), s"planted: $planted")
  }

  test("q_stream_recovery: the run provably spans a stop/restart and is exactly-once") {
    val (df, ev) = StreamingQueries.streamRecoveryRun(spark, sfDir)
    // restart evidence the SQL gate cannot see: two DISTINCT streaming
    // runs against the one checkpoint, run 2's batch ids CONTINUING past
    // run 1's (a fresh-checkpoint restart would restart at batch 0)
    assert(ev.runIds.distinct.size == 2, s"runIds: ${ev.runIds}")
    assert(ev.run1Batches.nonEmpty && ev.run2Batches.nonEmpty, ev)
    assert(ev.run2Batches.min > ev.run1Batches.max,
      s"batch ids must continue, not overlap: ${ev.run1Batches} then ${ev.run2Batches}")
    // exactly-once sink: each closed window exactly once, sums decode the
    // planted rows — [11:00,12:00) mixes a pre-stop and post-restart row
    // (state restored), [10:00,11:00) is not re-emitted by run 2 (sink
    // manifest honored), [13:00,14:00) held open (absent)
    val base = 1704067200000000L
    def ws(minute: Int) = base + minute * 60000000L
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == Set((ws(600), 2L, 3L), (ws(660), 2L, 12L)), rows.toSeq)
    assert(rows.length == 2, "no window emitted twice")
  }

  test("q_stream_recovery_dedup: dedup state survives the restart (exactly-once ids)") {
    val (df, ev) = StreamingQueries.streamRecoveryDedupRun(spark, sfDir)
    assert(ev.runIds.distinct.size == 2, s"runIds: ${ev.runIds}")
    assert(ev.run2Batches.min > ev.run1Batches.max,
      s"batch ids must continue: ${ev.run1Batches} then ${ev.run2Batches}")
    val base = 1704067200000000L
    def us(minute: Int) = base + minute * 60000000L
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    // each id once, at its FIRST event time — id=1's post-restart replay
    // (minute 610) must be swallowed by the RESTORED dedup state
    assert(rows.toSet == Set((us(600), 1L), (us(605), 2L), (us(700), 3L),
      (us(710), 4L), (us(800), 5L)), rows.toSeq)
    assert(rows.length == 5, "a replayed id was re-emitted: state lost on restart")
  }

  test("q_stream_recovery_join: the join buffer survives the restart (cross-restart match)") {
    val (df, ev) = StreamingQueries.streamRecoveryJoinRun(spark, sfDir)
    assert(ev.runIds.distinct.size == 2, s"runIds: ${ev.runIds}")
    assert(ev.run2Batches.min > ev.run1Batches.max,
      s"batch ids must continue: ${ev.run1Batches} then ${ev.run2Batches}")
    val base = 1704067200000000L
    def us(minute: Int) = base + minute * 60000000L
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // id 3 is THE probe: left row buffered pre-stop, right row arrives
    // post-restart — its presence proves the join state store was
    // restored (a fresh-state restart loses it silently, nothing crashes)
    assert(rows.toSet == Set(
      (1L, us(600), us(602)), (2L, us(605), us(640)),
      (3L, us(700), us(705)), (4L, us(710), us(715))), rows.toSeq)
    assert(rows.length == 4, "a pre-stop match was re-emitted or a probe duplicated")
  }

  test("q_stream_recovery_state: arbitrary GroupState round-trips the checkpoint") {
    val (df, ev) = StreamingQueries.streamRecoveryStateRun(spark, sfDir)
    assert(ev.runIds.distinct.size == 2, s"runIds: ${ev.runIds}")
    assert(ev.run2Batches.min > ev.run1Batches.max,
      s"batch ids must continue: ${ev.run1Batches} then ${ev.run2Batches}")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // post-restart snapshots are cumulative OVER run-1 state: k0 (n=3,
    // sum=14) and k1 (n=2, sum=4) are only reachable by adding run-2 rows
    // onto restored run-1 counters — fresh state would emit (1,8)/(1,3)
    assert(rows.toSet == Set(
      (1L, 1L, 1L), (0L, 1L, 2L),   // batch 0
      (0L, 2L, 6L),                 // batch 1 (pre-stop)
      (0L, 3L, 14L),                // batch 2 (post-restart, cumulative)
      (1L, 2L, 4L)), rows.toSeq)    // batch 3 (post-restart, cumulative)
    assert(rows.length == 5, "emission log: one row per touched (batch, key)")
  }

  test("q_stream_late: the two-watermark algebra emits exactly the planted survivors") {
    // Every value is a power of two, so each sum uniquely decodes the set
    // of rows that survived the late filter — see qStreamLate's scaladoc
    // for the clause each row exercises. The oracle proves Spark ≡ the
    // DuckDB replay; this pins what BOTH must say, so a both-sides-wrong
    // model of the watermark algebra cannot pass silently.
    val base = 1704067200000000L
    def ws(minute: Int) = base + minute * 60000000L
    val rows = StreamingQueries.qStreamLate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows == Map(
      ws(600) -> ((3L, 1L + 2L + 8L)),    // 645 ACCEPTED: filter wm lags eviction
      ws(660) -> ((1L, 16L)),             // 650 dropped (end 11:00 <= 11:05)
      ws(720) -> ((2L, 4L + 128L)),       // 720 dropped at the exact <= boundary
      ws(780) -> ((2L, 256L + 1024L))     // emitted only by the cleanup batch
    ), s"emitted: $rows")
    // open windows (ends above the final watermark) must NEVER emit
    assert(!rows.contains(ws(840)) && !rows.contains(ws(900)))
  }

  test("q_stream_outer: null-pads emit exactly when the watermark closes the window") {
    val base = 1704067200000000L
    def us(minute: Int) = base + minute * 60000000L
    val rows = StreamingQueries.qStreamOuter(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(rows == Set(
      (1L, us(600), us(605)),   // in-batch match
      (2L, us(630), us(640)),   // cross-batch late match into live state —
                                // and its second candidate at EXACTLY the
                                // filter watermark was dropped (one row)
      (3L, us(900), us(905)),   // same-batch match at high event time
      (5L, us(850), us(855)),   // matched, then watermark-evicted WITHOUT
                                // a null-pad (exactly-once outer semantics)
      (4L, us(720), -1L),       // unmatched: padded when wm crossed 12:30
      (80L, us(690), -1L)       // unmatched: padded by the cleanup batch
    ), s"got: $rows")
    // never emitted: right orphans (6, 81, 91), the never-closing left
    // (90), and the exact-boundary left (7: l_ts+30m == final wm)
    assert(!rows.exists(r => Set(6L, 7L, 81L, 90L, 91L).contains(r._1)))
  }

  test("q_stream_timeout: strict expiry, data-rescue, rebirth, boundary drops") {
    val base = 1704067200000000L
    def us(minute: Int) = base + minute * 60000000L
    val rows = StreamingQueries.qStreamTimeout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1L, 3L, us(720)),   // RESCUED: the 12:00 row landed after u1's
                           // 10:40 timeout had expired under the in-force
                           // watermark — data invocation wins, session
                           // extends, closes at the cleanup batch
      (2L, 1L, us(605)),   // first session closes at batch 1
      (2L, 1L, us(735)),   // REBORN second session, n reset, closes later
      (99L, 1L, us(750))   // closed by the cleanup batch
    ), s"closures: $rows")
    // absent: u3 (its ONLY row sits at exactly the lagged filter
    // watermark → dropped), u96 (timeout == final watermark → strict >
    // keeps it open), u97/u98 (timeouts above the final watermark)
    assert(!rows.exists(r => Set(3L, 96L, 97L, 98L).contains(r._1)))
  }

  test("q_stream_dedup_expiry: at-least-once across expiry, no refresh, inclusive evict") {
    val base = 1704067200000000L
    def us(minute: Int) = base + minute * 60000000L
    val rows = StreamingQueries.qStreamDedupExpiry(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set(
      (1L, us(600)), (1L, us(760)),  // RE-EMITTED after state expiry: the
                                     // operator is at-least-once, not
                                     // global exactly-once
      (4L, us(600)), (4L, us(720)),  // the mid-life duplicate did NOT
                                     // refresh expiry (else one emit)
      (5L, us(690)), (5L, us(780)),  // expiry == eviction wm EVICTS
                                     // (inclusive — unlike join/timeout)
      (51L, us(750)), (52L, us(810)), (53L, us(840)), (54L, us(870))
    ), s"emitted: $rows")
    // key 6: its only row sits at exactly the lagged filter watermark —
    // dropped as late input, the key never exists downstream
    assert(!rows.exists(_._1 == 6L))
  }

  test("q_stream_update: the emission log carries per-batch cumulative snapshots") {
    val base = 1704067200000000L
    def ws(minute: Int) = base + minute * 60000000L
    val rows = StreamingQueries.qStreamUpdate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // an emission LOG: [10,11) and [12,13) each appear TWICE (their
    // pre-update snapshot and the merged one), open windows appear even
    // though append mode would hold them, and the boundary-late rows
    // (10:50 and the 12:10 row at exactly the filter watermark) never
    // contribute to any snapshot
    assert(rows.toSet == Set(
      (ws(600), 2L, 3L), (ws(600), 3L, 11L),
      (ws(660), 1L, 16L),
      (ws(720), 1L, 4L), (ws(720), 2L, 68L),
      (ws(780), 1L, 128L),
      (ws(840), 1L, 32L),
      (ws(900), 1L, 1024L)), s"log: ${rows.toSet}")
    assert(rows.length == 8, "each update row emitted exactly once")
  }

  test("q_unicode_dedup: NFC merges canonical equivalents, keeps compatibility pairs") {
    val rows = HostileCorpusQueries.qUnicodeDedup(spark, sfDir).collect()
    val pairV = rows.filter(_.getString(0) == "pair")
      .map(r => ((r.getLong(1), r.getLong(2)), r.getDouble(3))).toMap
    // composed/decomposed, mark-reordered, and singleton pairs MERGE;
    // ligature and NBSP pairs (NFKC-only folds) must stay DISTINCT
    assert(pairV == Map(
      (7000001L, 7000002L) -> 1.0, (7000003L, 7000004L) -> 1.0,
      (7000005L, 7000006L) -> 1.0, (7000007L, 7000008L) -> 0.0,
      (7000009L, 7000010L) -> 0.0), s"pairs: $pairV")
    // the three merges are also visible in the distinct counts — asserted
    // RELATIVE to the measured raw-distinct count (dn == dr - 3), not as
    // absolutes, so a change to the sf0.01 document generator can't break
    // this pin while the cross-engine gate still passes. The hostile slice
    // is 10 docs; its raw texts are pairwise distinct by construction.
    val c = rows.filter(_.getString(0) == "counts").head
    val (n, dr, dn) = (c.getLong(1), c.getLong(2), c.getDouble(3).toLong)
    assert(n >= 10L && dr <= n, s"union row count: n=$n dr=$dr (10 hostile + real slice)")
    assert(dn == dr - 3, s"NFC must merge exactly the 3 canonical pairs: dr=$dr dn=$dn")
    // ASCII real text is already NFC — the fast path must not rewrite it
    assert(rows.filter(_.getString(0) == "real_changed").head.getLong(1) == 0L)
    // and the doc shas agree with an independent in-JVM NFC + sha replay
    val shas = rows.filter(_.getString(0) == "doc")
      .map(r => r.getLong(1) -> r.getString(4)).toMap
    val nfc = (t: String) =>
      java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
    assert(shas(7000001L) == sha256Hex(nfc("caf\u00e9")))
    assert(shas(7000002L) == sha256Hex(nfc("cafe\u0301")))
    assert(shas(7000003L) == sha256Hex("\u1eb9\u0301"))
    assert(shas(7000005L) == sha256Hex(nfc("\u212bngstrom")))
    assert(shas(7000007L) == sha256Hex("\ufb01sh"))
  }
}
