package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

import graft.{SparkSpec, Tables}

/** Distributed prefix sum ≡ the single-partition window, with no
  * unpartitioned Window node in the plan.
  */
class PrefixSumSpec extends SparkSpec {

  test("cumsum equals the global-window cumulative sum") {
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val expected = freq
      .withColumn("cum", sum(col("freq")).over(
        Window.orderBy(col("freq").desc, col("token"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    val got = PrefixSum.cumsum(
        freq, col("freq"), Seq(col("freq").desc, col("token")), "cum", partitions = 7)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("Lineage.actualBytes: Some(>0) for a truncated frame, None otherwise") {
    // the r16 width-correction signal: a localCheckpoint'd frame reports
    // its REAL stored size; an un-truncated plan must report unknown
    // (None), never zero — the PrefixSum resize treats None as no-op
    val df = Tables.customer(spark, sfDir).select(col("c_custkey"))
    assert(Lineage.actualBytes(df).isEmpty)
    val t = Lineage.truncate(df)
    val b = Lineage.actualBytes(t)
    assert(b.exists(_ > 0L), s"expected stored bytes for a truncated frame, got $b")
    // join-bearing estimate vs actual: the estimate path PrefixSum guards
    // against really does blow up (sanity-pin the mechanism, not a value)
    val joined = df.crossJoin(broadcast(Tables.nation(spark, sfDir)))
    val est = joined.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est > b.get, "join-bearing estimate unexpectedly below the actual base size")
  }

  test("cumsum under the reliable-checkpoint flag matches and writes checkpoint files") {
    // the multi-consumer materialization inside scanAgg goes through
    // Lineage.truncate (r10 verdict item): with the flag set, the range-
    // partitioned frame must take the reliable checkpoint() path — an
    // executor loss mid-query on a preemptible cluster then recomputes
    // from the checkpoint instead of failing the query
    val df = graft.io.Seeds.fromMaps(spark, (1 to 40).map(i =>
      Map[String, Any]("k" -> f"k$i%02d", "v" -> i)))
    spark.conf.set(Lineage.FlagKey, "true")
    val dir = java.nio.file.Files.createTempDirectory("graft_ps_reliable").toString
    spark.conf.set(Lineage.DirKey, dir)
    try {
      val got = PrefixSum.cumsum(df, col("v"), Seq(col("k")), "cum", partitions = 5)
        .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("cum"))).toMap
      val expected = (1 to 40).map(i => f"k$i%02d" -> (1 to i).map(_.toLong).sum).toMap
      assert(got == expected)
      val active = new java.net.URI(
        spark.sparkContext.getCheckpointDir.get).getPath
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(active))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $active")
    } finally {
      spark.conf.set(Lineage.FlagKey, "false")
    }
  }

  test("cumsum works for a single partition and preserves column set") {
    val df = graft.io.Seeds.fromMaps(spark, Seq(
      Map("k" -> "a", "v" -> 5), Map("k" -> "b", "v" -> 3), Map("k" -> "c", "v" -> 2)))
    val out = PrefixSum.cumsum(df, col("v"), Seq(col("k")), "cum", partitions = 1)
    assert(out.columns.sorted.toSeq == Seq("cum", "k", "v"))
    val rows = out.orderBy("k").collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("cum")))
    assert(rows.toSeq == Seq(("a", 5L), ("b", 8L), ("c", 10L)))
  }

  test("cumsum carries decimal values exactly across partition boundaries") {
    import org.apache.spark.sql.types.DecimalType
    val df = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice").cast(DecimalType(12, 4)).as("price"))
    val expected = df
      .withColumn("cum", sum(col("price")).over(
        Window.orderBy(col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getDecimal(2))).toMap
    val got = PrefixSum.cumsum(df, col("price"), Seq(col("o_orderkey")), "cum", partitions = 5)
      .collect().map(r => (r.getLong(0), r.getDecimal(2))).toMap
    assert(got.size == expected.size)
    assert(got.forall { case (k, v) => expected(k).compareTo(v) == 0 })
  }

  test("every Window node in the plan has a partition spec (no global window)") {
    val freq = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("freq"))
    val plan = PrefixSum.cumsum(
        freq, col("freq"), Seq(col("freq").desc, col("token")), "cum")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }

  test("property: cumsum equals scanLeft for random inputs and partition counts") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
      parts <- Gen.chooseNum(1, 8)
    } yield (vals, parts)
    // few cases (each spins Spark jobs), random shapes incl. duplicates
    val prop = Prop.forAllNoShrink(gen) { case (vals, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
      val got = PrefixSum.cumsum(df, col("v"), Seq(col("k")), "cum", partitions = parts)
        .orderBy("k").collect().map(_.getAs[Long]("cum")).toSeq
      val expected = vals.scanLeft(0L)(_ + _).tail
      got == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("cummin/cummax match sequential scans across random partitionings") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val gen = for {
      vals <- Gen.nonEmptyListOf(Gen.chooseNum(-1000L, 1000L))
      parts <- Gen.chooseNum(1, 8)
    } yield (vals, parts)
    val prop = Prop.forAllNoShrink(gen) { case (vals, parts) =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
      val gotMin = PrefixSum.cummin(df, col("v"), Seq(col("k")), "cm", partitions = parts)
        .orderBy("k").collect().map(_.getAs[Long]("cm")).toSeq
      val gotMax = PrefixSum.cummax(df, col("v"), Seq(col("k")), "cm", partitions = parts)
        .orderBy("k").collect().map(_.getAs[Long]("cm")).toSeq
      gotMin == vals.scanLeft(Long.MaxValue)(math.min).tail &&
        gotMax == vals.scanLeft(Long.MinValue)(math.max).tail
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(r.passed, r.status.toString)
  }

  test("q_vocab_coverage plans no unpartitioned window") {
    val plan = graft.queries.TextQueries.qVocabCoverage(spark, sfDir)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.forall(_.partitionSpec.nonEmpty))
  }
}
