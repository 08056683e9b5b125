package graft.ops

import graft.SparkSpec
import graft.io.Seeds

/** ETLState semantics (C1): unseen passes, committed is filtered, state
  * accumulates across batches, in-batch dups collapse.
  */
class DedupStateSpec extends SparkSpec {

  test("filterNew → commit → filterNew drops previously seen keys") {
    val state = tmpDir("state") + "/s1"
    val batch1 = Seeds.fromMaps(spark, Seq(
      Map("k" -> "a", "v" -> 1), Map("k" -> "b", "v" -> 2)))
    val fresh1 = DedupState.filterNew(spark, batch1, state, Seq("k"))
    assert(fresh1.count() == 2)
    DedupState.commit(spark, fresh1, state, Seq("k"))
    assert(DedupState.stateSize(spark, state) == 2)

    val batch2 = Seeds.fromMaps(spark, Seq(
      Map("k" -> "a", "v" -> 99), // same key, different payload field order-independent
      Map("k" -> "c", "v" -> 3)))
    val fresh2 = DedupState.filterNew(spark, batch2, state, Seq("k"))
    assert(fresh2.select("k").collect().map(_.getString(0)).toSet == Set("c"))
  }

  test("in-batch duplicates collapse to one row") {
    val state = tmpDir("state") + "/s2"
    val batch = Seeds.fromMaps(spark, Seq(
      Map("k" -> "x"), Map("k" -> "x"), Map("k" -> "y")))
    assert(DedupState.filterNew(spark, batch, state, Seq("k")).count() == 2)
  }

  test("state dir records its identity mode; a mismatched flag fails fast") {
    val state = tmpDir("state") + "/s_mode"
    val batch = Seeds.fromMaps(spark, Seq(Map("k" -> "café")))
    DedupState.commit(spark, batch, state, Seq("k"), nfc = true)
    // matching mode keeps working, marker is invisible to the parquet scan
    assert(DedupState.stateSize(spark, state) == 1)
    assert(DedupState.filterNew(spark, batch, state, Seq("k"), nfc = true).count() == 0)
    // a mismatched caller corrupts incremental dedup silently — must throw
    val e1 = intercept[IllegalArgumentException] {
      DedupState.filterNew(spark, batch, state, Seq("k"))
    }
    assert(e1.getMessage.contains("identity mode"))
    val e2 = intercept[IllegalArgumentException] {
      DedupState.commit(spark, batch, state, Seq("k"))
    }
    assert(e2.getMessage.contains("identity mode"))
  }

  test("a marker-only state dir (commit crashed before its data write) is empty state") {
    val state = tmpDir("state") + "/s_crash"
    val batch = Seeds.fromMaps(spark, Seq(Map("k" -> "a")))
    // simulate the crash window: the mode marker landed, the parquet didn't
    val p = new org.apache.hadoop.fs.Path(state, "_graft_identity_mode")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write("raw".getBytes("UTF-8")); out.close()
    assert(DedupState.stateSize(spark, state) == 0)
    assert(DedupState.filterNew(spark, batch, state, Seq("k")).count() == 1)
    // the stamped mode still guards a wrong-mode retry
    intercept[IllegalArgumentException] {
      DedupState.filterNew(spark, batch, state, Seq("k"), nfc = true)
    }
    // a correct-mode retry completes the interrupted commit
    DedupState.commit(spark, batch, state, Seq("k"))
    assert(DedupState.stateSize(spark, state) == 1)
  }

  test("contentHash(nfc) refuses columns with nested strings") {
    val df = spark.sql(
      """SELECT 'a' AS s, array('x', 'y') AS arr,
        |named_struct('t', 'z', 'n', 1) AS st, 7 AS num""".stripMargin)
    // top-level string + stringless columns: fine
    assert(df.select(Identity.contentHash(df, Seq("s", "num"), nfc = true)).count() == 1)
    val e = intercept[IllegalArgumentException] {
      df.select(Identity.contentHash(df, Seq("s", "arr"), nfc = true)).collect()
    }
    assert(e.getMessage.contains("arr"))
    val e2 = intercept[IllegalArgumentException] {
      df.select(Identity.contentHash(df, Seq("st"), nfc = true)).collect()
    }
    assert(e2.getMessage.contains("st"))
    // raw-byte identity never restricts types
    assert(df.select(Identity.contentHash(df, Nil)).count() == 1)
  }

  test("memoize computes once and serves from cache after") {
    val memo = tmpDir("memo")
    var computes = 0
    def producer = {
      computes += 1
      Seeds.fromRange(spark, 10)
    }
    val a = Memoize.cached(spark, memo, "range", Seq(10))(producer)
    val b = Memoize.cached(spark, memo, "range", Seq(10))(producer)
    assert(a.count() == 10 && b.count() == 10)
    assert(computes == 1)
    assert(Memoize.isCached(spark, memo, "range", Seq(10)))
    assert(!Memoize.isCached(spark, memo, "range", Seq(11)))
  }

  test("memo keys are injective across arg-boundary ambiguity") {
    assert(Memoize.argsKey("p", Seq("a|b")) != Memoize.argsKey("p", Seq("a", "b")))
    assert(Memoize.argsKey("p|a", Seq("b")) != Memoize.argsKey("p", Seq("a", "b")))
    assert(Memoize.argsKey("p", Seq("a", "b")) == Memoize.argsKey("p", Seq("a", "b")))
  }
}
