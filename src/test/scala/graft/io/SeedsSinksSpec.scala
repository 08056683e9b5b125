package graft.io

import graft.SparkSpec

/** Seed sources (S1) and dataset sinks (K2). */
class SeedsSinksSpec extends SparkSpec {

  test("fromMaps infers a union schema across heterogeneous seeds") {
    val df = Seeds.fromMaps(spark, Seq(
      Map("a" -> 1, "b" -> "x"),
      Map("a" -> 2, "c" -> 3.5),
      Map("a" -> 3, "d" -> List(1, 2), "e" -> Map("k" -> "v"))))
    assert(df.count() == 3)
    assert(df.columns.toSet == Set("a", "b", "c", "d", "e"))
    assert(df.filter(df("b").isNull).count() == 2) // missing keys → null
  }

  test("fromJsonFile reads both NDJSON and a multiLine array") {
    val dir = tmpDir("seeds")
    val nd = s"$dir/x.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nd),
      "{\"i\": 1}\n{\"i\": 2}\n")
    assert(Seeds.fromJsonFile(spark, nd).count() == 2)
    val arr = s"$dir/y.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(arr),
      "[{\"i\": 1}, {\"i\": 2}, {\"i\": 3}]")
    assert(Seeds.fromJsonFile(spark, arr, multiLine = true).count() == 3)
  }

  test("append accumulates parts; overwrite replaces (ETLDataset add/update)") {
    val path = tmpDir("sink") + "/ds"
    Sinks.append(Seeds.fromRange(spark, 10), path)
    Sinks.append(Seeds.fromRange(spark, 5), path)
    assert(spark.read.parquet(path).count() == 15)
    Sinks.overwrite(Seeds.fromRange(spark, 3), path)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("json and csv sinks round-trip through the matching source") {
    val df = Seeds.fromRange(spark, 20)
    val jsonPath = tmpDir("sink-json") + "/t"
    Sinks.appendJson(df, jsonPath)
    assert(spark.read.json(jsonPath).count() == 20)
    val csvPath = tmpDir("sink-csv") + "/t"
    Sinks.appendCsv(df, csvPath)
    assert(spark.read.option("header", "true").csv(csvPath).count() == 20)
  }

  test("appendDedup writes only unseen keys and reports the count") {
    val path = tmpDir("sink2") + "/ds"
    assert(Sinks.appendDedup(spark, Seeds.fromRange(spark, 10), path, Seq("idx")) == 10)
    assert(Sinks.appendDedup(spark, Seeds.fromRange(spark, 15), path, Seq("idx")) == 5)
    assert(spark.read.parquet(path).count() == 15)
  }

  test("partitioned append lays out hive-style partitions") {
    val path = tmpDir("sink3") + "/ds"
    val df = Seeds.fromMaps(spark, Seq(
      Map("k" -> "a", "v" -> 1), Map("k" -> "b", "v" -> 2)))
    Sinks.appendPartitioned(df, path, Seq("k"))
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("k=")))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("partitioned reads PRUNE: a partition filter reaches the scan") {
    val path = tmpDir("sink4") + "/ds"
    val df = Seeds.fromMaps(spark, (1 to 20).map(i =>
      Map("k" -> s"p${i % 4}", "v" -> i)))
    Sinks.appendPartitioned(df, path, Seq("k"))
    val q = spark.read.parquet(path).filter(org.apache.spark.sql.functions.col("k") === "p1")
    val plan = q.queryExecution.executedPlan.toString
    // the partition filter must land INSIDE the scan's PartitionFilters
    // entry (pruned at planning) — the key alone is always printed (empty
    // brackets when nothing pruned), so assert the filter's column appears
    // within the brackets, not merely somewhere in the plan
    assert("PartitionFilters: \\[[^\\]]*k#".r.findFirstIn(plan).isDefined,
      s"partition filter not pushed into the scan:\n$plan")
    assert(q.count() == 5)
  }

  test("joins against a partitioned fact prune partitions DYNAMICALLY") {
    import org.apache.spark.sql.functions.col
    // The 100 TB shape: fact partitioned on the join key, dim filtered at
    // runtime. Static pruning can't help (the filter is on the DIM side);
    // dynamic partition pruning must inject the dim's surviving keys into
    // the fact scan's PartitionFilters, or the fact scan reads everything.
    val path = tmpDir("dpp") + "/fact"
    val fact = Seeds.fromMaps(spark, (1 to 100).map(i =>
      Map("k" -> s"p${i % 10}", "v" -> i)))
    Sinks.appendPartitioned(fact, path, Seq("k"))
    val dim = Seeds.fromMaps(spark, (0 until 10).map(i =>
      Map("k" -> s"p$i", "grp" -> (i % 2))))
    val q = spark.read.parquet(path).join(dim.filter(col("grp") === 0), "k")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning on the fact scan:\n$plan")
    assert(q.count() == 50) // grp=0 keeps the 5 even partitions × 10 rows
  }

  test("compact rewrites many small part files into few, preserving rows") {
    val path = tmpDir("sink5") + "/ds"
    // 12 appends of 1-partition frames -> >= 12 small part files
    (1 to 12).foreach { i =>
      Sinks.append(Seeds.fromMaps(spark, Seq(Map("i" -> i))).coalesce(1), path)
    }
    val rowsBefore = spark.read.parquet(path).collect().map(_.getLong(0)).sorted.toSeq
    val (before, after) = Sinks.compact(spark, path, targetFileBytes = 64L << 20)
    assert(before >= 12 && after == 1, s"expected 12+ -> 1 files, got $before -> $after")
    val rowsAfter = spark.read.parquet(path).collect().map(_.getLong(0)).sorted.toSeq
    assert(rowsAfter == rowsBefore)
  }

  test("upsert updates matched keys, inserts new ones, carries the rest") {
    val path = tmpDir("sink8") + "/ds"
    Sinks.overwrite(Seeds.fromMaps(spark, Seq(
      Map("k" -> 1, "v" -> "a"), Map("k" -> 2, "v" -> "b"), Map("k" -> 3, "v" -> "c"))), path)
    val updates = Seeds.fromMaps(spark, Seq(
      Map("k" -> 2, "v" -> "B2"), Map("k" -> 9, "v" -> "NEW")))
    val (updated, inserted) = Sinks.upsert(spark, path, updates, Seq("k"))
    assert(updated == 1L && inserted == 1L)
    val got = spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "NEW"))
    // duplicate-key updates are rejected, and the table is untouched
    intercept[IllegalArgumentException] {
      Sinks.upsert(spark, path, Seeds.fromMaps(spark, Seq(
        Map("k" -> 5, "v" -> "x"), Map("k" -> 5, "v" -> "y"))), Seq("k"))
    }
    assert(spark.read.parquet(path).count() == 4)
    // schema drift is rejected
    intercept[IllegalArgumentException] {
      Sinks.upsert(spark, path, Seeds.fromMaps(spark, Seq(Map("k" -> 5, "other" -> "x"))), Seq("k"))
    }
    // first write creates the table
    val fresh = tmpDir("sink9") + "/ds"
    assert(Sinks.upsert(spark, fresh, updates, Seq("k")) == ((0L, 2L)))
  }

  test("compact no-ops on a missing path and rejects partitioned layouts") {
    assert(Sinks.compact(spark, tmpDir("sink6") + "/never_written") == ((0, 0)))
    val path = tmpDir("sink7") + "/ds"
    Sinks.appendPartitioned(Seeds.fromMaps(spark, Seq(
      Map("k" -> "a", "v" -> 1), Map("k" -> "b", "v" -> 2))), path, Seq("k"))
    intercept[IllegalArgumentException] { Sinks.compact(spark, path) }
  }
}
