package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Structured Streaming semantics via MemoryStream (the in-process analog
  * of the reference's SNS/DynamoDB-stream sources, SURVEY §2.1 S3/S4):
  * drain-and-stop (AvailableNow ≙ the local runner's queue-empty exit),
  * windowed aggregation with watermark, and bounded-state dedup.
  */
// top-level so Spark's codegen can instantiate the encoder (inner case
// classes capture the suite instance and break janino compilation)
case class Ev(ts: Timestamp, user: Long, kind: String)

class StreamOpsSpec extends SparkSpec {

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 00:$min%02d:$sec%02d")

  test("Bus topics publish/subscribe and survive multi-batch drains") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Bus.publish(spark, "orders_in", Ev(ts(0), 1, "a"), Ev(ts(1), 2, "b"))
    val out = Bus.subscribe[Ev](spark, "orders_in")
      .groupBy(col("user")).agg(count(lit(1)).as("n"))
    val ckpt = tmpDir("bus-topic")
    StreamOps.runAvailableNow(
      out.writeStream.outputMode("complete").format("memory").queryName("bus_out"), ckpt)
    assert(spark.table("bus_out").count() == 2)
    // same topic name returns the same stream; new records reach a
    // restarted drain from the same checkpoint
    Bus.publish(spark, "orders_in", Ev(ts(2), 1, "c"))
    StreamOps.runAvailableNow(
      out.writeStream.outputMode("complete").format("memory").queryName("bus_out"), ckpt)
    val n = spark.table("bus_out").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n == Map(1L -> 2L, 2L -> 1L))
    Bus.delete(spark, "orders_in")
  }

  test("drain-and-stop: batch stage transforms apply to a stream unchanged") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Long]
    in.addData(1L to 100L: _*)
    // the docs-chain stages, applied to a streaming frame
    val out = in.toDF().withColumnRenamed("value", "idx")
      .withColumn("calculated_result", col("idx") * col("idx"))
      .filter(col("calculated_result") % 2 === 0)
    val ckpt = tmpDir("stream-ckpt")
    val q = StreamOps.runAvailableNow(
      out.writeStream.format("memory").queryName("drained"), ckpt)
    val rows = spark.table("drained").collect()
    assert(rows.length == 50)
    assert(q.lastProgress != null)
  }

  test("foreachBatchSink routes micro-batches through a batch writer") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Long]
    in.addData(1L to 40L: _*)
    val dir = tmpDir("fbsink") + "/out"
    val seenBatches = scala.collection.mutable.ArrayBuffer[Long]()
    StreamOps.foreachBatchSink(
      in.toDF().withColumnRenamed("value", "v"), tmpDir("fbsink-ckpt")) {
      (batch, id) =>
        seenBatches += id
        // idempotent-in-batchId target: one subdirectory per batch
        graft.io.Sinks.overwrite(batch, s"$dir/batch=$id")
    }
    assert(seenBatches.nonEmpty)
    val back = spark.read.parquet(s"$dir/batch=*").select("v").as[Long].collect().sorted
    assert(back.toSeq == (1L to 40L))
  }

  test("tumbling window counts with watermark match the batch equivalent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    in.addData(
      Ev(ts(0, 10), 1, "click"), Ev(ts(0, 40), 1, "click"),
      Ev(ts(1, 5), 1, "view"), Ev(ts(1, 30), 2, "click"),
      Ev(ts(3, 0), 2, "click"))
    val windowed = StreamOps.tumblingCounts(
      in.toDF(), "ts", "1 minute", "10 minutes", Seq("kind"))
    val ckpt = tmpDir("stream-win")
    // complete mode: assert window contents; append-mode emission timing is
    // watermark-driven and a single AvailableNow batch never closes the
    // final windows (the watermark trails the max event time by 10 min).
    StreamOps.runAvailableNow(
      windowed.writeStream.outputMode("complete").format("memory").queryName("windowed"), ckpt)
    val got = spark.table("windowed")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (ts(0), "click", 2L), (ts(1), "view", 1L),
      (ts(1), "click", 1L), (ts(3), "click", 1L)))
  }

  test("flatMapGroupsWithState keeps a running count across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val grouped = in.toDS().groupByKey(_.user)
    val counted = StreamOps.runningCountByKey(grouped)
    val ckpt = tmpDir("stream-state")
    val q = counted.writeStream.outputMode("update").format("memory")
      .queryName("counted").option("checkpointLocation", ckpt).start()
    in.addData(Ev(ts(0), 1, "a"), Ev(ts(1), 1, "b"), Ev(ts(2), 2, "c"))
    q.processAllAvailable()
    in.addData(Ev(ts(3), 1, "d"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("counted").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // update mode appends each state revision to the memory sink
    assert(rows.contains((1L, 2L)) && rows.contains((2L, 1L)))
    assert(rows.contains((1L, 3L))) // batch 2 advanced user 1's counter
  }

  test("file stream: pipeline stages run over readStream and land in a parquet sink") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("filestream")
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // two "arriving" files — the reference's S3-parts dataset as a stream
    graft.io.Sinks.append(graft.io.Seeds.fromRange(spark, 50), in)
    graft.io.Sinks.append(graft.io.Seeds.fromRange(spark, 50), in)
    val schema = StructType(Seq(StructField("idx", LongType)))
    val stream = spark.readStream.schema(schema).parquet(in)
      // same stage logic as the batch docs-chain — transforms are reusable
      .withColumn("calculated_result", org.apache.spark.sql.functions.expr("idx * idx"))
      .filter(org.apache.spark.sql.functions.col("calculated_result") % 2 === 0)
    StreamOps.runAvailableNow(
      stream.writeStream.format("parquet").option("path", out), ckpt)
    assert(spark.read.parquet(out).count() == 50) // 25 evens × 2 files
  }

  test("streaming session windows group gapped activity per user") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = MemoryStream[Ev]
    // user 1: two bursts separated by > 5 min; user 2: one burst
    in.addData(
      Ev(ts(0), 1, "a"), Ev(ts(2), 1, "b"),
      Ev(ts(10), 1, "c"),
      Ev(ts(1), 2, "d"))
    val sessions = in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("n"))
    val ckpt = tmpDir("stream-session")
    StreamOps.runAvailableNow(
      sessions.writeStream.outputMode("complete").format("memory").queryName("sessions"), ckpt)
    val got = spark.table("sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L))) // user1: burst of 2 + burst of 1
  }

  test("scheduled trigger (ProcessingTime) runs micro-batches until stopped") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Long]
    in.addData(1L, 2L, 3L)
    val ckpt = tmpDir("stream-sched")
    val q = StreamOps.runScheduled(
      in.toDF().writeStream.format("memory").queryName("scheduled"),
      ckpt, "100 milliseconds")
    try {
      q.processAllAvailable()
      assert(spark.table("scheduled").count() == 3)
      in.addData(4L)
      q.processAllAvailable()
      assert(spark.table("scheduled").count() == 4) // next tick picked it up
    } finally q.stop()
  }

  test("streaming queries read directory-shaped tables (the silent-zero layout trap)") {
    // r11 regression: dir + pathGlobFilter matches leaf FILE names only,
    // so a table that is a DIRECTORY of part files (any warehouse layout,
    // the ScaleUp rehearsal output) streamed zero rows and every drain
    // "passed" empty. The layout-aware source must produce identical
    // results for both layouts.
    val single = graft.queries.StreamingQueries.qStreamTumbling(spark, sfDir)
      .collect().map(_.toString).sorted
    assert(single.nonEmpty, "single-file layout must drain rows")
    val dirLayout = tmpDir("graft_dirlayout")
    val tableDir = java.nio.file.Paths.get(dirLayout, "events.parquet")
    java.nio.file.Files.createDirectories(tableDir)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sfDir, "events.parquet"),
      tableDir.resolve("part-00000.parquet"))
    val dirShaped = graft.queries.StreamingQueries.qStreamTumbling(spark, dirLayout)
      .collect().map(_.toString).sorted
    assert(dirShaped.nonEmpty, "directory layout must drain rows, not silently zero")
    assert(dirShaped.toSeq == single.toSeq)
  }

  test("dedupWithinWatermark drops repeated keys inside the horizon") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    in.addData(
      Ev(ts(0), 1, "signup"), Ev(ts(1), 1, "signup"), // dup user+kind
      Ev(ts(2), 2, "signup"))
    val deduped = StreamOps.dedupWithinWatermark(
      in.toDF(), "ts", "30 minutes", Seq("user", "kind"))
    val ckpt = tmpDir("stream-dedup")
    StreamOps.runAvailableNow(
      deduped.writeStream.outputMode("append").format("memory").queryName("deduped"), ckpt)
    assert(spark.table("deduped").count() == 2)
  }
}
