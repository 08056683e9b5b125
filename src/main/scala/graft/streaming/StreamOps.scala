package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming surface — the reference's deployed dataflow mode
  * re-expressed (SURVEY.md §2.7).
  *
  * Reference model: each stage edge is a DynamoDB Stream driving the next
  * Lambda in micro-batches of `batch_size`=100 with a max batching delay
  * (bert/deploy/utils.py:881-901); the root job fires on a CloudWatch
  * schedule (S2) or an SNS message (S3); the local runner drains until the
  * queue is empty and stops (bert/runner/manager.py:170-192).
  *
  * Spark mapping (strictly stronger semantics — exactly-once per
  * micro-batch with checkpointing vs the reference's unacked at-most-once
  * destructive pop, queues.py:68-78):
  *  - stage edges      → one continuous query over composed transforms
  *  - schedule trigger → Trigger.ProcessingTime
  *  - drain-and-stop   → Trigger.AvailableNow
  *  - batch_size       → maxFilesPerTrigger / maxOffsetsPerTrigger opts
  *  - ETLState (C1)    → dropDuplicatesWithinWatermark (bounded state)
  *
  * A Pipeline's stages apply to a streaming DataFrame unchanged — the
  * transforms are the same `DataFrame => DataFrame` values; only the
  * source/sink differ. That is the whole point of declaring stages
  * relationally.
  */
object StreamOps {

  /** Event-time tumbling-window aggregate with a watermark: the streaming
    * twin of queries.WindowQueries.qWindowTumbling. State is bounded by the
    * watermark — at 100 TB/day the state store holds only the open windows.
    */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      windowLen: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start") +: keyCols.map(col) :+ col("n_events"): _*)

  /** Streaming exact-dedup with bounded state — ETLState's `contains`
    * check (bert/etl/__init__.py:71-80) where "seen" expires with the
    * watermark instead of growing forever in one S3 object.
    */
  def dedupWithinWatermark(
      df: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Drain everything available, then stop — the local runner's
    * "run until work_queue.size() == 0" loop. Blocks until done.
    */
  def runAvailableNow(w: DataStreamWriter[Row], checkpoint: String): StreamingQuery = {
    val q = w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Fire on a fixed cadence — the CloudWatch schedule_expression trigger
    * (bert/deploy/utils.py:970-1032). Caller owns stop(). */
  def runScheduled(w: DataStreamWriter[Row], checkpoint: String, interval: String): StreamingQuery =
    w.option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(interval))
      .start()

  /** Route each micro-batch through an arbitrary BATCH writer
    * (io.Sinks.append / appendDedup / jdbc) — the production sink path for
    * targets with no native streaming sink. Spark retries a failed batch
    * under the same batchId, so exactly-once at the target requires the
    * writer to be idempotent in batchId (e.g. appendDedup keyed on it, or
    * a per-batch output directory); the id is passed through for exactly
    * that purpose. Drains with AvailableNow and blocks until done.
    */
  def foreachBatchSink(df: DataFrame, checkpoint: String)
      (write: (DataFrame, Long) => Unit): StreamingQuery =
    runAvailableNow(
      df.writeStream.foreachBatch((batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        write(batch.toDF(), id)),
      checkpoint)

  /** Custom keyed state via flatMapGroupsWithState — the general form of
    * the reference's ETLState when membership isn't enough (counters,
    * per-key models, cross-batch joins). Emits (key, runningCount) per
    * batch update; state lives in the state store, bounded by the key
    * cardinality, checkpointed exactly-once.
    */
  def runningCountByKey[K: org.apache.spark.sql.Encoder, V](
      grouped: org.apache.spark.sql.KeyValueGroupedDataset[K, V])(
      implicit e: org.apache.spark.sql.Encoder[(K, Long)]): org.apache.spark.sql.Dataset[(K, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    grouped.flatMapGroupsWithState[Long, (K, Long)](
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (key: K, values: Iterator[V], state: GroupState[Long]) =>
        val next = state.getOption.getOrElse(0L) + values.size
        state.update(next)
        Iterator((key, next))
    }
  }
}
