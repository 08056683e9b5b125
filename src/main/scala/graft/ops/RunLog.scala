package graft.ops

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Run-log / heartbeat table — the reference's reporting subsystem (K4).
  *
  * Reference: `track_execution` puts {identity, job_name, created} into a
  * `bert-etl-reporting` DynamoDB table on stage entry and deletes it on
  * exit (/root/reference/bert/deploy/reporting.py:92-118); the monitor
  * Lambda scans it to find stalled stages. In a single Spark application
  * the driver supervises executors natively, so what survives is the
  * AUDIT value: a durable append-only log of stage runs with status and
  * timing — queryable like any other table.
  */
object RunLog {

  final case class Entry(
      run_id: String,
      stage: String,
      status: String, // started | succeeded | failed
      detail: String,
      wall_ms: Long,
      logged_at: java.sql.Timestamp)

  def log(spark: SparkSession, path: String, e: Entry): Unit = {
    import spark.implicits._
    Seq(e).toDF().write.mode(SaveMode.Append).parquet(path)
  }

  /** Wrap a stage body with started/succeeded/failed entries. */
  def tracked[T](spark: SparkSession, path: String, runId: String, stage: String)(
      body: => T): T = {
    val t0 = System.currentTimeMillis()
    def now = new java.sql.Timestamp(System.currentTimeMillis())
    log(spark, path, Entry(runId, stage, "started", "", 0L, now))
    try {
      val out = body
      log(spark, path, Entry(runId, stage, "succeeded", "", System.currentTimeMillis() - t0, now))
      out
    } catch {
      case e: Throwable =>
        log(spark, path,
          Entry(runId, stage, "failed", String.valueOf(e.getMessage).take(500),
            System.currentTimeMillis() - t0, now))
        throw e
    }
  }
}
