package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** In-process message bus — the library form of the reference's SNS topic /
  * inter-stage stream sources (SURVEY §2.1 S3/S4). The reference's entry
  * job fires on an SNS message and each stage edge is a DynamoDB stream;
  * here a topic is a named MemoryStream: producers `publish` typed
  * records, consumers get a streaming DataFrame to compose stages onto
  * and drain with any StreamOps trigger.
  *
  * Scope: single-driver (tests, local pipelines, notebook wiring) — the
  * same role the reference's in-process StreamingQueue/LocalQueue plays in
  * its test and Lambda-stream modes (bert/queues.py:210-264). A production
  * deployment swaps the topic for a durable source (files, Kafka) without
  * touching the stage transforms, which is the point of keeping stages as
  * `DataFrame => DataFrame` values.
  */
object Bus {

  private val topics = TrieMap.empty[(Int, String), MemoryStream[_]]

  /** The topic's stream, creating the topic on first use. One topic = one
    * MemoryStream keyed by (session, name); repeated calls return the same
    * stream so multiple consumers see one offset log.
    */
  def topic[A: Encoder](spark: SparkSession, name: String): MemoryStream[A] = {
    val key = (System.identityHashCode(spark), name)
    topics.getOrElseUpdate(key, {
      implicit val sq = spark.sqlContext
      MemoryStream[A]
    }).asInstanceOf[MemoryStream[A]]
  }

  /** Publish records to a topic. */
  def publish[A: Encoder](spark: SparkSession, name: String, records: A*): Unit = {
    topic[A](spark, name).addData(records: _*)
    ()
  }

  /** Streaming DataFrame over the topic — compose stages, then drain via
    * StreamOps.runAvailableNow / runScheduled.
    */
  def subscribe[A: Encoder](spark: SparkSession, name: String): DataFrame =
    topic[A](spark, name).toDF()

  /** Drop a topic (tests / rewire). */
  def delete(spark: SparkSession, name: String): Unit = {
    topics.remove((System.identityHashCode(spark), name))
    ()
  }
}
