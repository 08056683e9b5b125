package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** In-process message bus — the library form of the reference's SNS topic /
  * inter-stage stream sources (SURVEY §2.1 S3/S4). The reference's entry
  * job fires on an SNS message and each stage edge is a DynamoDB stream;
  * here a topic is a named MemoryStream: producers `publish` typed
  * records, consumers get a streaming DataFrame to compose stages onto
  * and drain with any StreamOps trigger.
  *
  * Semantics: ONE consumer group per topic — a drained batch is trimmed
  * from the topic buffer on checkpoint commit, exactly like the
  * reference's destructive queue pop (bert/queues.py:68-78). Re-draining
  * FROM THE SAME CHECKPOINT picks up new records incrementally; a second
  * independent checkpoint on an already-drained topic is an error by
  * design (fan-out = publish to two topics, or share the checkpoint).
  *
  * Scope: single-driver (tests, local pipelines, notebook wiring) — the
  * same role the reference's in-process StreamingQueue/LocalQueue plays in
  * its test and Lambda-stream modes (bert/queues.py:210-264). A production
  * deployment swaps the topic for a durable source (files, Kafka) without
  * touching the stage transforms, which is the point of keeping stages as
  * `DataFrame => DataFrame` values.
  */
object Bus {

  private final case class Topic(stream: MemoryStream[_],
                                 schema: org.apache.spark.sql.types.StructType)

  // weak keys, REFERENCE identity (SparkSession doesn't override equals):
  // no cross-session hash collisions, and a stopped session's topics are
  // released with the session instead of pinning buffers for the JVM life
  private val topics =
    new java.util.WeakHashMap[SparkSession, mutable.Map[String, Topic]]()

  private def sessionTopics(spark: SparkSession): mutable.Map[String, Topic] =
    topics.synchronized {
      var m = topics.get(spark)
      if (m == null) { m = mutable.Map.empty; topics.put(spark, m) }
      m
    }

  /** The topic's stream, creating the topic on first use. Repeated calls
    * return the same stream (one offset log); re-using a topic name with a
    * different element type fails fast instead of corrupting the encoder.
    */
  def topic[A: Encoder](spark: SparkSession, name: String): MemoryStream[A] = {
    val enc = implicitly[Encoder[A]]
    val m = sessionTopics(spark)
    m.synchronized {
      val t = m.getOrElseUpdate(name, {
        implicit val sq = spark.sqlContext
        Topic(MemoryStream[A], enc.schema)
      })
      require(t.schema == enc.schema,
        s"topic '$name' already exists with schema ${t.schema.simpleString}, " +
          s"requested ${enc.schema.simpleString}")
      t.stream.asInstanceOf[MemoryStream[A]]
    }
  }

  /** Publish records to a topic. */
  def publish[A: Encoder](spark: SparkSession, name: String, records: A*): Unit = {
    topic[A](spark, name).addData(records: _*)
    ()
  }

  /** Streaming DataFrame over the topic — compose stages, then drain via
    * StreamOps.runAvailableNow / runScheduled (one consumer group; see
    * object doc).
    */
  def subscribe[A: Encoder](spark: SparkSession, name: String): DataFrame =
    topic[A](spark, name).toDF()

  /** Drop a topic (tests / rewire). */
  def delete(spark: SparkSession, name: String): Unit = {
    val m = sessionTopics(spark)
    m.synchronized { m.remove(name) }
    ()
  }
}
