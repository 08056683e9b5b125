package graft.core

import org.apache.spark.sql.DataFrame

/** A named pipeline stage: a whole-Dataset transform `DataFrame => DataFrame`.
  *
  * This is the Spark-native re-expression of the reference's job — a
  * zero-arg Python function consuming a work queue and feeding a done queue
  * (`@binding.follow`, /root/reference/bert/binding.py:34-132). The
  * row-at-a-time `for details in work_queue:` loop dissolves into the
  * declarative transform; 1→1 maps become `withColumn`/`select`, 1→N emits
  * become `flatMap`/`explode`, conditional puts become `filter`
  * (SURVEY.md §2.3 D1–D4).
  *
  * `barrier` mirrors the reference's BOTTLE pipeline type
  * (bert/constants.py:46-48): a stage forced to run single-streamed. In
  * Spark that is `coalesce(1)` on the stage input — only meaningful for
  * order-sensitive or external-rate-limited stages; leave false otherwise
  * (the default CONCURRENT type costs nothing because parallelism is the
  * execution model, not a per-stage worker count).
  *
  * `retries` mirrors the runner's retry-on-error loop
  * (bert/runner/manager.py:158-206, max-retries default 10 at
  * bert/utils.py:258-261). Retries re-run the stage's *action* during
  * checkpointed runs; within a lazy chain Spark's own task retries already
  * cover transient executor failure, so stage-level retries only matter for
  * driver-visible exceptions (bad external service, flaky source).
  */
final case class Stage(
    name: String,
    transform: DataFrame => DataFrame,
    barrier: Boolean = false,
    retries: Int = 0,
    parallelism: Option[Int] = None) {
  require(parallelism.forall(_ > 0), "parallelism must be positive")
  def apply(df: DataFrame): DataFrame = {
    // `workers = N` parity (D6, bert/binding.py:37): an explicit fan-out/in
    // for stages whose input partitioning is wrong for their work (e.g. an
    // external-API stage wanting exactly N concurrent streams). Barrier
    // (BOTTLE) wins over parallelism, matching the reference's 1-worker rule.
    val in =
      if (barrier) df.coalesce(1)
      else parallelism.fold(df)(df.repartition)
    transform(in)
  }
}

object Stage {

  /** Typed stage (SURVEY §2.8 U1): the job body as `Dataset[A] => Dataset[B]`
    * with case-class Encoders — the JVM-native flatMap/map surface that
    * replaces the reference's arbitrary-Python job bodies without the
    * Python-UDF serialization tax. Prefer Column expressions when the logic
    * is relational; reach for this when it genuinely is imperative.
    */
  def typed[A: org.apache.spark.sql.Encoder, B](
      name: String, barrier: Boolean = false, retries: Int = 0)(
      f: org.apache.spark.sql.Dataset[A] => org.apache.spark.sql.Dataset[B]): Stage =
    Stage(name, df => f(df.as[A]).toDF(), barrier, retries)
}

/** A linear chain of stages rooted at a source DataFrame.
  *
  * The reference enforces exactly one child per parent ("One child to
  * parent per program", bert/binding.py:125-126), so a pipeline is always a
  * chain rooted at the 'noop' sentinel; `Pipeline` keeps that shape (the
  * builder only appends). Stage names must be unique — they key checkpoint
  * directories, the analog of the reference's namespaced queue keys
  * (bert/naming.py:7-21).
  *
  * Build style mirrors `@follow` without reflection:
  * {{{
  *   val p = Pipeline(seedDf)
  *     .stage("sync_sounds")(df => ...)
  *     .stage("sync_posts")(df => ...)
  * }}}
  */
final case class Pipeline(source: DataFrame, stages: Vector[Stage] = Vector.empty) {
  require(stages.map(_.name).distinct.size == stages.size, "duplicate stage name")

  def stage(name: String, barrier: Boolean = false, retries: Int = 0)(
      f: DataFrame => DataFrame): Pipeline =
    copy(stages = stages :+ Stage(name, f, barrier, retries))

  def follow(s: Stage): Pipeline = copy(stages = stages :+ s)

  /** Pure composition — the whole chain as one lazy plan (no checkpoints).
    * This is the default execution mode: Catalyst sees every stage at once
    * and optimizes across stage boundaries (filter pushdown through earlier
    * stages, column pruning back to the scan) — something the reference's
    * queue-materialized model structurally cannot do.
    */
  def plan: DataFrame = stages.foldLeft(source)((df, st) => st(df))
}
