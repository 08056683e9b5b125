package graft.core

import org.apache.spark.sql.SparkSession

/** Typed pipeline configuration — the reference's bert-etl.yaml conf merge
  * (P3, /root/reference/bert/utils.py:64-307): `every_lambda` defaults
  * overridden per-job. Here the same two-layer merge over typed case
  * classes, loaded from a JSON file (single-document, flat sections — the
  * subset of the reference surface that is engine-relevant; deploy-infra
  * keys like IAM/KMS/memory_size are out of scope per SURVEY §2.6).
  *
  * JSON is parsed with Spark's own JSON reader (one more use of the engine,
  * zero extra dependencies), so config files live wherever data lives.
  *
  * {{{
  *   {"defaults": {"retries": 2},
  *    "stages": [{"name": "sync", "retries": 5, "barrier": false},
  *               {"name": "report", "barrier": true}]}
  * }}}
  */
object PipelineConfig {

  final case class StageConf(name: String, retries: Int, barrier: Boolean)
  final case class Conf(
      checkpointDir: Option[String],
      replayFrom: Option[String],
      stages: Vector[StageConf])

  def load(spark: SparkSession, path: String): Conf = {
    val df = spark.read.option("multiLine", true).json(path)
    val row = df.collect().headOption.getOrElse(
      throw new IllegalArgumentException(s"empty pipeline config: $path"))
    val schema = df.schema

    def topString(field: String): Option[String] =
      if (schema.fieldNames.contains(field) && !row.isNullAt(schema.fieldIndex(field)))
        Some(row.getString(schema.fieldIndex(field)))
      else None

    val defaults: Map[String, Any] =
      if (schema.fieldNames.contains("defaults") && !row.isNullAt(schema.fieldIndex("defaults"))) {
        val d = row.getStruct(schema.fieldIndex("defaults"))
        d.schema.fieldNames.zipWithIndex.collect {
          case (n, i) if !d.isNullAt(i) => n -> d.get(i)
        }.toMap
      } else Map.empty

    val defRetries = defaults.get("retries").map(_.toString.toLong.toInt).getOrElse(0)
    val defBarrier = defaults.get("barrier").exists(_.toString.toBoolean)

    val stages =
      if (!schema.fieldNames.contains("stages") || row.isNullAt(schema.fieldIndex("stages")))
        Vector.empty[StageConf]
      else row.getSeq[org.apache.spark.sql.Row](schema.fieldIndex("stages")).toVector.map { sr =>
        val fields = sr.schema.fieldNames
        def opt(n: String): Option[Any] =
          if (!fields.contains(n)) None
          else {
            val i = sr.fieldIndex(n)
            if (sr.isNullAt(i)) None else Some(sr.get(i))
          }
        StageConf(
          name = opt("name").map(_.toString).getOrElse(
            throw new IllegalArgumentException("stage missing 'name'")),
          retries = opt("retries").map(_.toString.toLong.toInt).getOrElse(defRetries),
          barrier = opt("barrier").map(_.toString.toBoolean).getOrElse(defBarrier))
      }

    Conf(topString("checkpointDir"), topString("replayFrom"), stages)
  }

  /** Bind a config to stage implementations by name — the conf carries the
    * knobs (order, retries, barrier), the code carries the transforms; a
    * conf stage without an implementation fails fast like the reference's
    * missing-job import error.
    */
  def build(
      source: org.apache.spark.sql.DataFrame,
      conf: Conf,
      impls: Map[String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame]): Pipeline = {
    val missing = conf.stages.map(_.name).filterNot(impls.contains)
    require(missing.isEmpty, s"no implementation for configured stages: $missing")
    conf.stages.foldLeft(Pipeline(source)) { (p, sc) =>
      p.follow(Stage(sc.name, impls(sc.name), barrier = sc.barrier, retries = sc.retries))
    }
  }
}
