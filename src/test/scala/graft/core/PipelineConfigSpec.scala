package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.Seeds

/** Typed config loading + binding to stage implementations (P3). */
class PipelineConfigSpec extends SparkSpec {

  private def write(dir: String, json: String): String = {
    val p = s"$dir/pipeline.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json)
    p
  }

  test("defaults merge under per-stage overrides (the every_lambda pattern)") {
    val p = write(tmpDir("conf"),
      """{"defaults": {"retries": 2},
        |  "checkpointDir": "/tmp/ck",
        |  "stages": [
        |    {"name": "calc"},
        |    {"name": "report", "retries": 5, "barrier": true}]}""".stripMargin)
    val conf = PipelineConfig.load(spark, p)
    assert(conf.checkpointDir.contains("/tmp/ck"))
    assert(conf.stages.map(_.name) == Vector("calc", "report"))
    assert(conf.stages(0).retries == 2 && !conf.stages(0).barrier)
    assert(conf.stages(1).retries == 5 && conf.stages(1).barrier)
  }

  test("build binds config order to implementations and runs") {
    val p = write(tmpDir("conf2"),
      """{"stages": [{"name": "square"}, {"name": "keep_even"}]}""")
    val conf = PipelineConfig.load(spark, p)
    val pipe = PipelineConfig.build(Seeds.fromRange(spark, 10), conf, Map(
      "square" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("sq", col("idx") * col("idx"))),
      "keep_even" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.filter(col("sq") % 2 === 0))))
    assert(pipe.plan.count() == 5)
  }

  test("config-driven checkpointed run honors checkpointDir and replayFrom") {
    val ckdir = tmpDir("confck")
    val p1 = write(tmpDir("conf4"),
      s"""{"checkpointDir": "$ckdir",
         |  "stages": [{"name": "square"}, {"name": "keep_even"}]}""".stripMargin)
    val conf = PipelineConfig.load(spark, p1)
    val impls = Map(
      "square" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("sq", col("idx") * col("idx"))),
      "keep_even" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.filter(col("sq") % 2 === 0)))
    val pipe = PipelineConfig.build(Seeds.fromRange(spark, 10), conf, impls)
    assert(Runner.runCheckpointed(spark, pipe, conf.checkpointDir.get).count() == 5)
    // replay from the second stage using the conf's checkpoint dir
    val replayed = Runner.runCheckpointed(spark, pipe, conf.checkpointDir.get,
      replayFrom = Some("keep_even"))
    assert(replayed.count() == 5)
  }

  test("configured stage without implementation fails fast") {
    val p = write(tmpDir("conf3"), """{"stages": [{"name": "ghost"}]}""")
    val conf = PipelineConfig.load(spark, p)
    intercept[IllegalArgumentException] {
      PipelineConfig.build(Seeds.fromRange(spark, 1), conf, Map.empty)
    }
  }
}
