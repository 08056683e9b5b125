package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round probe (dev tool, not part of the bench contract):
  * decomposes the streaming gates' cost one level below
  * GRAFT_STREAM_DEBUG's per-batch durationMs — per-JOB and per-STAGE wall
  * time and task counts during each gate, so "addBatch ~0.5 s on 5 rows"
  * can be attributed to scheduling vs state-store work vs sink.
  *
  * Usage: sbt "runMain graft.StreamProbe q_stream_tumbling q_stream_late"
  * (no args = a representative subset). Set GRAFT_STREAM_DEBUG=1 to also
  * get the engine's per-batch durationMs lines on stderr.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionConf.overlay(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long, runMs: Long,
                              deserMs: Long, gcMs: Long, cpuMs: Long, serMs: Long,
                              shufWriteMs: Long, fetchWaitMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        val m = si.taskMetrics
        stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60),
          si.numTasks, wall, m.executorRunTime,
          m.executorDeserializeTime, m.jvmGCTime, m.executorCpuTime / 1000000,
          m.resultSerializationTime, m.shuffleWriteMetrics.writeTime / 1000000,
          m.shuffleReadMetrics.fetchWaitTime))
        ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart.put(js.jobId, js.time); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val t0 = jobStart.getOrDefault(je.jobId, je.time)
        jobs.add((je.jobId, je.time - t0)); ()
      }
    }

    // In-process sampling profiler for the executor task threads (local
    // mode: tasks run in this JVM). Aggregates the deepest "interesting"
    // frame of each RUNNING task thread every 20 ms — enough to attribute
    // a ~240 ms/task blocked-time mystery to a concrete call site.
    val frameCounts = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val traces = Thread.getAllStackTraces
        traces.forEach { (t, frames) =>
          if (t.getName.startsWith("Executor task launch worker") && frames.nonEmpty) {
            val sig = frames.take(24).map(f => s"${f.getClassName}.${f.getMethodName}")
              .mkString(" < ")
            frameCounts.merge(sig.take(600), 1L, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    }, "streamprobe-sampler")
    sampler.setDaemon(true)
    sampler.start()

    SparkEntry.entry(spark).foreach(_ => ())
    Tables.lineitem(spark, sfDir).count()
    frameCounts.clear()
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_stream_tumbling", "q_stream_late", "q_stream_join", "q_stream_recovery")
    for (q <- names; run <- 1 to 2) {
      spark.catalog.clearCache()
      stages.clear(); jobs.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).foreach(_ => ())
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val ss = stages.asScala.toSeq.sortBy(-_.wallMs)
      val js = jobs.asScala.toSeq
      println(f"[streamprobe] $q run$run total=$total%.3f s jobs=${js.size} " +
        f"jobWallSum=${js.map(_._2).sum / 1e3}%.3f s stages=${ss.size} " +
        f"stageWallSum=${ss.map(_.wallMs).sum / 1e3}%.3f s taskSum=${ss.map(_.tasks).sum}")
      if (run == 2) ss.take(12).foreach { s =>
        println(f"[streamprobe]   stage ${s.id}%5d tasks=${s.tasks}%3d wall=${s.wallMs}%5d run=${s.runMs}%5d cpu=${s.cpuMs}%5d deser=${s.deserMs}%4d gc=${s.gcMs}%4d ser=${s.serMs}%3d sw=${s.shufWriteMs}%4d fw=${s.fetchWaitMs}%4d ${s.name}")
      }
    }
    sampling = false
    import scala.jdk.CollectionConverters._
    println("[streamprobe] == task-thread stack samples (top 15) ==")
    frameCounts.asScala.toSeq.sortBy(-_._2).take(15).foreach { case (sig, n) =>
      println(f"[streamprobe] $n%5d  $sig")
    }
    spark.stop()
  }
}
