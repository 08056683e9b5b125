package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round profiling harness (dev tool, not part of the bench
  * contract): splits each query's wall time into
  *   - build: the query function call (DataFrame construction, any eager
  *     driver-side work a builder does — ScaleGuard counts, memo fills),
  *   - plan: analysis + optimization + physical planning
  *     (`queryExecution.executedPlan` forced),
  *   - exec: full materialization (`foreach(_ => ())`, same action Bench
  *     times).
  * Bench times build+plan+exec as one number; this tool tells WHICH of the
  * three to optimize. Best-of-2 per phase, same warm-up discipline as Bench.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.Prof q_a q_b ..."
  * (no args = all queries). Output: one tab-separated line per query.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = args.toSet
    val unknown = only -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val spark = SessionConf.overlay(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).foreach(_ => ())
    val warmSf = "/root/testdata/sf0.001"
    Seq("q3_join", "q_window_rank", "q_array_explode").foreach { q =>
      SparkEntry.queries.get(q).foreach(fn =>
        try fn(spark, warmSf).foreach(_ => ())
        catch { case scala.util.control.NonFatal(_) => () })
    }
    spark.catalog.clearCache()
    Tables.lineitem(spark, sfDir).count()

    println(f"query\tbuild\tplan\texec\ttotal")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
        def once(): (Double, Double, Double) = {
          spark.catalog.clearCache()
          graft.queries.LearnQueries.clearMemo()
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis/optimization/planning
          val t2 = System.nanoTime()
          df.foreach(_ => ())
          val t3 = System.nanoTime()
          ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
        }
        try {
          val a = once(); val b = once()
          val (bu, pl, ex) =
            (math.min(a._1, b._1), math.min(a._2, b._2), math.min(a._3, b._3))
          println(f"$name\t$bu%.3f\t$pl%.3f\t$ex%.3f\t${bu + pl + ex}%.3f")
        } catch {
          case e: Throwable => println(s"$name\tERROR\t${e.getMessage}")
        }
      }
    spark.stop()
  }
}
