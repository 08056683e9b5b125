package graft
import org.apache.spark.sql.SparkSession
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionConf.overlay(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).foreach(_ => ())
    Tables.lineitem(spark, sfDir).count()
    for (q <- args; i <- 1 to 6) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).foreach(_ => ())
      val extra = if (!sys.env.contains("GRAFT_PROFQ_DEBUG")) "" else {
        val rt = Runtime.getRuntime
        f" heapMB=${(rt.totalMemory - rt.freeMemory) / 1048576}%d threads=${Thread.activeCount}%d"
      }
      println(f"$q run$i ${(System.nanoTime()-t0)/1e9}%.3f$extra")
    }
    if (sys.env.contains("GRAFT_PROFQ_DEBUG")) {
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.keySet.asScala.toSeq
        .groupBy(_.getName.replaceAll("[0-9]+", "#")).view.mapValues(_.size)
        .toSeq.sortBy(-_._2).take(12)
        .foreach { case (n, c) => println(f"[profq] thread $c%4d  $n") }
    }
    if (sys.env.contains("GRAFT_ED_DEBUG")) {
      val (scr, dp) = graft.functions.EditDistanceWithin.screenStats
      println(s"[profq] edit_distance_within: screened=$scr dp=$dp")
    }
    spark.stop()
  }
}
