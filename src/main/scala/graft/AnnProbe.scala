package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SessionConf.overlay(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[annprobe] $name ${(System.nanoTime()-t0)/1e9}%.3f s"); r
    }
    SparkEntry.entry(spark).foreach(_ => ())
    for (i <- 1 to 3) {
      val emb = Tables.embeddings(spark, dir)
      val model = t("fit")(graft.ops.Ann.fit(emb.select(col("vec_id"), col("embedding")),
        k = 4, iters = 2, exactArith = true))
      val idx = graft.ops.Scratch.dir("ann_probe")
      t("writeIndex")(graft.ops.Ann.writeIndex(model, idx.toString))
      val nFiles = {
        val st = java.nio.file.Files.walk(idx.resolve("corpus"))
        try st.filter(p => p.toString.endsWith(".parquet")).count()
        finally st.close()
      }
      println(s"[annprobe] corpus data files: $nFiles")
      val stored = t("readIndex")(graft.ops.Ann.readIndex(spark, idx.toString))
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      t("serve")(graft.ops.Ann.ivfTopK(spark, queries, stored.assigned, k = 5, nprobe = 2,
        cellCol = "cell", exactArith = true,
        storedCentroids = Some(stored.centroids)).foreach(_ => ()))
    }
    spark.stop()
  }
}
