package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Dataset-level memoization — the reference's cache_function_results (C2).
  *
  * Reference: S3-backed memo of a Python function keyed by
  * sha256(prefix + argspec key + stringified args)
  * (/root/reference/bert/etl/functools.py:24-100). Spark-native: the memo
  * value is a parquet table keyed by the args hash; a hit is a metadata
  * check + scan, a miss computes, writes, then reads back (so the caller
  * always sees the durable copy — same read-your-write shape as the
  * reference's download-after-upload).
  *
  * Deterministic producers only (the reference assumed purity too); the
  * burden is on the caller, as documented at functools.py:24-31.
  */
object Memoize {

  def argsKey(prefix: String, args: Seq[Any]): String = {
    // Length-prefix every token so the canonical string is injective:
    // a plain '|' join would collide Seq("a|b") with Seq("a","b").
    val canonical = (prefix +: args.map(String.valueOf))
      .map(s => s"${s.length}:$s").mkString("|")
    sha256Hex(canonical)
  }

  /** Get-or-compute: returns the memoized DataFrame for (prefix, args),
    * computing and persisting on first call. */
  def cached(spark: SparkSession, memoDir: String, prefix: String, args: Seq[Any])(
      compute: => DataFrame): DataFrame = {
    val path = s"$memoDir/${argsKey(prefix, args)}"
    if (!exists(spark, path))
      compute.write.mode(SaveMode.Overwrite).parquet(path)
    spark.read.parquet(path)
  }

  def isCached(spark: SparkSession, memoDir: String, prefix: String, args: Seq[Any]): Boolean =
    exists(spark, s"$memoDir/${argsKey(prefix, args)}")

  private def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
