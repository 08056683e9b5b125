package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables — co-located joins without a shuffle.
  *
  * At 100 TB the dominant cost of a fact⋈fact join is shuffling both
  * sides. Bucketing pre-partitions a table by the join key at WRITE time
  * (hash(key) mod n stored in the table layout), so a join between two
  * tables bucketed on the same key with the same bucket count reads
  * bucket-aligned splits and skips the exchange entirely — pay the shuffle
  * once when the table lands, amortize it over every subsequent join.
  * BucketingSpec asserts the no-Exchange plan.
  *
  * Uses the session catalog (saveAsTable) because bucket metadata lives in
  * the catalog, not in bare parquet paths.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
