package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-format and external scans (SURVEY.md §2.9 R1, §2.1 S7/S8).
  *
  * The reference reads only JSON parts from S3 (ETLDatasetReader,
  * /root/reference/bert/etl/__init__.py:166-236) and shells out to psql for
  * Postgres (bert/datasource.py:50-84). Spark-native: every columnar/text
  * format is one `spark.read`, and JDBC replaces the psql subprocess with a
  * partitioned parallel scan.
  *
  * Scale notes baked into the helpers:
  *  - parquet/orc: predicate pushdown + column pruning reach the file
  *    footer readers — filters belong on the returned frame, Catalyst does
  *    the rest.
  *  - csv/json: schema should be supplied (inference = an extra full scan).
  *  - jdbc: always give a partitionColumn/bounds for a fact-sized table, or
  *    the whole table arrives through ONE connection.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def csv(spark: SparkSession, path: String, header: Boolean = true,
      schemaDdl: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header)
    schemaDdl.fold(r.option("inferSchema", true))(d => r.schema(d)).csv(path)
  }

  def json(spark: SparkSession, path: String, schemaDdl: Option[String] = None,
      multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("multiLine", multiLine)
    schemaDdl.fold(r)(d => r.schema(d)).json(path)
  }

  /** Raw text corpus intake: one row per line (or per file with
    * wholetext) — the .txt side of document ingestion. Pair with
    * `input_file_name()` for provenance columns.
    */
  def text(spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile).text(path)

  /** Binary file intake (images/audio/video → ops.Multimodal): one row per
    * file with (path, modificationTime, length, content). The
    * pathGlobFilter keeps the scan to the media extension; content is the
    * opaque bytes column Multimodal.Media wraps.
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)

  /** XML intake — Spark 4's built-in XML data source (the upstreamed
    * spark-xml): one row per `rowTag` element, nested elements as struct
    * columns. Pass an explicit schema in pipelines — inference does an
    * extra full pass over the files and infers text-y types.
    */
  def xml(
      spark: SparkSession,
      path: String,
      rowTag: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format("xml").option("rowTag", rowTag)
    schema.fold(r)(r.schema).load(path)
  }

  /** XML emit (the writer half of the same source). */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.format("xml").option("rowTag", rowTag).mode("overwrite").save(path)

  /** JDBC scan (S7). For anything bigger than a dimension table pass
    * `partition = Some((column, lower, upper, numPartitions))` so the read
    * parallelizes across executors. Driver jar must be on the cluster
    * classpath (none ships in this build — exercised in integration
    * environments, not unit tests).
    */
  def jdbc(
      spark: SparkSession,
      url: String,
      table: String,
      props: Map[String, String] = Map.empty,
      partition: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = props.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val withPart = partition.fold(withProps) { case (c, lo, hi, n) =>
      withProps.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }
    withPart.load()
  }
}
