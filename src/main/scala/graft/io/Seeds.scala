package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline seed sources — the reference's `invoke_args` loader (S1).
  *
  * The reference seeds the first job's work queue from literal dicts in
  * bert-etl.yaml, from `.json` files, or from dotted-path module members
  * (/root/reference/bert/shortcuts.py:198-260; enqueued at
  * bert/runner/manager.py:111-112). Spark equivalents:
  *  - literals  → `spark.createDataFrame` via a JSON Dataset (schema
  *    inferred across all seed records, like the reference's schemaless
  *    dict payloads landing in one queue)
  *  - .json     → `spark.read.json` (one object per line, or multiLine
  *    for a single array — both reference layouts)
  *  - module    → a plain Scala `Seq` value passed to `fromMaps`; the JVM
  *    has no dotted-path import gymnastics to replicate.
  *
  * YAML seed files are intentionally unsupported here (no YAML parser in
  * the dependency budget); convert to JSON at the edge.
  */
object Seeds {

  /** Seed from literal records, schemaless-dict style: each map is one row;
    * the union schema is inferred (missing keys → null) exactly like
    * heterogeneous invoke_args dicts.
    */
  def fromMaps(spark: SparkSession, rows: Seq[Map[String, Any]]): DataFrame = {
    import spark.implicits._
    val json = rows.map(toJson)
    spark.read.json(json.toDS())
  }

  /** Seed from a JSON file: newline-delimited objects, or (multiLine) one
    * top-level array — the reference accepts both shapes.
    */
  def fromJsonFile(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame =
    spark.read.option("multiLine", multiLine).json(path)

  /** Seed a numeric range (the docs example seeds 100 work items,
    * docs/index.rst "Stream Processing"). */
  def fromRange(spark: SparkSession, n: Long, col: String = "idx"): DataFrame =
    spark.range(n).withColumnRenamed("id", col)

  private def toJson(m: Map[String, Any]): String =
    m.map { case (k, v) => "\"" + escape(k) + "\":" + valueJson(v) }
      .mkString("{", ",", "}")

  private def valueJson(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + escape(s) + "\""
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => n.toString
    case n: Double => n.toString
    case n: BigDecimal => n.toString
    case seq: Seq[_] => seq.map(valueJson).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.map { case (k, x) => "\"" + escape(k.toString) + "\":" + valueJson(x) }
        .mkString("{", ",", "}")
    case other => "\"" + escape(other.toString) + "\""
  }

  private def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
