package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Table profiler — the intake data-quality sweep (nulls, cardinality,
  * ranges) every corpus/warehouse load runs first.
  *
  * One aggregate pass computes every column's stats (conditional
  * aggregates, not a job per column); distinct counts use HLL because at
  * 100 TB an exact distinct per column is #cols full shuffles for a
  * diagnostic number. Output is long-format (column, metric, value) so the
  * profile of any table has one schema.
  */
object Profile {

  def profile(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val total = count(lit(1)).as("__rows")
    val perCol = df.schema.fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"))
      f.dataType match {
        case _: NumericType => base ++ Seq(
          min(c).cast("double").as(s"${f.name}__min"),
          max(c).cast("double").as(s"${f.name}__max"))
        case StringType => base ++ Seq(
          min(length(c)).cast("double").as(s"${f.name}__min"),
          max(length(c)).cast("double").as(s"${f.name}__max"))
        case _ => base
      }
    }
    val wide = df.agg(total, perCol: _*).collect().head
    val rows = wide.schema.fieldNames.filter(_ != "__rows").map { n =>
      // split on the LAST "__": column names may themselves contain "__"
      // (e.g. user__id__nulls → column user__id, metric nulls)
      val cut = n.lastIndexOf("__")
      val (colName, metric) = (n.substring(0, cut), n.substring(cut + 2))
      val v = Option(wide.get(wide.fieldIndex(n))).map {
        case d: Double => d
        case l: Long => l.toDouble
        case other => other.toString.toDouble
      }
      (colName, metric, v, wide.getAs[Long]("__rows"))
    }.toSeq
    rows.toDF("column", "metric", "value", "rows")
  }
}
