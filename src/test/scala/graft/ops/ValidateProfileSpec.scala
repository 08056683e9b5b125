package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.io.Seeds

/** Validate rules/enforce/orphans and the table profiler. */
class ValidateProfileSpec extends SparkSpec {

  private def dirty = Seeds.fromMaps(spark, Seq(
    Map("id" -> 1, "v" -> 10, "s" -> "ok"),
    Map("id" -> 2, "v" -> -5, "s" -> "ok"), // range violation
    Map("id" -> 3, "s" -> "no-v"), // null violation
    Map("id" -> 4, "v" -> 7, "s" -> "???"))) // regex violation

  test("report counts each rule's violations in one pass") {
    val rules = Validate.notNull("v") :+
      Validate.inRange("v", 0, 100) :+ Validate.matches("s", "^[a-z-]+$")
    val rep = Validate.report(dirty, rules)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("not_null(v)") == 1)
    assert(rep("range(v)") == 1)
    assert(rep("matches(s)") == 1)
  }

  test("enforce splits valid from violating rows") {
    val rules = Validate.notNull("v") :+ Validate.inRange("v", 0, 100)
    val (good, bad) = Validate.enforce(dirty, rules)
    assert(good.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(bad.count() == 2)
  }

  test("orphans finds keys missing from the parent") {
    val child = Seeds.fromMaps(spark, Seq(
      Map("fk" -> 1), Map("fk" -> 2), Map("fk" -> 99)))
    val parent = Seeds.fromMaps(spark, Seq(Map("pk" -> 1), Map("pk" -> 2)))
    val o = Validate.orphans(child, "fk", parent, "pk").collect()
    assert(o.map(_.getLong(0)).toSeq == Seq(99L))
  }

  test("screenToTable persists exactly the verdict-ok rows, once") {
    val corpus = spark.sql(
      """SELECT CAST(1 AS BIGINT) AS vec_id,
        |  transform(sequence(1, 8), i -> CAST(i AS FLOAT)) AS embedding
        |UNION ALL SELECT CAST(2 AS BIGINT),
        |  transform(sequence(1, 8), i -> CAST('NaN' AS FLOAT))
        |UNION ALL SELECT CAST(3 AS BIGINT),
        |  transform(sequence(1, 3), i -> CAST(i AS FLOAT))
        |UNION ALL SELECT CAST(4 AS BIGINT),
        |  transform(sequence(1, 8), i -> CAST(0.5 AS FLOAT))""".stripMargin)
    val path = tmpDir("screened") + "/corpus"
    val out = Validate.screenToTable(spark, corpus, "embedding", 8, path)
    // only the finite, right-dimensioned rows survive…
    assert(out.select("vec_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // …the table is REAL (re-readable without the source frame)…
    assert(spark.read.parquet(path).count() == 2)
    // …and schema is preserved for unscreened downstream operators
    assert(out.schema.fieldNames.toSeq == corpus.schema.fieldNames.toSeq)
  }

  test("profile emits one row per column metric with sane values") {
    val p = Profile.profile(spark, Tables.customer(spark, sfDir))
    val byKey = p.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Any]("value")).toMap
    assert(byKey((("c_custkey"), "nulls")) == 0.0)
    val rows = p.select("rows").distinct().collect().head.getLong(0)
    val distinct = byKey(("c_custkey", "distinct")).asInstanceOf[Double]
    assert(math.abs(distinct - rows) / rows < 0.05) // HLL within 5% on a key column
    assert(byKey(("c_acctbal", "min")).asInstanceOf[Double] <= byKey(("c_acctbal", "max")).asInstanceOf[Double])
  }

  test("profile handles column names containing the metric separator") {
    import spark.implicits._
    val df = Seq((1, "x"), (2, null: String)).toDF("user__id", "raw__text__v2")
    val p = Profile.profile(spark, df).collect()
      .map(r => (r.getAs[String]("column"), r.getAs[String]("metric"))).toSet
    assert(p.contains(("user__id", "nulls")) && p.contains(("raw__text__v2", "distinct")))
    assert(!p.exists(_._1 == "user")) // mis-split would produce column "user"
  }
}
