package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Map-typed column surface (SURVEY §2.9 R13 — the reference's 'M' payload
  * layer as a first-class MapType column): construction, access,
  * merge, and higher-order transforms. Not oracle-gated (map value
  * canonicalization differs across engines), so the behavior pins live here.
  */
class MapFnsSpec extends SparkSpec {

  test("token-frequency maps per document: build, access, transform") {
    val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 20)
      .withColumn("tk", split(col("text"), " "))
      // tokens → (token, count) map via aggregate into distinct keys
      .withColumn("tok_freq", expr(
        """map_from_arrays(
          |  array_distinct(tk),
          |  transform(array_distinct(tk), t -> size(filter(tk, x -> x = t))))""".stripMargin))
    val row = docs.select(
      col("doc_id"),
      size(map_keys(col("tok_freq"))).as("n_distinct"),
      element_at(col("tok_freq"), element_at(col("tk"), 1)).as("first_tok_count"),
      expr("aggregate(map_values(tok_freq), 0, (a, x) -> a + x)").as("total_from_map"),
      size(col("tk")).as("total_tokens")).collect()
    row.foreach { r =>
      assert(r.getAs[Int]("first_tok_count") >= 1)
      assert(r.getAs[Int]("total_from_map") == r.getAs[Int]("total_tokens"),
        "map value sum must equal token count")
    }
  }

  test("map merge and value transform") {
    import spark.implicits._
    val df = Seq((Map("a" -> 1, "b" -> 2), Map("b" -> 10, "c" -> 3))).toDF("m1", "m2")
    val out = df.select(
      map_concat(expr("map_filter(m1, (k, v) -> NOT array_contains(map_keys(m2), k))"), col("m2")).as("merged"),
      expr("transform_values(m1, (k, v) -> v * 100)").as("scaled")).collect().head
    val merged = out.getMap[String, Int](0)
    assert(merged == Map("a" -> 1, "b" -> 10, "c" -> 3)) // right side wins
    assert(out.getMap[String, Int](1) == Map("a" -> 100, "b" -> 200))
  }
}
