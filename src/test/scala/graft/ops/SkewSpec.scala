package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Salted join ≡ plain join, with the hot key spread across buckets. */
class SkewSpec extends SparkSpec {

  test("salted join equals the unsalted join on a skewed key") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey", "l_quantity")
    val part = Tables.part(spark, sfDir).select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(part, Seq("l_partkey"))
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedJoin(li, part, "l_partkey", buckets = 4)
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("left outer salted join preserves unmatched left rows exactly once") {
    val left = graft.io.Seeds.fromMaps(spark, Seq(
      Map("k" -> "hot", "v" -> 1), Map("k" -> "hot", "v" -> 2),
      Map("k" -> "cold", "v" -> 3), Map("k" -> "orphan", "v" -> 4)))
    val right = graft.io.Seeds.fromMaps(spark, Seq(
      Map("k" -> "hot", "r" -> 10), Map("k" -> "cold", "r" -> 20)))
    val out = Skew.saltedJoin(left, right, "k", buckets = 4, joinType = "left")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("v"), Option(r.get(r.fieldIndex("r")))))
    assert(out.length == 4) // each left row exactly once
    assert(out.count(_._1 == "orphan") == 1)
    assert(out.find(_._1 == "orphan").get._3.isEmpty)
  }

  test("rejects join types that emit unmatched right rows") {
    val df = graft.io.Seeds.fromMaps(spark, Seq(Map("k" -> "a", "v" -> 1)))
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(df, df, "k", buckets = 2, joinType = jt)
      }
    }
  }
}
