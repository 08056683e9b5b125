package graft.io

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Bucketed join skips the shuffle: same key, same bucket count on both
  * sides → no Exchange in the executed plan, and results equal the
  * plain-join results.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without Exchange and matches plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderstatus")
    Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4, sortCol = Some("l_orderkey"))
    Bucketing.writeBucketed(o, "o_b", "o_orderkey", 4, sortCol = Some("o_orderkey"))

    // bucketed join must not shuffle (AQE off to read the static plan;
    // broadcast threshold off so the join is sort-merge, the 100 TB shape)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "li_b")
        .join(Bucketing.read(spark, "o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
