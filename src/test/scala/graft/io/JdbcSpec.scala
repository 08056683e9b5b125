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

  // A non-empty PushedFilters list naming `column` on a JDBCRelation scan —
  // the proof the predicate compiles into the database-side WHERE clause
  // instead of filtering post-fetch in Spark.
  private def assertJdbcPushed(df: org.apache.spark.sql.DataFrame, column: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters: ["))
    assert(pushed.isDefined, s"no PushedFilters on the JDBC scan:\n$plan")
    assert(!pushed.get.contains("PushedFilters: []"),
      s"pushed-filter list is EMPTY — predicate evaluated Spark-side:\n$plan")
    assert(pushed.get.toLowerCase.contains(column.toLowerCase),
      s"pushed filters don't mention $column: ${pushed.get}")
  }

  test("predicate pushes into the remote query") {
    val df = Sources.jdbc(spark, url, "items").filter(col("id") <= 10)
    assert(df.count() == 10)
    assertJdbcPushed(df, "id")
  }

  test("q_jdbc_pushdown's shape: filter pushes through a PARTITIONED jdbc read") {
    // the registry query's exact scan shape (4 key-range partitions + an
    // equality predicate on a non-partition column): the filter must reach
    // every partition's Derby-side SELECT, and the whole aggregate over it
    // must keep the pushed list non-empty — a fetch-all here is invisible
    // to the correctness gate (same rows) but is the difference between
    // shipping 1/5 of the table and all of it at scale
    val q = graft.SparkEntry.queries("q_jdbc_pushdown")(spark, sfDir)
    assertJdbcPushed(q, "n_regionkey")
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
