package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.io.dsv2.{SyntheticScan, SyntheticSource}

/** The DSv2 connector's planning-time contracts: filter pushdown narrows
  * the generated range BEFORE partition planning, column pruning reaches
  * the reader, residual (non-id) predicates stay Spark-side, and an empty
  * post-pushdown range plans zero tasks.
  */
class Dsv2Spec extends SparkSpec {

  private def read(rows: Long, slices: Int = 8): DataFrame =
    spark.read.format("graft.io.dsv2.SyntheticSource")
      .option("rows", rows).option("slices", slices).load()

  /** The single BatchScanExec's Scan, for asserting what got planned. */
  private def scanOf(df: DataFrame): SyntheticScan = {
    val scans = df.queryExecution.sparkPlan.collect {
      case b: BatchScanExec => b.scan
    }
    assert(scans.size == 1, s"expected one BatchScanExec, got $scans")
    scans.head.asInstanceOf[SyntheticScan]
  }

  test("full scan returns rows with the documented derived columns") {
    val got = read(100).orderBy("id").collect()
    assert(got.length == 100)
    val r42 = got(42)
    assert(r42.getAs[Long]("id") == 42L)
    assert(r42.getAs[Long]("val") == SyntheticSource.valOf(42L))
    assert(r42.getAs[String]("cat") == SyntheticSource.catOf(42L))
    assert(r42.getAs[Double]("score") == SyntheticSource.scoreOf(42L))
  }

  test("id-bound filters are pushed: the planned range narrows and rows match") {
    val df = read(1000).filter(col("id") >= 200L && col("id") < 300L)
    val scan = scanOf(df)
    assert(scan.lo == 200L && scan.hi == 300L,
      s"pushdown did not narrow the range: [${scan.lo},${scan.hi})")
    assert(df.count() == 100L)
    // handled filters are consumed — no Spark-side re-evaluation on id
    val postFilters = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.sql
    }
    assert(postFilters.isEmpty, s"id bounds were not consumed: $postFilters")
  }

  test("non-id predicates stay residual while id bounds still push") {
    val df = read(1000).filter(col("id") < 70L && col("cat") === "c3")
    val scan = scanOf(df)
    assert(scan.lo == 0L && scan.hi == 70L)
    val postFilters = df.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.sql
    }
    assert(postFilters.exists(_.contains("cat")), s"cat residual missing: $postFilters")
    // ids 0..69 with id % 7 == 3
    assert(df.count() == 10L)
  }

  test("column pruning reaches the scan (only requested columns generated)") {
    val df = read(100).select(col("id"), col("cat"))
    val scan = scanOf(df)
    assert(scan.readSchema().fieldNames.toSeq == Seq("id", "cat"))
    assert(df.collect().map(_.getAs[String]("cat")).toSet == (0 until 7).map("c" + _).toSet)
  }

  test("partition planning: slices honored, empty range plans zero partitions") {
    val full = read(1000, slices = 4)
    assert(scanOf(full).planInputPartitions().length == 4)
    // a selective filter shrinks the per-slice ranges but still parallelizes
    val narrowed = scanOf(read(1000, slices = 4).filter(col("id") >= 900L))
    assert(narrowed.planInputPartitions().length == 4)
    assert(narrowed.lo == 900L && narrowed.hi == 1000L)
    // a bound past the end of the relation → empty range → no tasks at all
    // (a statically-contradictory predicate would be constant-folded by
    // Catalyst before the source ever sees it)
    val empty = read(1000, slices = 4).filter(col("id") >= 2000L)
    assert(scanOf(empty).planInputPartitions().isEmpty)
    assert(empty.count() == 0L)
  }

  test("count/min/max push completely: one metadata row, zero generated rows") {
    val df = read(1000000).filter(col("id") >= 100L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1)
    val scan = scans.head.asInstanceOf[SyntheticScan]
    assert(scan.aggs.isDefined, "aggregation was not pushed")
    // the answer comes from range arithmetic — a single one-row partition
    assert(scan.planInputPartitions().length == 1)
    val row = df.collect().head
    assert(row.getAs[Long]("n") == 999900L)
    assert(row.getAs[Long]("lo") == 100L)
    assert(row.getAs[Long]("hi") == 999999L)
  }

  test("grouped or non-id aggregates are declined and computed by Spark") {
    val df = read(700).groupBy(col("cat")).agg(count(lit(1)).as("n"))
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
    assert(scans.head.asInstanceOf[SyntheticScan].aggs.isEmpty)
    assert(df.collect().map(_.getAs[Long]("n")).sum == 700L)
  }

  test("limit pushdown caps the generated range") {
    val df = read(1000000).limit(5)
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b.scan }
    val scan = scans.head.asInstanceOf[SyntheticScan]
    assert(scan.hi <= 5L, s"limit not pushed: hi=${scan.hi}")
    assert(df.count() == 5L)
  }

  test("reported statistics reflect the post-pushdown range") {
    val df = read(1000000).filter(col("id") >= 999000L).select(col("id"))
    val stats = df.queryExecution.optimizedPlan.stats
    // 1000 rows × 8 bytes — small enough that a join against this side
    // would broadcast; the nominal million-row table would not.
    assert(stats.sizeInBytes == BigInt(8000))
  }

  test("equality pushdown plans a single one-row range") {
    val df = read(1000).filter(col("id") === 123L)
    val scan = scanOf(df)
    assert(scan.lo == 123L && scan.hi == 124L)
    assert(scan.planInputPartitions().length == 1)
    val row = df.collect().head
    assert(row.getAs[Long]("val") == SyntheticSource.valOf(123L))
  }
}
