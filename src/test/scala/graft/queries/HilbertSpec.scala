package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the unrolled order-10 Hilbert transform (AdvancedQueries
  * .withHilbertIndex — the q_hilbert layout kernel) against an independent
  * in-JVM xy2d reference, and checks the curve properties the layout
  * comparison relies on: injectivity (distinct cells → distinct indices)
  * and unit-step adjacency (consecutive indices are grid neighbors — the
  * locality property that makes Hilbert bucket boxes tighter than Morton's).
  */
class HilbertSpec extends SparkSpec {

  /** Textbook xy2d (Hilbert curve, n = 1024): rotate-and-accumulate with
    * the full-grid complement flip — written loop-first, sharing nothing
    * with the column-expression unroll under test.
    */
  private def xy2d(x0: Int, y0: Int): Long = {
    var x = x0; var y = y0; var d = 0L; var s = 512
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 1023 - x; y = 1023 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  /** Inverse (d2xy) — used only to walk consecutive curve positions for
    * the adjacency property.
    */
  private def d2xy(d0: Long): (Int, Int) = {
    var x = 0; var y = 0; var t = d0; var s = 1
    while (s < 1024) {
      val rx = (1L & (t / 2)).toInt
      val ry = (1L & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx; y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  private val gridPoints: Seq[(Int, Int)] = {
    val strided = for (i <- 0 until 64; j <- 0 until 64) yield (i * 16 + 7, j * 16 + 3)
    // deterministic LCG scatter — no RNG seeds to disagree about
    var st = 12345L
    val scattered = (0 until 1000).map { _ =>
      st = (st * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue
      (((st >> 16) % 1024).toInt, ((st >> 32) % 1024).toInt)
    }
    (strided ++ scattered).distinct
  }

  test("column unroll == in-JVM xy2d reference on 5k grid points") {
    import spark.implicits._
    val df = gridPoints.toDF("gx", "gy")
    val got = AdvancedQueries.withHilbertIndex(df, "gx", "gy")
      .select(col("gx"), col("gy"), col("hd"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      .toMap
    assert(got.size == gridPoints.size)
    gridPoints.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("injectivity: distinct cells map to distinct curve indices") {
    import spark.implicits._
    val df = gridPoints.toDF("gx", "gy")
    val n = AdvancedQueries.withHilbertIndex(df, "gx", "gy")
      .select(col("hd")).distinct().count()
    assert(n == gridPoints.size, "curve index collision")
  }

  test("adjacency: consecutive curve indices are grid neighbors (reference walk)") {
    // full-curve property of the shared recurrence: if the reference walk
    // holds AND the column unroll equals the reference (test above), the
    // unroll inherits it. Walk 4096 consecutive positions from 3 offsets.
    for (base <- Seq(0L, 524288L, 1048576L - 4097)) {
      var (px, py) = d2xy(base)
      assert(xy2d(px, py) == base) // d2xy really is the inverse
      for (d <- base + 1 to base + 4096) {
        val (x, y) = d2xy(d)
        assert(math.abs(x - px) + math.abs(y - py) == 1,
          s"jump at d=$d: ($px,$py) -> ($x,$y)")
        px = x; py = y
      }
    }
  }

  test("SQL-registered hilbert_index/morton_index match the Column path") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    gridPoints.take(200).toDF("gx", "gy").createOrReplaceTempView("curve_pts")
    val viaSql = spark.sql(
      """SELECT gx, gy,
        |  hilbert_index(CAST(gx AS BIGINT), CAST(gy AS BIGINT)) AS hd,
        |  morton_index(CAST(gx AS BIGINT), CAST(gy AS BIGINT)) AS z
        |FROM curve_pts""".stripMargin).collect()
    viaSql.foreach { r =>
      val (x, y) = (r.getInt(0), r.getInt(1))
      assert(r.getLong(2) == xy2d(x, y), s"hilbert_index SQL mismatch at ($x,$y)")
      val zRef = (0 until 10).map(i =>
        (((x >> i) & 1).toLong << (2 * i)) + (((y >> i) & 1).toLong << (2 * i + 1))).sum
      assert(r.getLong(3) == zRef, s"morton_index SQL mismatch at ($x,$y)")
    }
  }

  test("curve kernels propagate NULL inputs as NULL") {
    graft.functions.GraftFunctions.register(spark)
    val rows = spark.sql(
      """SELECT hilbert_index(CAST(NULL AS BIGINT), CAST(1 AS BIGINT)),
        |       morton_index(CAST(1 AS BIGINT), CAST(NULL AS BIGINT))""".stripMargin)
      .collect()(0)
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }
}
