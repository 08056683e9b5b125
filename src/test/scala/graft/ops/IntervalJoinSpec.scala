package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed interval-containment join ≡ the naive cross-join filter, for
  * every bucket width — including widths far from the interval scale, and
  * bucket-boundary-aligned endpoints.
  */
class IntervalJoinSpec extends SparkSpec {

  test("containment equals the naive cross-join filter across widths") {
    import spark.implicits._
    // deterministic pseudo-random data: include boundary-aligned values,
    // empty (point) intervals, and intervals spanning many buckets
    val rnd = new scala.util.Random(42)
    val probes = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong)).toDF("p_id", "ts")
    val ivs = (1 to 80).map { i =>
      val s = rnd.nextInt(1000).toLong
      val len = rnd.nextInt(4) match {
        case 0 => 0L                       // point interval
        case 1 => rnd.nextInt(10).toLong   // short
        case _ => rnd.nextInt(300).toLong  // many-bucket
      }
      (i.toLong, s, s + len)
    }.toDF("iv_id", "s", "e")
    val expected = probes.crossJoin(ivs)
      .filter(col("ts") >= col("s") && col("ts") <= col("e"))
      .select(col("p_id"), col("iv_id")).as[(Long, Long)].collect().toSet
    for (width <- Seq(1L, 7L, 100L, 1000L, 10000L)) {
      val got = IntervalJoin.containment(probes, "ts", ivs, "s", "e", width)
        .select(col("p_id"), col("iv_id")).as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"width=$width produced duplicate pairs")
      assert(got.toSet == expected, s"width=$width diverged from naive join")
    }
  }

  test("bucket boundaries: ts exactly at start, end, and bucket edges") {
    import spark.implicits._
    val probes = Seq((1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L)).toDF("p_id", "ts")
    val ivs = Seq((10L, 100L, 199L)).toDF("iv_id", "s", "e")
    val got = IntervalJoin.containment(probes, "ts", ivs, "s", "e", 100L)
      .select(col("p_id")).as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // inclusive start/end; 200 and 99 excluded
  }

  test("rejects nonpositive width") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("a", "ts")
    intercept[IllegalArgumentException] {
      IntervalJoin.containment(df, "ts", Seq((1L, 1L, 2L)).toDF("i", "s", "e"), "s", "e", 0L)
    }
  }
}
